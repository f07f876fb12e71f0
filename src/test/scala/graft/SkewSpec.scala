package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

/** Salted-join semantics: the rewritten join must be row-identical to
  * the plain equi-join it replaces — salting may only change the
  * shuffle distribution, never the result. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin == plain join on a 3-hot-key fixture, any fan-out") {
    val fact = spark.range(0, 10000)
      .select(col("id"), (col("id") % 3).cast("int").as("k"))
    val dim = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "id", "label").collect().map(_.toSeq).toSet
    for (s <- Seq(1, 8)) {
      val salted = Skew.saltedJoin(fact, dim, Seq("k"), col("id"), s)
        .select("k", "id", "label").collect().map(_.toSeq).toSet
      assert(salted == plain, s"fan-out $s changed the join result")
    }
  }

  test("rolling fingerprint is order-sensitive; md5 fingerprint is not") {
    import graft.functions.text
    val docs = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fps = docs.select(text.rollingFingerprint($"text").as("fp")).collect().map(_.getLong(0))
    assert(fps(0) != fps(1), "token order must change the rolling hash")
    assert(fps.forall(fp => fp >= 0L && fp < 2147483647L), "mod range")
    // same tokens, same order -> same hash
    val again = docs.where($"doc_id" === 1)
      .select(text.rollingFingerprint($"text")).collect()(0).getLong(0)
    assert(again == fps(0))
  }
}
