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

  test("TopN local-prune == naive window on tie-heavy random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // few groups, heavily tied values, one group smaller than n
    val rows = (1L to 500L).map(id => (id, rnd.nextInt(4).toLong, rnd.nextInt(12).toDouble)) ++
      Seq((9001L, 99L, 5.0), (9002L, 99L, 5.0)) // group 99 has only 2 rows
    val df = rows.toDF("id", "g", "v")
    val got = graft.ops.TopN.topNPerGroup(df, "g", "v", n = 5, tieBreaks = Seq("id"))
      .select("g", "rn", "id", "v").collect().map(_.toSeq).toSet
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val naive = df.withColumn("rn", row_number().over(w).cast("long"))
      .where($"rn" <= 5).select("g", "rn", "id", "v").collect().map(_.toSeq).toSet
    assert(got == naive)
    // the bounded-aggregate form (graft_bottom_k) must emit the same rows
    val viaAgg = graft.ops.TopN.topNPerGroupAgg(df, "g", "v", n = 5, tieBreaks = Seq("id"))
      .select("g", "rn", "id", "v").collect().map(_.toSeq).toSet
    assert(viaAgg == naive)
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
