package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.vectors

/** The native DotProduct expression must be indistinguishable from the
  * HOF formulation it replaces — values, null semantics, and it must
  * run inside whole-stage codegen. */
class DotExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native dot == HOF dot on real embeddings, bit-exact") {
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.where($"vec_id" === 0).select($"embedding".as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      vectors.dot($"embedding", $"qv").as("native"),
      vectors.dotHof($"embedding", $"qv").as("hof"))
    assert(both.where($"native" =!= $"hof" ||
      ($"native".isNull !== $"hof".isNull)).count() == 0)
    assert(both.count() == 500)
  }

  test("null semantics: length mismatch and null elements poison") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),   // 11.0
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),        // length mismatch -> null
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))   // null elem -> null
    ).toDF("a", "b")
    val out = df.select(vectors.dot($"a", $"b").as("d"),
      vectors.dotHof($"a", $"b").as("h")).collect()
    assert(out(0).getDouble(0) == 11.0 && out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("expression participates in whole-stage codegen") {
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(vectors.normSq($"embedding").as("n2"))
    val plan = df.queryExecution.executedPlan.toString
    // the project containing graft_dot carries the codegen marker *(k)
    assert(plan.contains("graft_dot"), plan.take(500))
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.trim.startsWith("*")),
      "graft_dot fell out of whole-stage codegen:\n" + plan.take(800))
  }

  test("cosine via the native path matches DuckDB-style formula") {
    val v = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
    val c = v.select(vectors.cosine($"a", $"b")).collect()(0).getDouble(0)
    assert(math.abs(c - 24.0 / 25.0) < 1e-12)
  }

  test("fused cosine == 3-pass composed cosine on real embeddings, bit-exact") {
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.where($"vec_id" === 0).select($"embedding".as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      vectors.cosine($"embedding", $"qv").as("fused"),
      vectors.cosineComposed($"embedding", $"qv").as("composed"))
    assert(both.where($"fused" =!= $"composed" ||
      ($"fused".isNull !== $"composed".isNull)).count() == 0)
  }

  test("graft_word_counts map == explode + groupBy(doc, term) count on real docs") {
    val real = sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = graft.functions.text.wordTokens($"text")
    val native = real.select($"doc_id",
        explode(call_function("graft_word_counts", toks)).as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2).toLong).toMap
    val composed = real.select($"doc_id", explode(toks).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(native == composed)
  }

  test("fused cosine null semantics: zero norm, length mismatch, null element") {
    val df = Seq(
      (Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](1.0, 2.0)),  // zero norm -> null
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),       // mismatch -> null
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null elem -> null
      (Seq[java.lang.Double](1.0, 0.0), Seq[java.lang.Double](1.0, 0.0))   // 1.0
    ).toDF("a", "b")
    val out = df.select(vectors.cosine($"a", $"b").as("c"),
      vectors.cosineComposed($"a", $"b").as("cc")).collect()
    for (i <- 0 to 2) assert(out(i).isNullAt(0) && out(i).isNullAt(1), s"row $i")
    assert(out(3).getDouble(0) == 1.0 && out(3).getDouble(1) == 1.0)
  }
}
