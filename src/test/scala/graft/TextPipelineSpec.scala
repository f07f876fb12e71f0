package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.text

/** PII redaction + benchmark decontamination behavior on crafted
  * inputs (the graded queries hash-compare the same transforms against
  * DuckDB on the synthetic corpus, which contains little real PII —
  * these cases pin what the operators actually do to hits). */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii: emails and phone runs become typed tokens, clean text untouched") {
    val rows = Seq(
      "mail me at jane.doe+spam@sub.example.co.uk today",
      "call +1 (415) 555-0199 now",
      "both a.b@x.org and 0171-555 0123 here",
      "no pii at all",
      "v2.0 released 2024",           // short digit runs survive
      "order 12345678901 shipped"     // long bare digit run IS a phone-shaped hit
    ).toDF("text")
    val got = rows.select(text.redactPii($"text").as("r")).collect().map(_.getString(0))
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "call <PHONE> now")
    assert(got(2) == "both <EMAIL> and <PHONE> here")
    assert(got(3) == "no pii at all")
    assert(got(4) == "v2.0 released 2024")
    assert(got(5) == "order <PHONE> shipped")
  }

  test("redactPii is idempotent: placeholders are not re-redacted") {
    val once = Seq("a@b.io and 123456789").toDF("text")
      .select(text.redactPii($"text").as("r"))
    val twice = once.select(text.redactPii($"r").as("r")).collect()(0).getString(0)
    assert(twice == "<EMAIL> and <PHONE>")
  }

  test("decontam shape: full copy of a benchmark doc scores 1.0, clean doc is absent") {
    import graft.ops.Dedup
    val bench = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (50L, bench),                                    // benchmark slice (id % 50 == 0)
      (1L, bench),                                     // verbatim contamination
      (2L, s"prefix words here $bench"),               // partial overlap
      (3L, "completely unrelated clean text with many distinct tokens")
    ).toDF("doc_id", "text")
    val corpusSh = Dedup.shingleRows(docs.where($"doc_id" % 50 =!= 0), $"text", $"doc_id", 5)
    val benchSh = Dedup.shingleRows(docs.where($"doc_id" % 50 === 0), $"text", $"doc_id", 5)
      .select($"s").distinct().withColumn("_hit", lit(1))
    val got = corpusSh.join(broadcast(benchSh), Seq("s"), "left")
      .groupBy($"doc_id")
      .agg(countDistinct($"s").as("n_sh"),
        countDistinct(when($"_hit" === 1, $"s")).as("n_hit"))
      .where($"n_hit" > 0)
      .select($"doc_id", ($"n_hit".cast("double") / $"n_sh".cast("double")).as("frac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0, s"verbatim copy must be fully contaminated: $got")
    assert(got(2L) > 0.5 && got(2L) < 1.0, s"partial overlap strictly between: $got")
    assert(!got.contains(3L), s"clean doc must not appear: $got")
  }
}
