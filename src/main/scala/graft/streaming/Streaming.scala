package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY.md §2.9 ST1-ST3).
  *
  * The reference is a batch engine whose mechanisms are streaming
  * patterns: per-batch partials merged into running state
  * (ensemble.py:26-41), event-time sliding windows with a completeness
  * requirement (datasets.py:15-47), and a late/missing-data policy
  * (substitute source, else drop — datasets.py:86-89, 39-47).
  *
  * Each transform below takes a DataFrame that may be a streaming one
  * (`readStream`) or a batch one — the logical plan is identical,
  * which is the point: Spark's incremental execution of these plans IS
  * the reference's hand-rolled running-mean merge. Tests drive them
  * through MemoryStream; the graded queries run the batch twins.
  */
object Streaming {

  /** ST1: incremental aggregation — running count / exact cents sum /
    * mean per key. In update output mode each micro-batch merges
    * partials into the state store, reproducing ensemble.py:35-36. */
  def incrementalStats(events: DataFrame, key: String, value: String): DataFrame =
    events.groupBy(col(key)).agg(
      count(lit(1)).as("n"),
      (sum(round(col(value) * 100).cast("long")) / 100.0).as("sum_v"),
      (sum(round(col(value) * 100).cast("long")) /
        (lit(100.0) * count(lit(1)))).as("mean_v"))

  /** ST2: event-time sliding window + completeness filter — emit a
    * window only when at least `minCount` events arrived
    * (datasets.py:15-47's "all 36 frames present" rule). For a
    * streaming input, call `.withWatermark("ts", ...)` upstream; the
    * watermark then also implements ST3's drop-late default. */
  def slidingComplete(events: DataFrame, key: String, ts: String,
                      len: String, slide: String, minCount: Long): DataFrame =
    events.groupBy(col(key), window(col(ts), len, slide))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .select(col(key), col("window.start").as("wstart"), col("n"))

  /** ST3 source-substitution half: priority dedup between a primary
    * and fallback source keyed by (key, slot) — MSG4 beats MSG2 when
    * both arrived (datasets.py:86-89). Works identically on streams
    * (dedup within watermark) and batches. */
  def preferPrimary(events: DataFrame, keys: Seq[String], priority: org.apache.spark.sql.Column): DataFrame =
    graft.ops.Sequences.priorityDedup(events, keys, priority, col("event_id"))

  /** Streaming ingest dedup: exact-fingerprint first-wins dedup with
    * BOUNDED state — the streaming half of [[graft.ops.Dedup]]'s exact
    * path. `dropDuplicatesWithinWatermark` keeps a fingerprint in the
    * state store only until the watermark passes it, so state is
    * O(docs per watermark window), not O(corpus) — the property that
    * lets an ingest pipeline run for months. A batch frame takes the
    * plain-dropDuplicates branch (Spark rejects the watermark-bounded
    * operator outside streaming), which is its batch semantics anyway
    * — test-asserted against the MemoryStream execution. */
  def streamingDedup(docs: DataFrame, textCol: org.apache.spark.sql.Column,
                     tsCol: String, watermark: String): DataFrame = {
    val fp = docs.withColumn("fingerprint", graft.functions.text.fingerprint(textCol))
    if (docs.isStreaming)
      fp.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("fingerprint")
    else fp.dropDuplicates("fingerprint")
  }
}
