package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * corpus-scale preprocessing step every LLM run pays before a single
  * batch is assembled.
  *
  * Shape (how production trainers structure it, and the only shape
  * that survives 100 TB): the corpus is touched ONCE, collapsing to a
  * word-frequency dictionary (one map-side-combined exchange; the
  * dict is vocabulary-sized — Heaps' law, millions of rows at web
  * scale, never corpus-sized). Every merge iteration then runs on the
  * DICTIONARY: adjacent-pair counts weighted by word frequency (one
  * vocab-sized agg), the best pair folds to one broadcast row, and
  * the merge applies as per-word array work. Per-word windows
  * partition by the word itself, so no iteration ever sorts or
  * shuffles anything proportional to the corpus.
  *
  * Merge application is GREEDY LEFT-TO-RIGHT non-overlapping (the
  * standard BPE rule): within a run of consecutive matches of the
  * best pair, positions at even offsets merge and the odd ones are
  * consumed ("a a a a" under pair "a a" becomes "aa aa", not one
  * merge). The run parity is computed explicitly (two windowed
  * row_numbers over match positions) rather than through any string
  * `replace` — engines disagree about rescanning after a replacement,
  * an explicit position spec cannot.
  */
object Bpe {

  /** ONE corpus pass: (w, c, seq) word-frequency dictionary, with
    * `seq` the space-separated character sequence of the word (the
    * iteration-0 symbol string). */
  def wordDict(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(textCol, " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("seq", trim(regexp_replace(col("w"), "(.)", "$1 ")))

  /** One BPE merge iteration over the dictionary: returns the winning
    * pair as a 1-row frame (pair, cnt) — count is frequency-weighted
    * over ALL adjacent positions, ties broken pair-ascending — and
    * the dictionary with that pair merged greedily in every word. */
  def mergeStep(dict: DataFrame): (DataFrame, DataFrame) = {
    val syms = dict.select(col("w"), col("c"),
      posexplode(split(col("seq"), " ")).as(Seq("i", "sym")))
    val wWin = Window.partitionBy("w").orderBy("i")
    val pr = syms.withColumn("nxt", lead(col("sym"), 1).over(wWin))
      .where(col("nxt").isNotNull)
      .withColumn("pair", concat_ws(" ", col("sym"), col("nxt")))
    val best = pr.groupBy(col("pair")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc).limit(1)
    // greedy left-to-right: among consecutive match runs, merge the
    // even offsets (rn 1, 3, ...) — rid groups a run, rn orders it
    val mt = pr.join(broadcast(best.select(col("pair"))), Seq("pair"))
      .select(col("w"), col("i"))
    val mp = mt
      .withColumn("rid", col("i") - row_number().over(wWin))
      .withColumn("rn", row_number().over(Window.partitionBy("w", "rid").orderBy("i")))
      .where(col("rn") % 2 === 1)
      .groupBy(col("w")).agg(collect_set(col("i")).as("mp"))
    val merged = dict.join(mp, Seq("w"), "left")
      .withColumn("a", split(col("seq"), " "))
      .select(col("w"), col("c"),
        concat_ws(" ", filter(
          transform(col("a"), (s, ix) =>
            when(array_contains(col("mp"), ix),
              concat(s, element_at(col("a"), ix + 2)))
              .when(array_contains(col("mp"), ix - 1), lit(null))
              .otherwise(s)),
          x => x.isNotNull)).as("seq"))
    (best, merged)
  }

  /** `iters` chained merge iterations from the raw corpus: one row
    * per iteration (it, pair, cnt) — the learned merge table.
    *
    * Every dictionary generation is persisted: the corpus pass runs
    * ONCE no matter how many iterations consume d0, and iteration
    * t's plan starts from the materialized d{t-1} instead of
    * replaying the whole chain (unpersisted, the recompute tree
    * grows ~4^iters — vocab-sized work, but a silly plan). Caches
    * are caller-owned via the [[Dedup.CachedFrame]] convention:
    * `unpersistAll()` after the action, or `spark.catalog
    * .clearCache()` (as Bench/Verify do between queries). */
  def trainFull(docs: DataFrame, textCol: Column, iters: Int): Dedup.CachedFrame = {
    require(iters >= 1, s"iters >= 1, got $iters")
    var dict = wordDict(docs, textCol).persist()
    val caches = Seq.newBuilder[DataFrame]
    caches += dict
    val bests = (1 to iters).map { t =>
      val (best, next) = mergeStep(dict)
      if (t < iters) { dict = next.persist(); caches += dict }
      best.select(lit(t.toLong).as("it"), col("pair"), col("cnt"))
    }
    Dedup.CachedFrame(bests.reduce(_.unionAll(_)), caches.result())
  }

  /** One-shot convenience over [[trainFull]] (cache cleanup falls to
    * `spark.catalog.clearCache()`). */
  def train(docs: DataFrame, textCol: Column, iters: Int): DataFrame =
    trainFull(docs, textCol, iters).result

  /** ENCODE with a trained dictionary: per-document word and BPE
    * token counts, by broadcast-joining each word to its final merged
    * segmentation. This is the serving half of tokenization at
    * 100 TB: the corpus streams through a scan-stage explode + ONE
    * broadcast hash join against the vocabulary-sized dict (never a
    * shuffle of the corpus text), and re-aggregates on the doc key
    * once. Words unseen at training time fall back to their raw
    * character segmentation — the same rule as training's iteration
    * 0, so the fallback is the trained dict's own floor. */
  def encode(docs: DataFrame, textCol: Column, idCol: Column,
             dict: DataFrame): DataFrame = {
    val seg = dict.select(col("w"),
      size(split(col("seq"), " ")).cast("long").as("n_sub"))
    docs.select(idCol.as("doc_id"), explode(split(textCol, " ")).as("w"))
      .join(broadcast(seg), Seq("w"), "left")
      .withColumn("n_sub", coalesce(col("n_sub"), length(col("w")).cast("long")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
  }
}
