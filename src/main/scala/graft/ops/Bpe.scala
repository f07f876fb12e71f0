package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * merge) — computed as an explicit scan-stage fold over the symbol
  * array rather than through any string `replace` (engines disagree
  * about rescanning after a replacement; an explicit position spec
  * cannot). The DuckDB oracle expresses the SAME spec as run parity
  * (merge the even offsets within each consecutive-match run — a
  * provably identical characterization of the greedy fold, since a
  * merge consumes exactly the next match position in its run).
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
    * the dictionary with that pair merged greedily in every word.
    *
    * Plan shape: pair counts are one explode + map-side-combined agg,
    * the winner folds to one broadcast row, and the merge applies as
    * a scan-stage left-to-right fold over each word's symbol array —
    * no windows, no position joins (an earlier windowed run-parity
    * form of the same spec cost ~6 exchanges per iteration; the fold
    * costs the two the counting needs). If the dictionary has no
    * adjacent pair left (every word one symbol), the iteration is a
    * no-op: best is empty and the dict passes through unchanged. */
  def mergeStep(dict: DataFrame): (DataFrame, DataFrame) = {
    val witharr = dict.withColumn("a", split(col("seq"), " "))
    val pairs = witharr.where(size(col("a")) >= 2)
      .select(col("c"),
        explode(transform(sequence(lit(0), size(col("a")) - lit(2)),
          i => concat_ws(" ",
            element_at(col("a"), i + 1), element_at(col("a"), i + 2)))).as("pair"))
    val best = pairs.groupBy(col("pair")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc).limit(1)
    // greedy left-to-right non-overlap as a fold: emit the merged
    // symbol and consume the next position on a match, carry a
    // consumed flag otherwise ("a a a a" under "a a" -> "aa aa")
    val merged = witharr
      .join(broadcast(best.select(col("pair").as("_bp"))), lit(true), "left")
      .select(col("w"), col("c"),
        aggregate(
          sequence(lit(0), size(col("a")) - lit(1)),
          struct(array().cast("array<string>").as("res"), lit(false).as("skip")),
          (acc, i) => {
            val s = element_at(col("a"), i + 1)
            val nx = element_at(col("a"), i + 2)
            val isPair = nx.isNotNull &&
              concat_ws(" ", s, nx) === col("_bp")
            when(acc.getField("skip"),
              struct(acc.getField("res").as("res"), lit(false).as("skip")))
              .when(isPair,
                struct(concat(acc.getField("res"), array(concat(s, nx))).as("res"),
                  lit(true).as("skip")))
              .otherwise(
                struct(concat(acc.getField("res"), array(s)).as("res"),
                  lit(false).as("skip")))
          },
          acc => concat_ws(" ", acc.getField("res"))).as("seq"))
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

  /** The fully-trained dictionary after `iters` merges, with every
    * generation persisted (same rationale as [[trainFull]]: the
    * mergeStep plan references its input ~4 times, so an unpersisted
    * chain re-derives ~4^iters subtrees — measured as 3.6 s of pure
    * plan overhead on a 31-word dict at sf0.1 vs 0.9 s cached).
    * Caches are caller-owned ([[Dedup.CachedFrame]] convention). */
  def trainedDictFull(docs: DataFrame, textCol: Column, iters: Int): Dedup.CachedFrame = {
    require(iters >= 0, s"iters >= 0, got $iters")
    var dict = wordDict(docs, textCol).persist()
    val caches = Seq.newBuilder[DataFrame]
    caches += dict
    for (_ <- 1 to iters) {
      dict = mergeStep(dict)._2.persist()
      caches += dict
    }
    Dedup.CachedFrame(dict, caches.result())
  }

  /** Persist the trained dictionary exactly ONCE per corpus
    * fingerprint (the shared [[AnnIndex.oncePerFingerprint]] marker
    * lifecycle — the same serving contract as the ANN index and the
    * dedup store): the tokenizer's trained artifact. At 100 TB the
    * training chain runs once per corpus version; every later encode
    * job — batch or streaming — reads the vocabulary-sized parquet
    * and broadcast-joins it, paying zero training cost. A crashed
    * build self-heals (marker written only after the write), and a
    * stale marker of a prior corpus state cannot resurrect (absent
    * marker clears the dir first). */
  def buildDictIfAbsent(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                        textCol: Column, dir: String, iters: Int,
                        fingerprint: String): Unit =
    AnnIndex.oncePerFingerprint(spark, dir, s"bpedict_i$iters", fingerprint) {
      val t = trainedDictFull(docs, textCol, iters)
      t.result.write.mode("overwrite").parquet(s"$dir/dict")
      t.unpersistAll()
    }

  /** [[encode]] against the persisted dictionary — the serving path.
    * Missing/half-built stores fail loudly at plan time (the parquet
    * read refuses an absent path). */
  def encodeIndexed(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                    textCol: Column, idCol: Column, dir: String): DataFrame =
    encode(docs, textCol, idCol, spark.read.parquet(s"$dir/dict"))

  /** Streaming ENCODE against the persisted dictionary — tokenizing
    * a live ingest feed with the trained artifact. The document
    * stream explodes to words in the scan stage and stream-static-
    * broadcast-joins the vocabulary-sized dict (STATELESS — the
    * blessed stream-static shape, no join state at all); only the
    * per-doc re-aggregation is stateful, bounded to the running
    * (n_words, n_bpe_tokens) counters per open event-time window and
    * flushed by the watermark. Append-mode emissions are
    * row-identical to batch [[encode]] per doc (TextPipelineSpec). */
  def encodeStream(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                   textCol: Column, idCol: Column, tsCol: Column, dir: String,
                   delay: String = "10 seconds",
                   windowLen: String = "10 seconds"): DataFrame = {
    val seg = spark.read.parquet(s"$dir/dict").select(col("w"),
      size(split(col("seq"), " ")).cast("long").as("n_sub"))
    docs.select(idCol.as("doc_id"), tsCol.as("ts"),
        explode(split(textCol, " ")).as("w"))
      .join(broadcast(seg), Seq("w"), "left")
      .withColumn("n_sub", coalesce(col("n_sub"), length(col("w")).cast("long")))
      .withWatermark("ts", delay)
      .groupBy(col("doc_id"), window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
  }

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
