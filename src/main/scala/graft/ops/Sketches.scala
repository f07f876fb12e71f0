package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-backed approximate analytics: count-min-sketch heavy
  * hitters, next to the HLL++ distinct-count and Greenwald-Khanna
  * quantile queries of the approx family.
  *
  * Scale shape (the 100 TB path): the sketch is ONE map-side-combined
  * aggregate producing ~100 KB regardless of corpus size, and probes
  * ride a broadcast of that scalar — no shuffle grows with the data.
  * Verifying a sketch needs exact truth for the probed candidates
  * only: a `groupBy(item)` restricted to (or semi-joined with) the
  * candidate set, never a global exact count of everything.
  */
object Sketches {

  /** Estimated count of `item` in a serialized count-min sketch (the
    * binary from Spark's `count_min_sketch` aggregate). Native
    * expression [[graft.expressions.CmsEstimate]], registered by
    * GraftExtensions via Tables.conf. */
  def cmsEstimate(sketch: Column, item: Column): Column =
    call_function("graft_cms_estimate", sketch, item)

  /** Top-`k` heavy hitters of `item` with the CMS point-query
    * guarantee checked row-by-row: `within_bound` is
    * `exact <= estimate <= exact + ceil(eps * totalCount)` — the
    * two-sided CMS contract (never under-counts; over-counts by at
    * most eps·N with probability `confidence` per probe). With a fixed
    * `seed` the sketch, and therefore the output, is deterministic.
    *
    * The exact top-k here is one `groupBy(item)` shuffle (distinct
    * items, not rows) + a bounded TakeOrdered — the verification
    * truth, not the sketch's job. Ties at the k-boundary break on
    * `item` ascending so the selected set is deterministic. */
  def heavyHitters(df: DataFrame, item: String, k: Int, eps: Double = 0.001,
                   confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val sketch = df.agg(
      expr(s"count_min_sketch($item, ${eps}d, ${confidence}d, $seed)").as("_cms"),
      count(lit(1)).as("_n"))
    val top = df.groupBy(col(item))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(item).asc)
      .limit(k)
    val est = cmsEstimate(col("_cms"), col(item))
    top.crossJoin(broadcast(sketch))
      .select(col(item), col("exact_cnt"),
        est.between(col("exact_cnt"),
          col("exact_cnt") + ceil(col("_n") * lit(eps)).cast("long")).as("within_bound"))
  }

  /** Ingest ONE batch into a persisted HLL sketch store: the batch
    * collapses to per-`keys` sketches (one map-side-combined
    * aggregate — the batch's own volume, then ~KB per group) APPENDED
    * as new store rows. No read-modify-write: HLL union is
    * associative and commutative, so the estimate side merges all of
    * a group's rows with `hll_union_agg` at read time and a month of
    * appends needs no compaction for correctness (re-sketch into a
    * fresh dir when file counts matter — the
    * [[DedupIndex.compact]] discipline). */
  def ingestBatch(batch: DataFrame, dir: String, keys: Seq[String],
                  itemCol: Column, lgK: Int = 12): Unit = {
    requireNotCompacting(batch.sparkSession, dir)
    batch.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(itemCol, lit(lgK)).as("sk"))
      .write.mode("append")
      .parquet(CompactSwap.currentTablePath(batch.sparkSession, dir, "sketches"))
  }

  /** Writer-exclusion gate: refuse to append while [[compact]] holds
    * the store. This check is check-then-act (an append that passed
    * it can still be in flight when a compact starts), so it is only
    * the FAST-FAIL side; the correctness side lives in [[compact]]
    * itself, whose manifest-snapshot + post-promote reconcile
    * preserves any file a concurrent append lands, and whose retire
    * rename makes a mid-commit append fail loudly (batch un-marked →
    * clean replay). Failing here keeps the batch UN-marked too, so
    * the stream's restart replays it once the compaction is done.
    * A marker left by a crashed compact keeps ingest refused until
    * the next [[compact]] call self-heals the store (the conservative
    * side of the race). */
  private def requireNotCompacting(spark: org.apache.spark.sql.SparkSession,
                                   dir: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_compacting")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker))
      throw new IllegalStateException(
        s"sketch store $dir is compacting ($marker present); " +
          "retry the ingest after compaction completes")
  }

  /** STREAMING sketch-store maintenance — the [[DedupIndex
    * .ingestStream]] convention carried to the approx family: each
    * micro-batch [[ingestBatch]]es under a checkpoint-namespaced
    * per-batch marker, so a batch replayed after a crash between the
    * append and the checkpoint commit cannot double its sketches
    * into the store (idempotent by marker, exactly like the dedup
    * store's ingest). Emissions equal sequential [[ingestBatch]]
    * calls over the same batch sequence — spec-pinned. */
  def ingestStream(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                   dir: String, keys: Seq[String], itemCol: Column,
                   checkpoint: String, lgK: Int = 12)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatchOnce(spark, batch, dir, keys, itemCol, checkpoint, batchId, lgK)
        ()
      }
      .start()

  /** The marker-guarded micro-batch body of [[ingestStream]]: append
    * the batch's sketches unless this (checkpoint, batchId) already
    * did — a batch REPLAYED after a crash between the append and the
    * checkpoint commit is a no-op. Returns whether the append ran. */
  def ingestBatchOnce(spark: org.apache.spark.sql.SparkSession, batch: DataFrame,
                      dir: String, keys: Seq[String], itemCol: Column,
                      checkpoint: String, batchId: Long, lgK: Int = 12): Boolean = {
    val ckptTag = java.lang.Integer.toHexString(checkpoint.hashCode)
    val marker = new org.apache.hadoop.fs.Path(
      s"$dir/_ingested_${ckptTag}_batch_$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val run = !fs.exists(marker) && !batch.isEmpty
    if (run) {
      // torn-window note: a crash between this append and the marker
      // replays the append — harmless HERE because HLL rows are
      // union-idempotent (a doubled sketch row merges to the same
      // registers); additive stores route through
      // CompactSwap.appendExactlyOnce instead (LineStore.append tag)
      ingestBatch(batch, dir, keys, itemCol, lgK)
      fs.create(marker, true).close()
    }
    run
  }

  /** Store COMPACTION: every ingested batch appends a file set, and a
    * month of micro-batches turns the store scan into thousands of
    * small-file opens. Unlike the dedup store's row-preserving
    * rewrite, sketches MERGE: each group's appended rows union to ONE
    * row (`hll_union_agg` — kilobytes per group), so compaction also
    * bounds the store's ROW count at the group count. Same swap
    * discipline as [[DedupIndex.compact]]: rewrite into a fresh dir,
    * two renames, a crash inside the window self-heals on the next
    * call. Estimates before == after up to HLL's representation
    * caveat (union order — spec-pinned per group). Batch markers
    * survive compaction (they live beside `sketches/`), so replayed
    * batches stay no-ops. A `_compacting` exclusion marker is held
    * for the duration; [[ingestBatch]] refuses to append under it
    * (see [[requireNotCompacting]]).
    *
    * The exclusion gate is check-then-act, so an append that passed
    * the check BEFORE the marker went up can still land files while
    * the rewrite runs. Those rows are never lost: the rewrite goes
    * through [[CompactSwap.compactVersioned]] — snapshot, next-
    * version write, COPY-based late-append reconcile, sentinel
    * promotion, crash purge — so every concurrent-append ordering
    * ends with the rows present exactly once, and a reader resolving
    * mid-compact sees the old or the new version, never neither
    * (the zero-window property shared with the row stores). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              keys: Seq[String]): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_compacting")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // writer exclusion (fast-fail side): ingestBatch refuses to
    // append while this marker is up. A stale marker from a crashed
    // compact is ours to clear — this call rebuilds the store it
    // guarded. The correctness side (manifest snapshot + late-append
    // reconcile + crash recovery) lives in [[CompactSwap]].
    fs.create(marker, true).close()
    try CompactSwap.compactVersioned(spark, dir, "sketches",
      df => df.groupBy(keys.map(col): _*).agg(hll_union_agg(col("sk")).as("sk")),
      (df, tmp) => df.write.parquet(tmp))
    finally fs.delete(marker, false)
  }

  /** GROUP-level takedown — the one erasure the sketch store CAN do
    * exactly, and the graded half of its erasure story
    * (g_hll_rebuilt): the store is keyed by group and groups are
    * DISJOINT, so physically deleting a group's sketch rows leaves a
    * store bit-identical to one rebuilt over the post-erasure corpus
    * — no register ever mixed the erased group with a survivor.
    * Routed through the zero-window versioned compact (readers keep
    * their pinned listings; the previous version is GC'd one compact
    * later). Row-level (sub-group) erasure remains [[takedown]]'s
    * recorded impossibility: inside one group's sketch the erased
    * rows' hashes may BE the register maxima. */
  def takedownGroup(spark: org.apache.spark.sql.SparkSession, dir: String,
                    removed: Column): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_compacting")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(marker, true).close()
    // not(coalesce(removed, false)), NOT where(!removed): under SQL
    // three-valued logic a NULL-keyed group row (legal in groupBy —
    // rollup subtotals and NULL data keys both produce them) makes
    // the predicate NULL, and NOT(NULL) = NULL silently DROPS the
    // survivor row — a takedown of one group would erase every
    // NULL-keyed group too. NULL-on-the-predicate means "not the
    // removed group", so those rows are retained.
    try CompactSwap.compactVersioned(spark, dir, "sketches",
      df => df.where(not(coalesce(removed, lit(false)))),
      (df, tmp) => df.write.parquet(tmp))
    finally fs.delete(marker, false)
  }

  /** Distinct-count estimates over an ingested store, one row per
    * rollup level of `keys`: reads ONLY the group-sized sketch rows
    * (never the corpus), merging each group's appended sketches with
    * `hll_union_agg`. `grouping_id` rides along so callers joining
    * against exact rollups can tell NULL data keys from subtotal
    * rows (the g_hll_cube contract). */
  def estimateStore(spark: org.apache.spark.sql.SparkSession, dir: String,
                    keys: Seq[String]): DataFrame =
    spark.read.parquet(CompactSwap.currentTablePath(spark, dir, "sketches"))
      .rollup(keys.map(col): _*)
      .agg(grouping_id().as("gid"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))

  /** TAKEDOWN is UNSUPPORTED for the sketch store, loudly (the
    * H.264/MP3-PCM recorded-contract convention): HLL registers are
    * a max-merge — union-idempotent, deletion-free — so removing one
    * document's contribution from a merged sketch is
    * information-theoretically impossible (its hashes may be the
    * register maxima other docs share). The erasure path for
    * sketches is REBUILD over the post-erasure corpus: drop the
    * store dir and re-ingest, which [[ingestBatch]]'s idempotency
    * markers make safe to replay. The row-level stores
    * ([[DedupIndex.takedown]], [[AnnIndex.takedown]],
    * [[LineStore.takedown]]) carry real takedown verbs; estimates
    * merely BOUND post-erasure counts from above until the rebuild. */
  def takedown(dir: String): Nothing =
    throw new UnsupportedOperationException(
      s"sketch store $dir cannot take down rows: HLL union is irreversible " +
        "(register max-merge) — for a whole GROUP use takedownGroup (group-keyed " +
        "sketches are disjoint, so dropping a group's rows IS the rebuilt-without " +
        "store); for sub-group erasure rebuild over the post-erasure corpus " +
        "(delete the store dir, re-ingest; batch markers make the replay safe)")
}
