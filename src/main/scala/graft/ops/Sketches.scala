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
}
