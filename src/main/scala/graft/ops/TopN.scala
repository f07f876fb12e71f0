package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-N rows per group, at scale.
  *
  * The textbook `row_number().over(partitionBy(group).orderBy(v desc))
  * .where(rn <= n)` clusters by group alone — with few or skewed
  * groups, a handful of tasks sort the whole table. This operator
  * gets identical rows in two phases:
  *   1. LOCAL PRUNE: rank rows within (group, input-partition-id) and
  *      keep each bucket's top n. A row outside its own partition's
  *      per-group top n cannot be in the global top n (superset
  *      guarantee), and the buckets spread over |groups| x |partitions|
  *      reducers, so every core sorts a slice instead of three cores
  *      sorting everything.
  *   2. FINALIZE: the global ordering window over the <= n x
  *      |partitions| survivors per group — trivially small.
  * Works for any value distribution (a value-distinct pre-aggregation
  * would degenerate when the value column is near-unique, as real
  * prices/scores are). Ties beyond the `tieBreaks` total order are
  * interchangeable rows, so the emitted multiset matches the one-pass
  * window form (asserted against it in tests and by the o4 oracle). */
object TopN {

  /** @param tieBreaks columns that make the within-value order total
    *                  (ascending); output keeps df's columns plus a
    *                  `rn` rank column (1..n per group). */
  def topNPerGroup(df: DataFrame, group: String, value: String, n: Int,
                   tieBreaks: Seq[String]): DataFrame = {
    require(n >= 1, "top-N needs n >= 1")
    require(!df.columns.exists(Set("_pid", "_lrn", "rn")),
      "_pid/_lrn/rn are reserved working/output columns")
    val ordCols = col(value).desc +: tieBreaks.map(col(_).asc)
    val local = Window.partitionBy(col(group), col("_pid")).orderBy(ordCols: _*)
    val global = Window.partitionBy(col(group)).orderBy(ordCols: _*)
    df.withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(local))
      .where(col("_lrn") <= n)
      .drop("_pid", "_lrn")
      .withColumn("rn", row_number().over(global).cast("long"))
      .where(col("rn") <= n)
  }
}
