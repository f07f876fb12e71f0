package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-N rows per group, at scale.
  *
  * The textbook `row_number().over(partitionBy(group).orderBy(v desc))
  * .where(rn <= n)` sorts EVERY row of a group on one task — with few
  * or skewed groups that is a handful of tasks sorting the whole
  * table. This operator gets the identical rows in three scale-safe
  * phases:
  *   1. parallel partial+final `groupBy(group, value).count` — the
  *      only pass over the full data, map-side combined;
  *   2. per-group n-th-value threshold from that tiny (group, value)
  *      table (cheap window over ~|distinct values| rows);
  *   3. broadcast the thresholds, pre-filter the fact rows (survivors
  *      per group ~= n + ties), and run the final ordering window
  *      over the survivors only.
  * Ties on `value` at the threshold are kept by phase 3's filter and
  * resolved by the same deterministic tie-break columns the one-pass
  * form would use, so the output is row-identical to it. */
object TopN {

  /** @param tieBreaks columns that make the within-value order total
    *                  (ascending); output keeps df's columns plus a
    *                  `rn` rank column (1..n per group). */
  def topNPerGroup(df: DataFrame, group: String, value: String, n: Int,
                   tieBreaks: Seq[String]): DataFrame = {
    require(n >= 1, "top-N needs n >= 1")
    require(!df.columns.exists(Set("_cnt", "_cum", "_vmin", "rn")),
      "_cnt/_cum/_vmin/rn are reserved working/output columns")
    val byValue = df.groupBy(col(group), col(value)).agg(count(lit(1)).as("_cnt"))
    val wDesc = Window.partitionBy(col(group)).orderBy(col(value).desc)
    // a value block contributes to the top n iff fewer than n rows
    // strictly precede it; the per-group MIN such value is the cut
    val thresholds = byValue
      .withColumn("_cum", sum(col("_cnt")).over(
        wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("_cum") - col("_cnt") < n)
      .groupBy(col(group)).agg(min(col(value)).as("_vmin"))
    val ordered = Window.partitionBy(col(group))
      .orderBy(col(value).desc +: tieBreaks.map(col(_).asc): _*)
    df.join(broadcast(thresholds), Seq(group))
      .where(col(value) >= col("_vmin"))
      .drop("_vmin")
      .withColumn("rn", row_number().over(ordered).cast("long"))
      .where(col("rn") <= n)
  }
}
