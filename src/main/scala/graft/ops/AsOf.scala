package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the values
  * of the LATEST right row with the same key and `time <= ` the left
  * row's time — the lookup a feature store / market-data / prev-day
  * fallback pipeline needs (the reference's previous-day date-key
  * fallback, datasets.py:86-89, is the 1-step special case; this is
  * the general operator).
  *
  * Spark-first shape: NOT a range theta-join (which Spark would plan
  * as a broadcast-nested-loop or a cross product) but the tagged
  * union-then-window pattern: stack both sides, sort each key's rows
  * once by (time, side), and carry the right values forward with
  * `last(..., ignoreNulls)` over an unbounded-preceding row frame.
  * ONE hash shuffle on the key + one per-key sort, no pair expansion
  * — survives any corpus size; skew is bounded by the hottest key
  * (same bound as the join itself).
  *
  * Semantics notes: ties (right.time == left.time) match, with the
  * right row sorted first; a right row whose value column is
  * genuinely NULL is skipped over by ignoreNulls (the previous
  * anchor wins) — pre-coalesce sentinel values if NULL must shadow. */
object AsOf {

  /** @param right     must share `key` and `time` with `left`; its
    *                  `valCols` must not collide with left columns.
    *                  If several right rows share (key, time), the
    *                  one sorted last by `tieBreak` wins.
    * @return left rows (all columns) plus `valCols`, NULL where no
    *         right row precedes the left row. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               valCols: Seq[String], tieBreak: String): DataFrame = {
    require(valCols.forall(v => !left.columns.contains(v)),
      s"right value columns ${valCols.mkString(",")} must not collide with left")
    require(!(left.columns ++ right.columns).exists(Set("_side", "_tb")),
      "_side/_tb are reserved working columns")
    val l = left.withColumn("_side", lit(1)).withColumn("_tb", lit(null).cast("long"))
    val r = right.withColumn("_side", lit(0)).withColumn("_tb", col(tieBreak).cast("long"))
      .select((key +: time +: valCols :+ "_side" :+ "_tb").map(col): _*)
    // allowMissingColumns fills each side's absent columns with NULL
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valCols.foldLeft(u) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_side", "_tb")
  }
}
