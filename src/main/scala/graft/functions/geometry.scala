package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid / raster geometry as coordinate projections (SURVEY.md §2.7
  * N11/N15/N16, §2.6 A8).
  *
  * The reference mutates dense arrays (`np.rot90`, `batch[:, :, ::-1]`,
  * reflection pad — weather4cast/datasets.py:289-297, layers.py:5-20,
  * blocks.py:44-46). On a long-form `(i, j, value)` table every one of
  * these is a pure projection of the coordinate columns: no data
  * movement, no shuffle, fully codegen'd.
  */
object geometry {

  /** N11: `np.rot90(k)` over an n×n grid as an (i,j) remap
    * (datasets.py:294). rot90 maps (i,j) -> (n-1-j, i); applying it k
    * times composes the map. Returns (newI, newJ). */
  def rot90(i: Column, j: Column, n: Int, k: Int): (Column, Column) = {
    require(k >= 0 && k < 4, "k in [0,4)")
    (0 until k).foldLeft((i, j)) { case ((ci, cj), _) => (lit(n - 1) - cj, ci) }
  }

  /** N11: up-down flip `batch[..., ::-1, :, :]` (datasets.py:295). */
  def flipUd(i: Column, n: Int): Column = lit(n - 1) - i

  /** N11: left-right flip (datasets.py:297). */
  def flipLr(j: Column, n: Int): Column = lit(n - 1) - j

  /** N15: reflection-padding source index (layers.py:5-20): output index
    * o in [0, n + 2*pad) reads input index reflect(o - pad) where
    * reflect(x) = |x| for x<0 and 2(n-1)-x for x>=n (edge-reflect,
    * matching tf.pad REFLECT). */
  def reflectIndex(o: Column, n: Int, pad: Int): Column = {
    val x = o - lit(pad)
    when(x < 0, -x).when(x >= n, lit(2 * (n - 1)) - x).otherwise(x)
  }

  /** N16: `tf.meshgrid(range(h), range(w))` (layers.py:29-35) as a
    * generated relation of (i, j) coordinates. */
  def meshgrid(spark: SparkSession, h: Int, w: Int): DataFrame = {
    spark.range(0, h.toLong).toDF("i")
      .select(col("i"), explode(sequence(lit(0L), lit(w.toLong - 1))).as("j"))
  }

  /** A8: s×s average-pooling block key (blocks.py:44-46): group rows by
    * `(i div s, j div s)` and `avg(value)`. */
  def poolKey(c: Column, s: Int): Column = floor(c / lit(s)).cast("long")
}
