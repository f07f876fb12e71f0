package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library (SURVEY.md §2.7 N1-N10).
  *
  * Pure `Column` compositions — every function stays inside Catalyst
  * whole-stage codegen (no UDFs). Semantics derived from the reference:
  *  - min-max decode/encode:   weather4cast/datasets.py:59-73, 379-394
  *  - logit/normlogit family:  weather4cast/ensemble.py:7-15, 60-78
  *  - log-clip:                weather4cast/models.py:102-106
  *  - sigmoid:                 weather4cast/models.py:22-23
  *  - weighted blend:          weather4cast/ensemble.py:81-101
  *  - time keys:               weather4cast/datasets.py:26-28, 258-259
  */
object scalars {

  /** N1: min-max decode `(x - lo) / (hi - lo)` (datasets.py:62-64). */
  def minmaxDecode(x: Column, lo: Double, hi: Double): Column =
    (x - lit(lo)) * lit(1.0 / (hi - lo))

  /** N2: inverse scale + quantize `round(x*(hi-lo)+lo) -> int`
    * (datasets.py:387-394). Cast to long for oracle type parity.
    * floor(v + 0.5) rather than round(): Spark's double round() is
    * BigDecimal-backed (per-row allocation); floor is one IEEE op with
    * identical Spark/DuckDB semantics (see graft.queries.qlong). */
  def minmaxEncode(x: Column, lo: Double, hi: Double): Column =
    floor(x * lit(hi - lo) + lit(lo) + lit(0.5)).cast("long")

  /** N3/P3: fill-value -> NULL. The reference masks `data == fillvalue`
    * (datasets.py:61); NULL is the relational form of that mask. */
  def fillToNull(x: Column, fill: Column): Column =
    when(x === fill, lit(null)).otherwise(x)

  /** P4: clamp-below `max(x, lo)` (datasets.py:148 `elev[elev<0]=0`). */
  def clampMin(x: Column, lo: Double = 0.0): Column = greatest(x, lit(lo))

  /** Clip to [lo, hi] (numpy `clip`, ensemble.py:12). */
  def clip(x: Column, lo: Double, hi: Double): Column =
    least(greatest(x, lit(lo)), lit(hi))

  /** N4: log-clip `log(max(x, eps))` applied to rain intensity
    * (models.py:102-106, eps = 2e-4). */
  def logClip(x: Column, eps: Double = 2e-4): Column = log(greatest(x, lit(eps)))

  /** N5: `logit(x) = log(x / (1-x))` (ensemble.py:7-8). */
  def logit(x: Column): Column = log(x / (lit(1.0) - x))

  private val M = 0.997
  private val m = 0.003
  /** `lM = -logit(m) = log((1-m)/m)` (ensemble.py:13). */
  val lM: Double = math.log((1.0 - m) / m)

  /** N5: `normlogit(y) = (logit(clip(y, m, M)) + lM) / (2 lM)`
    * (ensemble.py:11-15). */
  def normlogit(y: Column): Column =
    (logit(clip(y, m, M)) + lit(lM)) / lit(2.0 * lM)

  /** N6: `sigmoid(x) = 1/(1+exp(-x))` = inverse logit (ensemble.py:70-72,
    * models.py:22-23). */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** N5: inverse normlogit `sigmoid(2 lM y - lM)` (ensemble.py:75-78). */
  def invNormlogit(y: Column): Column = sigmoid(lit(2.0 * lM) * y - lit(lM))

  /** N7: weighted linear blend `sum_i w_i * y_i` (ensemble.py:86-97). */
  def blend(terms: Seq[(Column, Double)]): Column =
    terms.map { case (c, w) => c * lit(w) }.reduce(_ + _)

  /** N7 logit-space blend: `invNormlogit(sum w_i normlogit(y_i))`
    * (ensemble.py:88-89, 95-96). */
  def blendLogitSpace(terms: Seq[(Column, Double)]): Column =
    invNormlogit(blend(terms.map { case (c, w) => (normlogit(c), w) }))

  /** N8: `%Y%j` day-of-year key (datasets.py:259). */
  def dayKey(ts: Column): Column = date_format(ts, "yyyyDDD")

  /** N8: `%Y%m%dT%H%M%SZ` file-timestamp key (datasets.py:26-28, 258). */
  def tsKey(ts: Column): Column = date_format(ts, "yyyyMMdd'T'HHmmss'Z'")

  /** N9: `t + k * 15 minutes` (datasets.py:41-43, 323). */
  def plusSteps(ts: Column, k: Column, stepMinutes: Int = 15): Column =
    timestamp_add("MINUTE", k * lit(stepMinutes), ts)

  /** N10: reference file-name construction (datasets.py:256-269):
    * `S_NWC_{PRODUCT}_MSG4_Europe-VISIR_{%Y%m%dT%H%M%SZ}.nc`
    * with the ASII -> ASII-TF rename. */
  def refFileName(product: Column, ts: Column): Column = {
    val renamed = when(product === "ASII", lit("ASII-TF")).otherwise(product)
    format_string("S_NWC_%s_MSG4_Europe-VISIR_%s.nc", renamed, tsKey(ts))
  }
}
