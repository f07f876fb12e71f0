package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ensemble fit: incremental Gram-matrix aggregation + closed-form
  * ridge solve + weighted blend (SURVEY.md A3/A4/N7; reference
  * weather4cast/ensemble.py:18-57).
  *
  * The reference accumulates `Y_pred·Y_predᵀ/N` and `Y_pred·y/N` as a
  * running mean over batches (ensemble.py:26-41) — exactly Spark's
  * partial+final aggregation, so one global agg reproduces it with a
  * single shuffle-free pass (p² + p sum columns, p ≤ 5). The p×p solve
  * happens on the driver, the only place tiny dense algebra belongs.
  *
  * Sums are computed in quantized integer space (values scaled by 2^20
  * and rounded to BIGINT): bit-exact under any partial-agg
  * reassociation, and reproducible by an external SQL oracle.
  */
object Ensemble {

  /** Quantization scale: 2^20 per value, so a product is 2^40 — leaves
    * ~2^23 rows of headroom before BIGINT overflow at |value| <= 1. */
  val Scale: Long = 1L << 20
  private val Scale2: Double = (Scale.toDouble) * Scale.toDouble

  // floor(x*S + 0.5), not round(): Spark's double round() is
  // BigDecimal-backed — a Double.toString + allocation PER ROW, which
  // made this 6-sum agg 3.5x slower than the floor form at sf0.1 and
  // leaves GC debt for whatever runs next. floor is one IEEE op with
  // identical Spark/DuckDB semantics, so the oracle twin (see
  // AggQueries.qSql) matches bit-for-bit by construction.
  private def quant(c: Column): Column =
    floor(c * Scale.toDouble + lit(0.5)).cast("long")

  /** A3: one-pass Gram aggregation. Returns a 1-row DataFrame with
    * column `n` plus `g_i_j` (i <= j) and `b_i` normalized moments
    * (`sum(p_i p_j)/n`, `sum(p_i y)/n`). Inputs are assumed |v| <~ 1
    * (normalize first, as the reference does). */
  def gramAgg(df: DataFrame, preds: Seq[Column], y: Column): DataFrame = {
    val p = preds.size
    // quantize ONCE in a projection below the aggregate: inlining
    // quant(pred_i) into every product would emit it p+1 times in the
    // generated code (p^2/2+p agg expressions), bloating the Janino
    // compile — the dominant cost of a one-pass agg on a single run
    val proj = df.select(
      preds.zipWithIndex.map { case (c, i) => quant(c).as(s"_q$i") } :+
        quant(y).as("_qy"): _*)
    def q(i: Int) = col(s"_q$i")
    val gCols = for (i <- 0 until p; j <- i until p) yield
      (sum(q(i) * q(j)) / (count(lit(1)) * lit(Scale2))).as(s"g_${i}_$j")
    val bCols = (0 until p).map(i =>
      (sum(q(i) * col("_qy")) / (count(lit(1)) * lit(Scale2))).as(s"b_$i"))
    proj.agg(count(lit(1)).as("n"), gCols ++ bCols: _*)
  }

  /** A4: ridge solve `w = (ATA + lam*mean(diag)*I) \ ATy`
    * (ensemble.py:44-46, lam default 0.1). Driver-side Gaussian
    * elimination with partial pivoting — p <= 5, no library needed. */
  def ridgeSolve(ata: Array[Array[Double]], aty: Array[Double], lam: Double = 0.1): Array[Double] = {
    val p = aty.length
    val meanDiag = (0 until p).map(i => ata(i)(i)).sum / p
    val m = Array.tabulate(p, p)((i, j) => ata(i)(j) + (if (i == j) lam * meanDiag else 0.0))
    val b = aty.clone()
    solveInPlace(m, b)
  }

  /** A4 sum-to-1 variant: augment with a Lagrange multiplier row/col
    * (KKT system, ensemble.py:49-57). */
  def ridgeSolveSum1(ata: Array[Array[Double]], aty: Array[Double], lam: Double = 0.1): Array[Double] = {
    val p = aty.length
    val meanDiag = (0 until p).map(i => ata(i)(i)).sum / p
    val m = Array.tabulate(p + 1, p + 1) { (i, j) =>
      if (i < p && j < p) ata(i)(j) + (if (i == j) lam * meanDiag else 0.0)
      else if (i == p && j == p) 0.0
      else 1.0
    }
    val b = aty :+ 1.0
    solveInPlace(m, b).take(p)
  }

  private def solveInPlace(m: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    for (k <- 0 until n) {
      var piv = k
      for (i <- k + 1 until n) if (math.abs(m(i)(k)) > math.abs(m(piv)(k))) piv = i
      if (piv != k) { val t = m(k); m(k) = m(piv); m(piv) = t
        val tb = b(k); b(k) = b(piv); b(piv) = tb }
      require(m(k)(k) != 0.0, "singular system")
      for (i <- k + 1 until n) {
        val f = m(i)(k) / m(k)(k)
        for (j <- k until n) m(i)(j) -= f * m(k)(j)
        b(i) -= f * b(k)
      }
    }
    val x = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until n) s -= m(i)(j) * x(j)
      x(i) = s / m(i)(i)
    }
    x
  }

  /** Full fit: gramAgg -> collect the single row -> ridge solve.
    * The ONLY collect is a 1-row, (p²+p+1)-column aggregate. */
  def fitWeights(df: DataFrame, preds: Seq[Column], y: Column, lam: Double = 0.1,
                 sumToOne: Boolean = false): Array[Double] = {
    val p = preds.size
    val row = gramAgg(df, preds, y).collect()(0)
    val ata = Array.tabulate(p, p) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      row.getAs[Double](s"g_${a}_$b")
    }
    val aty = Array.tabulate(p)(i => row.getAs[Double](s"b_$i"))
    if (sumToOne) ridgeSolveSum1(ata, aty, lam) else ridgeSolve(ata, aty, lam)
  }
}
