package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Ensemble

/** Gram/ridge path against closed-form ground truth (FIXTURES.md §B
  * preds_flat: known solution), plus the sum-to-1 KKT variant. */
class EnsembleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // y = 0.3*p1 + 0.7*p2 exactly -> ridge(lam->0) recovers the weights
  private lazy val fixture = {
    val rnd = new scala.util.Random(7)
    Seq.fill(2000)((rnd.nextDouble(), rnd.nextDouble()))
      .map { case (a, b) => (a, b, 0.3 * a + 0.7 * b) }
      .toDF("p1", "p2", "y")
  }

  test("gramAgg computes exact quantized moments") {
    val row = Ensemble.gramAgg(fixture, Seq($"p1", $"p2"), $"y").collect()(0)
    assert(row.getAs[Long]("n") == 2000L)
    val g00 = row.getAs[Double]("g_0_0")
    // E[p1^2] for U(0,1) ~ 1/3
    assert(math.abs(g00 - 1.0 / 3) < 0.02)
    // symmetry entry present and sane
    assert(row.getAs[Double]("g_0_1") > 0 && row.getAs[Double]("b_1") > 0)
  }

  test("fitWeights recovers the generating blend at tiny lambda") {
    val w = Ensemble.fitWeights(fixture, Seq($"p1", $"p2"), $"y", lam = 1e-9)
    assert(math.abs(w(0) - 0.3) < 1e-3, w.mkString(","))
    assert(math.abs(w(1) - 0.7) < 1e-3, w.mkString(","))
  }

  test("ridgeSolve matches a hand-solved 2x2 system") {
    // A = [[2,0],[0,4]], b = [2,8], lam*meanDiag = 0.1*3 = 0.3
    // -> w = [2/2.3, 8/4.3]
    val w = Ensemble.ridgeSolve(Array(Array(2.0, 0.0), Array(0.0, 4.0)), Array(2.0, 8.0))
    assert(math.abs(w(0) - 2 / 2.3) < 1e-12 && math.abs(w(1) - 8 / 4.3) < 1e-12)
  }

  test("ridgeSolveSum1 weights sum to exactly 1") {
    val w = Ensemble.ridgeSolveSum1(
      Array(Array(0.5, 0.2), Array(0.2, 0.8)), Array(0.4, 0.6))
    assert(math.abs(w.sum - 1.0) < 1e-12)
  }

  test("p=2 sum-to-1 closed form == KKT Gaussian elimination") {
    // the a4_ridge_sum1 query's in-plan algebra:
    // w1 = (M22 - M12 + b1 - b2) / (M11 - 2 M12 + M22)
    val (g11, g12, g22) = (0.3, 0.1, 0.5)
    val (b1, b2) = (0.2, 0.4)
    val kkt = Ensemble.ridgeSolveSum1(
      Array(Array(g11, g12), Array(g12, g22)), Array(b1, b2), 0.1)
    val lam = 0.1 * ((g11 + g22) / 2)
    val (m11, m22) = (g11 + lam, g22 + lam)
    val w1 = (m22 - g12 + (b1 - b2)) / (m11 - 2 * g12 + m22)
    assert(math.abs(kkt(0) - w1) < 1e-12, s"kkt=${kkt.toSeq} analytic=$w1")
    assert(math.abs(kkt(1) - (1.0 - w1)) < 1e-12)
  }

  test("solver handles p=5 with pivoting") {
    val rnd = new scala.util.Random(3)
    val p = 5
    // SPD matrix M = R Rᵀ + I
    val r = Array.fill(p, p)(rnd.nextDouble())
    val m = Array.tabulate(p, p)((i, j) =>
      (0 until p).map(k => r(i)(k) * r(j)(k)).sum + (if (i == j) 1.0 else 0.0))
    val wTrue = Array.tabulate(p)(i => i + 1.0)
    val b = Array.tabulate(p)(i => (0 until p).map(j => m(i)(j) * wTrue(j)).sum)
    val w = Ensemble.ridgeSolve(m, b, lam = 0.0)
    w.zip(wTrue).foreach { case (a, e) => assert(math.abs(a - e) < 1e-9) }
  }
}
