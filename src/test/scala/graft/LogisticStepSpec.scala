package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Focused pin for the r20 Logistic training-loop rewrite (weights
  * carried as a one-row COLUMN + per-head sigmoids projected below
  * the step aggregate, instead of per-step weight literals): the
  * distributed trajectory must equal a pure-Scala replay of the
  * snapped GD chain, value for value. The replay computes the same
  * op sequence — 1e-6-snapped dot, snapped sigmoid (same JVM
  * java.lang.Math.exp), per-row 1e-6-quantized LONG gradient terms,
  * exact integer sums, q6 weight update — so any drift introduced by
  * the column-weights form (vs the literal form the DuckDB oracle
  * replays) fails here before it reaches the oracle gate. */
class LogisticStepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def q6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
  private def sig(x: Seq[Double], w: Seq[Double]): Double = {
    val z = q6(x.zip(w).map { case (a, b) => a * b }.sum)
    q6(1.0 / (1.0 + math.exp(-z)))
  }

  private def feat(rows: Seq[(Long, Double, Seq[Double])]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("y", DoubleType, nullable = false),
      StructField("x", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
      schema)
  }

  // deterministic little corpus: bias + 2 features, labels follow x1
  private val rows: Seq[(Long, Double, Seq[Double])] = (0 until 40).map { i =>
    val x1 = (i % 7) / 7.0
    val x2 = (i % 5) / 5.0
    val y = if (x1 >= 0.5) 1.0 else 0.0
    (i.toLong, y, Seq(1.0, x1, x2))
  }

  test("binary trajectory == pure-Scala replay of the snapped GD") {
    val p = 3; val steps = 4; val lr = 2.0
    val got = graft.ops.Logistic.train(feat(rows), p, steps, lr).collect()
      .map(r => (r.getLong(0), (1 to p).map(r.getDouble), r.getDouble(p + 1)))
    // replay
    var w = Seq.fill(p)(0.0)
    val traj = Seq.newBuilder[(Long, Seq[Double], Double)]
    for (t <- 1 to steps) {
      val n = rows.size
      val g = (0 until p).map(j =>
        rows.map { case (_, y, x) =>
          math.floor((y - sig(x, w)) * x(j) * 1e6 + 0.5).toLong }.sum)
      val wNext = (0 until p).map(j => q6(w(j) + lr * g(j).toDouble / (1e6 * n)))
      val acc = q6(rows.count { case (_, y, x) =>
        (sig(x, wNext) >= 0.5) == (y == 1.0) }.toDouble / n)
      traj += ((t.toLong, wNext, acc))
      w = wNext
    }
    assert(got.toSeq == traj.result(),
      s"distributed trajectory diverged from the replay:\n${got.toSeq}\nvs\n${traj.result()}")
    assert(graft.ops.Logistic.trainWeights(feat(rows), p, steps, lr) == w,
      "trainWeights must emit the trajectory's final weights bit-for-bit")
  }

  test("OvR trajectory == pure-Scala replay (argmax acc, first head wins ties)") {
    val p = 3; val classes = 3; val steps = 3; val lr = 4.0
    val mrows = rows.map { case (i, _, x) => (i, (i % 3).toDouble, x) }
    val got = graft.ops.Logistic.trainOvr(feat(mrows), p, classes, steps, lr)
      .collect()
      .map(r => (r.getLong(0), (1 to classes * p).map(r.getDouble),
        r.getDouble(classes * p + 1)))
    var w = Seq.fill(classes)(Seq.fill(p)(0.0))
    val traj = Seq.newBuilder[(Long, Seq[Double], Double)]
    for (t <- 1 to steps) {
      val n = mrows.size
      val wNext = (0 until classes).map { c =>
        val g = (0 until p).map(j =>
          mrows.map { case (_, y, x) =>
            val yc = if (y == c.toDouble) 1.0 else 0.0
            math.floor((yc - sig(x, w(c))) * x(j) * 1e6 + 0.5).toLong }.sum)
        (0 until p).map(j => q6(w(c)(j) + lr * g(j).toDouble / (1e6 * n)))
      }
      val acc = q6(mrows.count { case (_, y, x) =>
        val scores = wNext.map(wc => sig(x, wc))
        scores.indexOf(scores.max) == y.toInt }.toDouble / n)
      traj += ((t.toLong, wNext.flatten, acc))
      w = wNext
    }
    assert(got.toSeq == traj.result(),
      s"OvR trajectory diverged from the replay:\n${got.toSeq}\nvs\n${traj.result()}")
    assert(graft.ops.Logistic.trainOvrWeights(feat(mrows), p, classes, steps, lr)
      == w.map(_.toSeq).toSeq,
      "trainOvrWeights must emit the trajectory's final heads bit-for-bit")
  }
}
