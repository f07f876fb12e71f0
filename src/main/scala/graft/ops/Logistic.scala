package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** In-plan logistic-regression training by full-batch gradient
  * descent — the model-based quality filter of the CCNet / GPT-3
  * lineage: distill a curation rule into a tiny linear model, then
  * score the whole corpus with it. The reference pipeline's quality
  * heuristics (weather4cast has no text path; this is extension
  * surface for the LLM-data family) provide both the features and —
  * thresholded — the training labels, so the classifier is graded as
  * a DISTILLATION: does GD move the linear weights toward the rule
  * that generated the labels?
  *
  * Scale shape: the feature frame is computed once (caller persists —
  * the [[Dedup.CachedFrame]] convention); every GD step is then
  * exactly TWO map-side-combined aggregates over it (gradient sums,
  * then post-step accuracy), each folding to one bounded row. The
  * p-double weight state lives on the DRIVER between steps — the
  * [[Ensemble]] ridge-solve convention (collect the bounded state,
  * update driver-side, re-literal it into the next plan). The
  * first cut kept the weights as chained one-row frames instead;
  * since each step references its predecessor ~3 times and persist()
  * does not truncate the analyzed plan, the trajectory's lineage
  * re-executed upstream aggregates combinatorially (246 aggregate
  * jobs for 6 steps — each a full corpus pass at scale). Collecting
  * p doubles per step cuts the lineage hard: 2·steps corpus passes,
  * period. Nothing corpus-sized ever shuffles either way — the
  * exchanges carry p-long partial rows.
  *
  * Determinism (the cross-engine contract): the dot product and the
  * sigmoid output are snapped to the 1e-6 grid (the transcendental
  * convention — Java and libm `exp` differ in the last ulp), per-doc
  * gradient contributions quantize to 1e-6 integers and sum as
  * BIGINT (exact, associative — immune to float summation order),
  * and each new weight re-snaps to 1e-6. The driver-side update
  * replays the identical IEEE expression the DuckDB oracle CTE
  * computes, so every step starts from grid-exact shared state and
  * error cannot accumulate.
  */
object Logistic {

  private def q6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6

  private def qround(c: Column, digits: Int): Column = {
    val k = math.pow(10, digits)
    floor(c * lit(k) + lit(0.5)).cast("double") / lit(k)
  }

  private def qlong(c: Column, k: Double): Column =
    floor(c * lit(k) + lit(0.5)).cast("long")

  /** Snapped sigmoid of a snapped logit under literal weights `w`
    * over features `x` (array<double>, element 1 = the 1.0 bias). */
  private def sigma(x: Column, w: Seq[Double]): Column =
    sigmaCols(w.indices.map(j => element_at(x, j + 1)), w)

  /** [[sigma]] over the feature COLUMNS directly — for callers whose
    * features are inline expressions rather than a stored array
    * column. Semantically identical (element_at(array(e1..ep), j+1)
    * is e_j), but it never constructs the array: wrapping inline
    * CaseWhen features in CreateArray and indexing them back put
    * ElementAt's null-branch across a codegen function-split
    * boundary (Janino: "isNull_N is not an rvalue"), knocking the
    * whole gate predicate into interpreted mode. Plain arithmetic
    * stays inside whole-stage codegen. */
  private def sigmaCols(xs: Seq[Column], w: Seq[Double]): Column = {
    val z = qround(xs.zip(w).map { case (xj, wj) => xj * lit(wj) }
      .reduce(_ + _), 6)
    qround(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** [[sigma]] with the weights read from a flat array COLUMN (class
    * c's head at positions c*p+1 .. c*p+p) instead of folded literals
    * — the exact sigmaCols op sequence (x_j * w_j summed left to
    * right, 1e-6 snap, sigmoid, snap) over the same doubles, so
    * outputs are bit-identical. */
  private def sigmaW(x: Column, wf: Column, c: Int, p: Int): Column = {
    val z = qround((0 until p).map(j =>
      element_at(x, j + 1) * element_at(wf, c * p + j + 1)).reduce(_ + _), 6)
    qround(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** The TRAINING-LOOP frame for one GD step: `feat` cross-joined
    * with a one-row local frame carrying the current weights (flat,
    * class-major) as an array column `_w`, plus each head's snapped
    * sigmoid projected ONCE as `_s<c>` BELOW the step aggregate.
    *
    * Why not literals (the old form): every step's weights differ, so
    * a step aggregate with folded weight literals is a NEW plan whose
    * generated code embeds the constants — Janino recompiled the big
    * 30-sum aggregate once per step per distinct weight vector
    * (measured: t_lang_classifier cold 8.6 s vs 2.5 s warm — ~6 s of
    * pure per-step codegen), and the analyzer walked classes*p copies
    * of the sigmoid tree per step. With the weights in a column the
    * generated code is byte-identical across steps (ONE compile for
    * the whole loop), and the aggregate's analyzed tree holds
    * `classes` sigmoid trees instead of classes*p. The projection is
    * not collapsed into the aggregate (each `_s<c>` alias is consumed
    * p+1 times and is non-cheap — CollapseProject keeps it), so the
    * per-row sigmoid also computes once per class instead of per
    * gradient term. Values bit-identical (sigmaW == sigmaCols shape;
    * oracle hash-checks every trajectory). */
  private def withSigmas(feat: DataFrame, w: Array[Array[Double]],
                         p: Int): DataFrame = {
    val spark = feat.sparkSession
    val schema = StructType(Seq(StructField("_w",
      org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false),
      nullable = false)))
    val wrow = spark.createDataFrame(
      java.util.Collections.singletonList(Row(w.flatten.toIndexedSeq)), schema)
    feat.crossJoin(broadcast(wrow))
      .select(col("y") +: col("x") +:
        w.indices.map(c => sigmaW(col("x"), col("_w"), c, p).as(s"_s$c")): _*)
  }

  /** Train by `steps` full-batch GD steps from w=0 at learning rate
    * `lr`, over `feat` = (doc_id, y double in {0,1}, x array<double>
    * of length `p`, element 1 the 1.0 bias). Returns the TRAJECTORY
    * as a local frame: one row per step with the post-step weights
    * (w0..w{p-1}) and that step's training accuracy `acc` (fraction
    * of docs the post-step model classifies correctly at the 0.5
    * threshold, 1e-6-snapped) — the graded evidence that the
    * distillation learns, not just terminates. */
  def train(feat: DataFrame, p: Int, steps: Int, lr: Double): DataFrame = {
    require(p >= 1 && p <= 16, s"1 <= p <= 16, got $p")
    require(steps >= 1, s"steps >= 1, got $steps")
    val spark = feat.sparkSession
    var w = Array.fill(p)(0.0)
    val traj = Seq.newBuilder[Row]
    // FUSED passes: step t's gradient (under w_{t-1}) and step t-1's
    // post-step accuracy (under w_{t-1}) are aggregates over the same
    // frame under the SAME weights, so they share one corpus pass —
    // steps+1 passes total instead of 2*steps, bit-identical numbers
    // (the oracle's CTE chain is unchanged; it never batched passes).
    w = gradStep(feat, w, p, lr)
    for (t <- 2 to steps) {
      val (wNext, accPrev) = gradAccStep(feat, w, p, lr)
      traj += Row.fromSeq((t - 1).toLong +: w.toSeq :+ accPrev)
      w = wNext
    }
    val accLast = withSigmas(feat, Array(w), p).agg(qround(avg(
        when((col("_s0") >= 0.5) === (col("y") === 1.0), 1.0)
          .otherwise(0.0)), 6).as("acc"))
      .collect().head.getDouble(0)
    traj += Row.fromSeq(steps.toLong +: w.toSeq :+ accLast)
    val schema = StructType(
      StructField("step", LongType, nullable = false) +:
        (0 until p).map(j => StructField(s"w$j", DoubleType, nullable = false)) :+
        StructField("acc", DoubleType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(traj.result(), 1), schema)
  }

  /** The fused pass: gradient sums AND the accuracy of the CURRENT
    * weights in one aggregate — returns (updated weights, accuracy of
    * `w` itself). */
  private def gradAccStep(feat: DataFrame, w: Array[Double], p: Int,
                          lr: Double): (Array[Double], Double) = {
    val s = col("_s0")
    val row = withSigmas(feat, Array(w), p).agg(
      sum(qlong((col("y") - s) * element_at(col("x"), 1), 1e6)).as("g0"),
      ((1 until p).map(j =>
        sum(qlong((col("y") - s) * element_at(col("x"), j + 1), 1e6)).as(s"g$j")) ++
        Seq(count(lit(1)).as("n"),
          qround(avg(when((s >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0)), 6)
            .as("acc"))): _*).collect().head
    val n = row.getLong(p)
    val acc = row.getDouble(p + 1)
    (Array.tabulate(p)(j =>
      q6(w(j) + lr * row.getLong(j).toDouble / (1e6 * n.toDouble))), acc)
  }

  /** One full-batch GD step from `w`: the map-side-combined gradient
    * aggregate (p quantized sums + n, ONE bounded row) and the
    * driver-side snapped weight update — shared by [[train]] (which
    * adds the per-step accuracy pass) and [[trainWeights]]. */
  private def gradStep(feat: DataFrame, w: Array[Double], p: Int,
                       lr: Double): Array[Double] = {
    val s = col("_s0")
    val gRow = withSigmas(feat, Array(w), p).agg(
      sum(qlong((col("y") - s) * element_at(col("x"), 1), 1e6)).as("g0"),
      ((1 until p).map(j =>
        sum(qlong((col("y") - s) * element_at(col("x"), j + 1), 1e6)).as(s"g$j")) :+
        count(lit(1)).as("n")): _*).collect().head
    val n = gRow.getLong(p)
    Array.tabulate(p)(j =>
      q6(w(j) + lr * gRow.getLong(j).toDouble / (1e6 * n.toDouble)))
  }

  /** Final weights only — the serving trainer: the identical snapped
    * GD chain as [[train]] minus the per-step accuracy passes
    * (`steps` corpus passes instead of 2·steps). Weights depend only
    * on the gradient sums, so the two paths are bit-identical. */
  def trainWeights(feat: DataFrame, p: Int, steps: Int,
                   lr: Double): Seq[Double] = {
    require(p >= 1 && p <= 16, s"1 <= p <= 16, got $p")
    require(steps >= 1, s"steps >= 1, got $steps")
    var w = Array.fill(p)(0.0)
    for (_ <- 1 to steps) w = gradStep(feat, w, p, lr)
    w.toSeq
  }

  /** Persist the trained weight vector exactly ONCE per corpus
    * fingerprint (the shared [[AnnIndex.oncePerFingerprint]] marker
    * lifecycle): the quality model's serving artifact — p doubles in
    * a one-row parquet, the smallest store in the serving family.
    * At 100 TB the 2·steps training passes run once per corpus
    * version; every later filter job reads one row and folds the
    * weights into its scan stage. */
  def buildWeightsIfAbsent(spark: org.apache.spark.sql.SparkSession,
                           feat: DataFrame, p: Int, steps: Int, lr: Double,
                           dir: String, fingerprint: String): Unit =
    AnnIndex.oncePerFingerprint(spark, dir, s"logit_p${p}_s$steps", fingerprint) {
      val w = trainWeights(feat, p, steps, lr)
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(w)), 1),
        StructType(Seq(StructField("w",
          org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false),
          nullable = false))))
        .write.mode("overwrite").parquet(s"$dir/weights")
    }

  /** The stored weight vector — one bounded row, the ridge-collect
    * convention's sanctioned driver read. */
  def storedWeights(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Double] =
    spark.read.parquet(s"$dir/weights").head.getSeq[Double](0)

  /** [[keep]] under the persisted model — the serving path: one-row
    * store read, then the zero-exchange literal-weight filter. */
  def keepIndexed(spark: org.apache.spark.sql.SparkSession, feat: DataFrame,
                  dir: String, threshold: Double = 0.5): DataFrame =
    keep(feat, storedWeights(spark, dir), threshold)

  /** The snapped quality probability of feature array `x` under
    * literal weights `w` — the public scoring column, for pipelines
    * that filter a frame carrying more than (doc_id, x) (e.g. the
    * ids flagship keeps text/lang/source through the gate). Same
    * expression [[keep]] filters on. */
  def score(x: Column, w: Seq[Double]): Column = sigma(x, w)

  /** [[score]] over inline feature expressions (no array
    * construction — see [[sigmaCols]] for why that matters inside a
    * big gate predicate). `xs(0)` is the 1.0 bias. */
  def scoreCols(xs: Seq[Column], w: Seq[Double]): Column = sigmaCols(xs, w)

  /** Score + filter with trained weights (the serving half): emits
    * docs whose predicted quality probability clears `threshold`.
    * Weights are literals folded into the scan stage; the filter
    * rides the scan, zero exchanges. */
  def keep(feat: DataFrame, w: Seq[Double],
           threshold: Double = 0.5): DataFrame =
    feat.where(sigma(col("x"), w) >= threshold)
      .select(col("doc_id"), sigma(col("x"), w).as("p_good"))

  // ---- multiclass (one-vs-rest) — the CCNet language-classifier
  // shape: K independent logistic heads over shared features, every
  // GD step ONE map-side-combined aggregate computing all K*p
  // gradient sums (one corpus pass per step, not K), weights as
  // K*p driver doubles between steps (the same ridge-collect
  // convention and 1e-6 snapping discipline as the binary trainer,
  // so the DuckDB oracle replays each head bit-for-bit).

  /** One OvR GD step from `w` (classes x p): all gradient sums in one
    * aggregate — class c's head sees label 1{y = c}. */
  private def ovrGradStep(feat: DataFrame, w: Array[Array[Double]],
                          p: Int, classes: Int, lr: Double): Array[Array[Double]] = {
    val aggs = for (c <- 0 until classes; j <- 0 until p) yield {
      val yc = when(col("y") === c.toDouble, 1.0).otherwise(0.0)
      sum(qlong((yc - col(s"_s$c")) * element_at(col("x"), j + 1), 1e6)).as(s"g_${c}_$j")
    }
    val row = withSigmas(feat, w, p)
      .agg(aggs.head, (aggs.tail :+ count(lit(1)).as("n")): _*)
      .collect().head
    val n = row.getLong(classes * p)
    Array.tabulate(classes, p)((c, j) =>
      q6(w(c)(j) + lr * row.getLong(c * p + j).toDouble / (1e6 * n.toDouble)))
  }

  /** Argmax training accuracy over the PROJECTED per-head sigmoids
    * `_s<c>` — the [[predictOvr]] argmax (greatest chain, first head
    * wins ties) re-expressed over [[withSigmas]] columns; identical
    * comparisons over identical doubles. */
  private def ovrAccCol(classes: Int): Column = {
    val scores = (0 until classes).map(c => col(s"_s$c"))
    val best = scores.reduce((a, b) => greatest(a, b))
    val pred = scores.zipWithIndex.foldRight(lit(-1)) { case ((s, c), acc) =>
      when(s === best, lit(c)).otherwise(acc)
    }
    qround(avg(when(pred === col("y").cast("int"), 1.0).otherwise(0.0)), 6)
  }

  /** Predicted class index under OvR weights: argmax of the K snapped
    * per-head sigmoids, FIRST head wins ties (a stable CASE chain in
    * class order — the langId argmax convention, engine-agnostic). */
  def predictOvr(x: Column, w: Seq[Seq[Double]]): Column = {
    val scores = w.map(wc => sigma(x, wc))
    val best = scores.reduce((a, b) => greatest(a, b))
    scores.zipWithIndex.foldRight(lit(-1)) { case ((s, c), acc) =>
      when(s === best, lit(c)).otherwise(acc)
    }
  }

  /** Train K one-vs-rest heads by `steps` full-batch GD steps over
    * `feat` = (doc_id, y double in 0..classes-1, x array<double>,
    * element 1 the 1.0 bias). Returns the TRAJECTORY: one row per
    * step with every post-step weight (w{c}_{j}) and that step's
    * argmax training accuracy — the graded evidence the multiclass
    * distillation learns. 2*steps corpus passes total. */
  def trainOvr(feat: DataFrame, p: Int, classes: Int, steps: Int,
               lr: Double): DataFrame = {
    require(p >= 1 && p <= 16, s"1 <= p <= 16, got $p")
    require(classes >= 2 && classes <= 16, s"2 <= classes <= 16, got $classes")
    require(steps >= 1, s"steps >= 1, got $steps")
    val spark = feat.sparkSession
    var w = Array.fill(classes, p)(0.0)
    val traj = Seq.newBuilder[Row]
    // FUSED passes (see [[train]]): step t's K*p gradient sums and
    // step t-1's argmax accuracy both run under w_{t-1} — one corpus
    // pass each, steps+1 total instead of 2*steps, bit-identical.
    w = ovrGradStep(feat, w, p, classes, lr)
    for (t <- 2 to steps) {
      val aggs = (for (c <- 0 until classes; j <- 0 until p) yield {
        val yc = when(col("y") === c.toDouble, 1.0).otherwise(0.0)
        sum(qlong((yc - col(s"_s$c")) * element_at(col("x"), j + 1), 1e6)).as(s"g_${c}_$j")
      }) ++ Seq(count(lit(1)).as("n"), ovrAccCol(classes).as("acc"))
      val row = withSigmas(feat, w, p).agg(aggs.head, aggs.tail: _*).collect().head
      val n = row.getLong(classes * p)
      traj += Row.fromSeq((t - 1).toLong +: w.flatten.toSeq :+ row.getDouble(classes * p + 1))
      w = Array.tabulate(classes, p)((c, j) =>
        q6(w(c)(j) + lr * row.getLong(c * p + j).toDouble / (1e6 * n.toDouble)))
    }
    val accLast = withSigmas(feat, w, p).agg(ovrAccCol(classes).as("acc"))
      .collect().head.getDouble(0)
    traj += Row.fromSeq(steps.toLong +: w.flatten.toSeq :+ accLast)
    val schema = StructType(
      StructField("step", LongType, nullable = false) +:
        (for (c <- 0 until classes; j <- 0 until p)
          yield StructField(s"w${c}_$j", DoubleType, nullable = false)) :+
        StructField("acc", DoubleType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(traj.result(), 1), schema)
  }

  /** Final OvR weights only (the serving trainer) — the identical
    * snapped chain minus the accuracy passes; bit-identical heads. */
  def trainOvrWeights(feat: DataFrame, p: Int, classes: Int, steps: Int,
                      lr: Double): Seq[Seq[Double]] = {
    require(p >= 1 && p <= 16 && classes >= 2 && classes <= 16 && steps >= 1,
      s"bad dims p=$p classes=$classes steps=$steps")
    var w = Array.fill(classes, p)(0.0)
    for (_ <- 1 to steps) w = ovrGradStep(feat, w, p, classes, lr)
    w.map(_.toSeq).toSeq
  }

  /** Persist the OvR weight MATRIX exactly once per corpus fingerprint
    * (the [[buildWeightsIfAbsent]] convention at K heads): classes x p
    * doubles as K (class, w) rows — still the smallest store in the
    * serving family. Every later classify job reads K rows and folds
    * the heads into its scan stage as literals. */
  def buildOvrWeightsIfAbsent(spark: org.apache.spark.sql.SparkSession,
                              feat: DataFrame, p: Int, classes: Int, steps: Int,
                              lr: Double, dir: String, fingerprint: String): Unit =
    AnnIndex.oncePerFingerprint(spark, dir,
      s"ovr_p${p}_c${classes}_s$steps", fingerprint) {
      val w = trainOvrWeights(feat, p, classes, steps, lr)
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          w.zipWithIndex.map { case (wc, c) => Row(c, wc) }, 1),
        StructType(Seq(
          StructField("class", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("w",
            org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false),
            nullable = false))))
        .write.mode("overwrite").parquet(s"$dir/weights")
    }

  /** The stored OvR matrix, class-ordered — K bounded rows, the
    * ridge-collect convention's sanctioned driver read. */
  def storedOvrWeights(spark: org.apache.spark.sql.SparkSession,
                       dir: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$dir/weights").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toSeq).toSeq
}
