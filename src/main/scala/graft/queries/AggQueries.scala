package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{scalars, geometry}
import graft.ops.Ensemble

/** SURVEY.md §2.6 aggregation layer (A1-A8) + the full ensemble-fit
  * path A3 -> A4 -> N7 (weather4cast/ensemble.py:18-57) — the
  * reference's entire "training" deliverable.
  *
  * Determinism: every sum that a parallel engine may reassociate runs
  * in exact integer space (cents / 2^20-quantized BIGINTs); the ridge
  * algebra is then fixed-order double arithmetic on identical inputs,
  * so Spark and DuckDB produce bit-identical weights.
  */
object AggQueries {

  // pseudo-model predictions + target on lineitem, all in [0, ~1]
  private def p1 = col("l_discount")
  private def p2 = col("l_quantity") / lit(50.0)
  private def yv = col("l_extendedprice") / lit(110000.0)

  private val S = Ensemble.Scale.toDouble          // 2^20
  private val S2 = S * S                           // 2^40

  // quantized-BIGINT forms, Spark and SQL (floor-based: see package.qlong)
  private def q(c: org.apache.spark.sql.Column) = qlong(c, S)
  private def qSql(e: String) = qlongSql(e, S.toString)

  // shared SQL fragments for the ridge path (p=2: p1, p2 -> y)
  private val ridgeSumsSql =
    s"""SELECT count(*) AS n,
       |  CAST(sum(${qSql("l_discount")} * ${qSql("l_discount")}) AS BIGINT) AS s11,
       |  CAST(sum(${qSql("l_discount")} * ${qSql("l_quantity / 50e0")}) AS BIGINT) AS s12,
       |  CAST(sum(${qSql("l_quantity / 50e0")} * ${qSql("l_quantity / 50e0")}) AS BIGINT) AS s22,
       |  CAST(sum(${qSql("l_discount")} * ${qSql("l_extendedprice / 110000e0")}) AS BIGINT) AS sb1,
       |  CAST(sum(${qSql("l_quantity / 50e0")} * ${qSql("l_extendedprice / 110000e0")}) AS BIGINT) AS sb2
       |FROM lineitem""".stripMargin

  /** Fixed-order ridge algebra over the exact sums; mirrored verbatim
    * in [[ridgeSelectSpark]]. */
  private val ridgeSelectSql =
    s"""SELECT
       |  (((sb1 / (n * $S2)) * ((s22 / (n * $S2)) + (0.1e0 * (((s11 / (n * $S2)) + (s22 / (n * $S2))) / 2e0)))
       |    - ((sb2 / (n * $S2)) * (s12 / (n * $S2))))
       |   / ((((s11 / (n * $S2)) + (0.1e0 * (((s11 / (n * $S2)) + (s22 / (n * $S2))) / 2e0)))
       |       * ((s22 / (n * $S2)) + (0.1e0 * (((s11 / (n * $S2)) + (s22 / (n * $S2))) / 2e0))))
       |      - ((s12 / (n * $S2)) * (s12 / (n * $S2))))) AS w1,
       |  ((((s11 / (n * $S2)) + (0.1e0 * (((s11 / (n * $S2)) + (s22 / (n * $S2))) / 2e0))) * (sb2 / (n * $S2))
       |    - ((s12 / (n * $S2)) * (sb1 / (n * $S2))))
       |   / ((((s11 / (n * $S2)) + (0.1e0 * (((s11 / (n * $S2)) + (s22 / (n * $S2))) / 2e0)))
       |       * ((s22 / (n * $S2)) + (0.1e0 * (((s11 / (n * $S2)) + (s22 / (n * $S2))) / 2e0))))
       |      - ((s12 / (n * $S2)) * (s12 / (n * $S2))))) AS w2""".stripMargin

  /** Spark twin of the ridge sums + algebra: one shuffle-free agg,
    * then fixed-order column arithmetic.
    *
    * Codegen shape: quantized predictions are projected ONCE below the
    * agg, and the ridge algebra is CHAINED selects so each
    * subexpression (each `s_ij/(n*S2)`, the lambda, the matrix
    * entries, the determinant) is emitted a single time —
    * CollapseProject keeps non-cheap aliases that are referenced more
    * than once split, so the generated code stays linear instead of
    * re-inlining `g(s11)`-style terms ~20x. The VALUES are identical
    * to the one-select form (same IEEE ops in the same order), so the
    * oracle hash is unchanged. */
  /** The regularized-moment stage shared by both ridge variants:
    * one-pass quantized sums -> normalized moments -> (g12, gb1, gb2,
    * m11, m22) with the mean-diagonal lambda folded in. */
  private def ridgeMoments(s: org.apache.spark.sql.SparkSession, d: String) = {
    val sums = T(s, d, "lineitem")
      .select(q(p1).as("_q1"), q(p2).as("_q2"), q(yv).as("_qy"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_q1") * col("_q1")).as("s11"),
        sum(col("_q1") * col("_q2")).as("s12"),
        sum(col("_q2") * col("_q2")).as("s22"),
        sum(col("_q1") * col("_qy")).as("sb1"),
        sum(col("_q2") * col("_qy")).as("sb2"))
    val n2 = col("n") * lit(S2)
    val g = sums.select(
      (col("s11") / n2).as("g11"), (col("s12") / n2).as("g12"),
      (col("s22") / n2).as("g22"), (col("sb1") / n2).as("gb1"),
      (col("sb2") / n2).as("gb2"))
    val lam = lit(0.1) * ((col("g11") + col("g22")) / lit(2.0))
    g.select(col("g12"), col("gb1"), col("gb2"),
      (col("g11") + lam).as("m11"), (col("g22") + lam).as("m22"))
  }

  private def ridgeWeightsSpark(s: org.apache.spark.sql.SparkSession, d: String) = {
    val m = ridgeMoments(s, d)
    val dd = m.select(col("g12"), col("gb1"), col("gb2"), col("m11"), col("m22"),
      ((col("m11") * col("m22")) - (col("g12") * col("g12"))).as("det"))
    dd.select(
      (((col("gb1") * col("m22")) - (col("gb2") * col("g12"))) / col("det")).as("w1"),
      (((col("m11") * col("gb2")) - (col("g12") * col("gb1"))) / col("det")).as("w2"))
  }

  /** A4 sum-to-1 variant, in-plan: for p=2 the KKT system
    * (ensemble.py:49-57) collapses to the closed form
    * w1 = (M22 - M12 + b1 - b2) / (M11 - 2 M12 + M22), w2 = 1 - w1
    * (substitute w2 = 1 - w1 into the regularized quadratic and set
    * the derivative to zero). `EnsembleSpec` checks this analytic
    * form agrees with the driver-side KKT Gaussian elimination. */
  private def ridgeSum1Spark(s: org.apache.spark.sql.SparkSession, d: String) = {
    val m = ridgeMoments(s, d)
    val w1 = m.select(
      (((col("m22") - col("g12")) + (col("gb1") - col("gb2"))) /
        ((col("m11") - (lit(2.0) * col("g12"))) + col("m22"))).as("w1"))
    w1.select(col("w1"), (lit(1.0) - col("w1")).as("w2"))
  }

  val all: Seq[Q] = Seq(

    // A1: conditional mean imputation incl. the all-fill -> 0.0 branch
    // (datasets.py:64-71). Window agg partitioned by the frame key.
    Q("a1_cond_mean_impute",
      (s, d) => {
        // window over the frame key, NOT groupBy+join-back: both were
        // measured equal at sf0.1 (1.2-1.9s steady state), but the
        // window scans the fact table ONCE (one key shuffle + sort)
        // while the join form scans it twice — at cluster scale the
        // scan dominates, so the single-pass plan wins.
        val w = Window.partitionBy("l_orderkey")
        val cnt = sum(when(col("l_discount") =!= 0.0, 1).otherwise(0)).over(w)
        val sumc = sum(when(col("l_discount") =!= 0.0,
          qlong(col("l_extendedprice"), 100))).over(w)
        val mean = when(cnt > 0, sumc / (lit(100.0) * cnt))
        T(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") === 0.0, coalesce(mean, lit(0.0)))
            .otherwise(col("l_extendedprice")).as("imputed"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_discount = 0e0 THEN coalesce(mean_v, 0e0) ELSE l_extendedprice END AS imputed
             |FROM (
             |  SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
             |    CASE WHEN cnt > 0 THEN CAST(sumc AS BIGINT) / (100.0e0 * cnt) END AS mean_v
             |  FROM (
             |    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
             |      sum(CASE WHEN l_discount <> 0e0 THEN 1 ELSE 0 END)
             |        OVER (PARTITION BY l_orderkey) AS cnt,
             |      sum(CASE WHEN l_discount <> 0e0 THEN CAST(floor((l_extendedprice) * 100 + 0.5e0) AS BIGINT) END)
             |        OVER (PARTITION BY l_orderkey) AS sumc
             |    FROM lineitem))""".stripMargin)),

    // A2: global-max normalization (datasets.py:149) — one-pass agg
    // broadcast back; max is exact so no quantization needed
    Q("a2_global_max_norm",
      (s, d) => {
        val c = T(s, d, "customer")
        val mx = c.agg(max(col("c_acctbal")).as("mx"))
        c.crossJoin(broadcast(mx))
          .select(col("c_custkey"), (col("c_acctbal") / col("mx")).as("norm_bal"))
      },
      Some("""SELECT c_custkey,
             |  c_acctbal / (SELECT max(c_acctbal) FROM customer) AS norm_bal
             |FROM customer""".stripMargin)),

    // A3: incremental Gram matrix as one shuffle-free pass
    // (ensemble.py:18-41); running-mean merge == partial aggregation
    Q("a3_gram_matrix",
      (s, d) => Ensemble.gramAgg(T(s, d, "lineitem"), Seq(p1, p2), yv),
      Some(s"""SELECT n, s11 / (n * $S2) AS g_0_0, s12 / (n * $S2) AS g_0_1,
              |  s22 / (n * $S2) AS g_1_1, sb1 / (n * $S2) AS b_0, sb2 / (n * $S2) AS b_1
              |FROM ($ridgeSumsSql)""".stripMargin)),

    // A4: closed-form ridge weights (ensemble.py:44-46), p=2 expressed
    // fully in-plan so the oracle can reproduce the algebra
    Q("a4_ridge_weights",
      (s, d) => ridgeWeightsSpark(s, d),
      Some(s"$ridgeSelectSql\nFROM ($ridgeSumsSql)")),

    // A4 sum-to-1: the constrained KKT variant (ensemble.py:49-57),
    // p=2 closed form fully in-plan so the oracle reproduces it
    Q("a4_ridge_sum1",
      (s, d) => ridgeSum1Spark(s, d),
      Some(s"""WITH s AS ($ridgeSumsSql),
              |g AS (SELECT (s11 / (n * $S2)) AS g11, (s12 / (n * $S2)) AS g12,
              |             (s22 / (n * $S2)) AS g22, (sb1 / (n * $S2)) AS gb1,
              |             (sb2 / (n * $S2)) AS gb2 FROM s),
              |m AS (SELECT g12, gb1, gb2,
              |             g11 + (0.1e0 * ((g11 + g22) / 2e0)) AS m11,
              |             g22 + (0.1e0 * ((g11 + g22) / 2e0)) AS m22 FROM g)
              |SELECT w1, (1e0 - w1) AS w2 FROM (
              |  SELECT (((m22 - g12) + (gb1 - gb2))
              |          / ((m11 - (2e0 * g12)) + m22)) AS w1 FROM m)""".stripMargin)),

    // A3+A4+N7: the whole ensemble-fit path — fit weights, broadcast
    // them, blend per row (ensemble.py:81-101)
    Q("ens_fit_blend",
      (s, d) => {
        val weights = ridgeWeightsSpark(s, d)
        T(s, d, "lineitem").crossJoin(broadcast(weights))
          .select(col("l_orderkey"), col("l_linenumber"),
            ((col("w1") * p1) + (col("w2") * p2)).as("blended"))
      },
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ((w1 * l_discount) + (w2 * (l_quantity / 50e0))) AS blended
              |FROM lineitem CROSS JOIN ($ridgeSelectSql FROM ($ridgeSumsSql))""".stripMargin)),

    // A5: streaming moments -> correlation (ensemble.py:103-123);
    // exact integer moments, fixed-order double algebra
    Q("a5_correlation",
      (s, d) => {
        // integer moments projected once below the agg; the mean-space
        // algebra chained so each m(c) is emitted once (see
        // ridgeWeightsSpark's codegen note)
        val sums = T(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("_x"),
            qlong(col("l_extendedprice"), 1).as("_y"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("_x")).as("sx"),
            sum(col("_y")).as("sy"),
            sum(col("_x") * col("_x")).as("sxx"),
            sum(col("_y") * col("_y")).as("syy"),
            sum(col("_x") * col("_y")).as("sxy"))
        def m(c: String) = col(c).cast("double") / col("n")
        val ms = sums.select(m("sx").as("mx"), m("sy").as("my"),
          m("sxx").as("mxx"), m("syy").as("myy"), m("sxy").as("mxy"))
        val cov = col("mxy") - (col("mx") * col("my"))
        val vx = col("mxx") - (col("mx") * col("mx"))
        val vy = col("myy") - (col("my") * col("my"))
        ms.select((cov / (sqrt(vx) * sqrt(vy))).as("corr_qty_price"))
      },
      Some("""SELECT
             |  ((CAST(sxy AS DOUBLE) / n) - ((CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
             |  / (sqrt((CAST(sxx AS DOUBLE) / n) - ((CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
             |     * sqrt((CAST(syy AS DOUBLE) / n) - ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))) AS corr_qty_price
             |FROM (
             |  SELECT CAST(count(*) AS DOUBLE) AS n,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             |    CAST(sum(CAST(floor((l_extendedprice) * 1 + 0.5e0) AS BIGINT)) AS BIGINT) AS sy,
             |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
             |    CAST(sum(CAST(floor((l_extendedprice) * 1 + 0.5e0) AS BIGINT) * CAST(floor((l_extendedprice) * 1 + 0.5e0) AS BIGINT)) AS BIGINT) AS syy,
             |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(floor((l_extendedprice) * 1 + 0.5e0) AS BIGINT)) AS BIGINT) AS sxy
             |  FROM lineitem)""".stripMargin)),

    // A6: loss/metric reductions — MSE, rounded-MSE, normlogit-MSE
    // (models.py:282-309); diffs quantized to exact ints pre-sum
    Q("a6_mse_family",
      (s, d) => {
        val pred = col("l_quantity") * lit(2200.0)
        val truth = col("l_extendedprice")
        // diffs projected once below the agg: dnl expands normlogit
        // (log/least/greatest chain) twice — inlined into sum(dnl*dnl)
        // it would be emitted 4x in the generated code
        // signed diffs: floor(x + 0.5) rounds half-ties toward +inf on
        // negatives (vs round()'s away-from-zero) — the SQL twin uses
        // the identical floor form, so the hash contract holds
        val diffs = T(s, d, "lineitem").select(
          qlong(pred - truth, 1).as("_dd"),
          (qlong(pred, 1) - qlong(truth, 1)).as("_dr"),
          qlong(qround(scalars.normlogit(p1 + lit(0.01)), 6)
            - qround(scalars.normlogit(col("l_tax") + lit(0.01)), 6), 1000000)
            .as("_dnl"))
        diffs.agg(
          (sum(col("_dd") * col("_dd")) / count(lit(1)).cast("double")).as("mse"),
          (sum(col("_dr") * col("_dr")) / count(lit(1)).cast("double")).as("rounded_mse"),
          (sum(col("_dnl") * col("_dnl")) / (count(lit(1)).cast("double") * lit(1.0e12))).as("normlogit_mse"))
      },
      Some {
        val lM = scalars.lM
        def nl(x: String) =
          qroundSql(s"(ln(least(greatest($x, 3e-3), 0.997e0) / (1e0 - least(greatest($x, 3e-3), 0.997e0))) + $lM) / ${2.0 * lM}", 6)
        s"""SELECT
           |  CAST(sum(dd * dd) AS BIGINT) / CAST(count(*) AS DOUBLE) AS mse,
           |  CAST(sum(dr * dr) AS BIGINT) / CAST(count(*) AS DOUBLE) AS rounded_mse,
           |  CAST(sum(dnl * dnl) AS BIGINT) / (CAST(count(*) AS DOUBLE) * 1e12) AS normlogit_mse
           |FROM (
           |  SELECT
           |    CAST(floor(((l_quantity * 2200e0) - l_extendedprice) * 1 + 0.5e0) AS BIGINT) AS dd,
           |    CAST(floor((l_quantity * 2200e0) * 1 + 0.5e0) - floor((l_extendedprice) * 1 + 0.5e0) AS BIGINT) AS dr,
           |    CAST(floor((${nl("l_discount + 0.01e0")} - ${nl("l_tax + 0.01e0")}) * 1000000 + 0.5e0) AS BIGINT) AS dnl
           |  FROM lineitem)""".stripMargin
      }),

    // A7: any-over-sequence (models.py:268-270)
    Q("a7_any_over_seq",
      (s, d) => T(s, d, "events").groupBy(col("user_id")).agg(
        bool_or(col("event_type") === "error").as("has_error"),
        count(lit(1)).as("n_events")),
      Some("""SELECT user_id, bool_or(event_type = 'error') AS has_error,
             |  count(*) AS n_events
             |FROM events GROUP BY user_id""".stripMargin)),

    // A8: s×s average pooling as a hash agg on computed block keys
    // (blocks.py:44-46)
    Q("a8_avg_pool",
      (s, d) => T(s, d, "lineitem")
        .select((col("l_orderkey") % 16).as("i"), (col("l_partkey") % 16).as("j"),
          col("l_quantity"))
        .groupBy(geometry.poolKey(col("i"), 4).as("pool_i"),
          geometry.poolKey(col("j"), 4).as("pool_j"))
        .agg(count(lit(1)).as("n"),
          (sum(col("l_quantity").cast("long")) / count(lit(1)).cast("double")).as("avg_qty")),
      Some("""SELECT CAST(floor(i / 4) AS BIGINT) AS pool_i, CAST(floor(j / 4) AS BIGINT) AS pool_j,
             |  count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_qty
             |FROM (SELECT l_orderkey % 16 AS i, l_partkey % 16 AS j, l_quantity FROM lineitem)
             |GROUP BY 1, 2""".stripMargin)),

    // A9 (extension): per-key z-score OUTLIER flags — the sensor-QC /
    // quality-filtering staple. Moments run in exact integer space
    // per key (the a5 convention: reassociation-proof), broadcast
    // nothing — the per-key stats rejoin on the SAME key the flag
    // pass groups by, so the whole query rides two exchanges of one
    // key. The |z| > 3 boundary compares the 1e-6-snapped |z| on
    // both engines (a last-ulp sqrt difference cannot flip a flag);
    // zero-variance keys flag nothing (nullif guards the division).
    Q("a9_zscore_outliers",
      (s, d) => {
        val ev = T(s, d, "events").select(col("user_id"), col("value"))
        val st = ev.groupBy(col("user_id")).agg(
          count(lit(1)).as("n"),
          sum(qlong(col("value"), 1e5)).as("s1"),
          sum(qlong(col("value"), 1e5) * qlong(col("value"), 1e5)).as("s2"))
          .where(col("n") >= 2)
          .select(col("user_id"), col("n"),
            (col("s1").cast("double") / (lit(1e5) * col("n"))).as("mean"),
            sqrt(nullif(
              col("s2").cast("double") / (lit(1e10) * col("n")) -
                (col("s1").cast("double") / (lit(1e5) * col("n"))) *
                (col("s1").cast("double") / (lit(1e5) * col("n"))), lit(0.0))).as("sd"))
        ev.join(st, Seq("user_id"))
          .select(col("user_id"), col("n"), col("mean"), col("sd"),
            coalesce(qround(abs((col("value") - col("mean")) / col("sd")), 6) > 3.0,
              lit(false)).as("_out"))
          .groupBy(col("user_id"))
          .agg(first(col("n")).as("n_events"),
            qround(first(col("mean")), 6).as("mean_value"),
            sum(col("_out").cast("long")).as("n_outliers"))
      },
      Some("""WITH st AS (
             |  SELECT user_id, count(*) AS n,
             |    CAST(sum(CAST(floor(value * 100000 + 0.5e0) AS BIGINT)) AS BIGINT) AS s1,
             |    CAST(sum(CAST(floor(value * 100000 + 0.5e0) AS BIGINT)
             |           * CAST(floor(value * 100000 + 0.5e0) AS BIGINT)) AS BIGINT) AS s2
             |  FROM events GROUP BY 1 HAVING count(*) >= 2),
             |s2t AS (SELECT user_id, n,
             |    CAST(s1 AS DOUBLE) / (1e5 * n) AS mean,
             |    sqrt(nullif(CAST(s2 AS DOUBLE) / (1e10 * n)
             |      - (CAST(s1 AS DOUBLE) / (1e5 * n)) * (CAST(s1 AS DOUBLE) / (1e5 * n)), 0e0)) AS sd
             |  FROM st)
             |SELECT e.user_id, any_value(t.n) AS n_events,
             |  (floor(any_value(t.mean) * 1000000 + 0.5e0) / 1000000.0e0) AS mean_value,
             |  CAST(sum(CASE WHEN coalesce(
             |      (floor(abs((e.value - t.mean) / t.sd) * 1000000 + 0.5e0) / 1000000.0e0) > 3.0e0,
             |      FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM events e JOIN s2t t ON t.user_id = e.user_id
             |GROUP BY e.user_id""".stripMargin)),
  )
}
