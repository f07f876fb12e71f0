package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over /root/testdata tables, with a DuckDB oracle twin
  * where ANSI SQL can express the semantics (queries without one get
  * the driver's weaker rows-only check).
  */
object SparkEntry {

  /** All graded queries, grouped by SURVEY.md §2 area. */
  def allQueries: Seq[Q] =
    ScalarQueries.all ++
      RelationalQueries.all ++
      SequenceQueries.all ++
      AggQueries.all ++
      TextQueries.all ++
      SimilarityQueries.all ++
      MiscQueries.all ++
      WarpQueries.all ++
      PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's §3.1 pipeline shape end-to-end: catalog scan ->
    * valid sequence-start detection (weather4cast/datasets.py:15-47,
    * the single most load-bearing computation) -> sequence assembly ->
    * per-sample aggregate -> normalized/blended output. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val ev = sources.Tables.load(spark, d, "events")
      .select(col("user_id"), ops.Sequences.tsBucket(col("ts"), 3600L).as("bkt"),
        col("value"))
    val starts = ops.Sequences.validStarts(
      ev.select(col("user_id"), col("bkt")), "user_id", "bkt", 3)
    ops.Sequences.assemble(starts, ev, "user_id", "bkt", 3)
      .groupBy(col("user_id"), col("t0"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")) / 100.0).as("sum_val"))
      .select(col("user_id"), col("t0"), col("n_events"),
        functions.scalars.sigmoid(col("sum_val") / lit(100.0)).as("activity_score"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** SCALE-CLASS registry (r19): which graded forms ship at 100 TB
    * and which are SEMANTIC FIXTURES kept for their oracle value. A
    * user picking a query by name reads this; ScaleBench enforces it
    * (fixture forms are excluded from decade sweeps past their
    * documented wall — a loud exclusion, never a silent cap);
    * `tools/check_coverage.py` cross-checks it against COVERAGE.md;
    * Verify dumps the full map as `scale_class.json`.
    *
    * Vocabulary: `linear` (data-proportional — the default for every
    * query not listed here), `fixture@x<N>` (correct at every graded
    * SF but superlinear by construction; measured through the x<N>
    * decade and excluded beyond it). Walls are MEASURED, not argued:
    * SCALE.md records each one. */
  val scaleOverrides: Map[String, String] = Map(
    // fixed K=8 while N grows: per-cluster pair work is (N/K)^2 by
    // construction — 141 s / slope 29.9 at x100 (SCALE.md r18);
    // the production forms are e_semdedup_kscaled (x100) and
    // e_semdedup_bucketed/_probed (every decade)
    "e_semdedup_keep" -> "fixture@x10",
    // exact two-level hierarchy: O(N^1.5) assignment — linear-class
    // through x100 (18.9 s), 1275 s / slope 51 at x1000 (SCALE.md
    // r18); past x100 the graded linear route is e_semdedup_bucketed
    "e_semdedup_kscaled" -> "fixture@x100",
    // both embed the exact hierarchy as recall ground truth, so they
    // inherit its wall; the production query they calibrate
    // (e_semdedup_probed) is linear at every decade
    "e_semdedup_recall_curve" -> "fixture@x100",
    "e_semdedup_opq" -> "fixture@x100",
    "e_semdedup_opq_probed" -> "fixture@x100")

  /** The full per-query scale-class map (default `linear`). */
  def scaleClasses: Map[String, String] = {
    val unknown = scaleOverrides.keySet.diff(allQueries.map(_.name).toSet)
    require(unknown.isEmpty,
      s"scaleOverrides name(s) not in the registry: ${unknown.mkString(", ")}")
    allQueries.map(q => q.name -> scaleOverrides.getOrElse(q.name, "linear")).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
