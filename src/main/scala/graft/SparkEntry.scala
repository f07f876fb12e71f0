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
      WarpQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's single most load-bearing computation: valid
    * sequence-start detection (weather4cast/datasets.py:15-47) over the
    * events stream at hourly cadence. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val buckets = ev.select(col("user_id"),
      ops.Sequences.tsBucket(col("ts"), 3600L).as("bkt"))
    ops.Sequences.validStarts(buckets, "user_id", "bkt", 3)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
