package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graded-query registry plumbing.
  *
  * Every operator from SURVEY.md §2 is demonstrated as a [[Q]]: a named
  * Spark query over the driver's test tables plus (where ANSI-SQL can
  * express it) a DuckDB oracle that must hash-match. Column names and
  * the *shape* of floating-point arithmetic are mirrored exactly on
  * both sides — IEEE +,-,*,/ and sqrt are correctly rounded, so
  * identical expression shapes give bit-identical doubles; sums that
  * a parallel engine may reassociate are done in exact integer space
  * (quantize -> BIGINT sum -> divide), and transcendental outputs are
  * rounded to 5-6 decimals (Java vs libm differ in the last ulp).
  */
package object queries {

  /** One graded query: name, the Spark plan, and an optional DuckDB
    * oracle (None -> the driver records a weaker rows-only check). */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Shorthand table loader used by every query. */
  def T(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, sfDir, name)
}
