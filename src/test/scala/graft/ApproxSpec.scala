package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bounds the HLL++ sketch against its exact twin: the
  * `g_approx_distinct` query has no SQL oracle (sketch internals are
  * engine-specific), so the accuracy claim lives here instead —
  * approx_count_distinct's default rsd is 5%, and the query computes
  * both columns in one pass for exactly this comparison. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("g_approx_distinct: sketch within 5% of the exact count") {
    val row = SparkEntry.allQueries.find(_.name == "g_approx_distinct").get
      .fn(spark, "/root/testdata/sf0.001").collect()(0)
    val approx = row.getAs[Long]("approx_parts").toDouble
    val exact = row.getAs[Long]("exact_parts").toDouble
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact rel-err=${math.abs(approx - exact) / exact}")
  }

  test("g_approx_quantile: GK sketch median within 2% of the exact median") {
    import org.apache.spark.sql.functions.expr
    // the exact percentile() twin lives here (small SF only) — it buffers
    // every value per partial aggregate, so it must never ride in the
    // graded query that the bench times at sf0.1
    val sfDir = "/root/testdata/sf0.001"
    val approx = SparkEntry.allQueries.find(_.name == "g_approx_quantile").get
      .fn(spark, sfDir).collect()(0).getAs[Double]("approx_med")
    val exact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
      .collect()(0).getAs[Double]("exact_med")
    assert(exact > 0)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx=$approx exact=$exact rel-err=${math.abs(approx - exact) / exact}")
  }
}
