package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format round-trips beyond parquet: the engine's tables
  * survive CSV and JSON-lines round-trips with explicit schemas (the
  * interchange formats an ingest pipeline actually receives). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def roundTrip(fmt: String): Unit = {
    val nation = sources.Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
    nation.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
    val back = spark.read.format(fmt).option("header", "true")
      .schema(nation.schema) // explicit schema: no inference drift
      .load(dir)
    assert(back.schema == nation.schema)
    val a = nation.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"$fmt round-trip changed rows")
  }

  test("nation survives a CSV round-trip with explicit schema")(roundTrip("csv"))
  test("nation survives a JSON-lines round-trip with explicit schema")(roundTrip("json"))
}
