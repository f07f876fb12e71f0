package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.scalars

/** Weather-semantics parity fixtures (FIXTURES.md §B): a tiny
  * long-form raster with planted fill values, one ALL-FILL frame
  * (datasets.py:66-69 branch), a static dim with negative elevation,
  * and the full frame pipeline decode -> impute -> static join. */
class WeatherParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fill = 65535
  // frames: (region, t, i, j, raw). t=0 normal with 2 fill pixels;
  // t=1 ALL fill; 2x2 grid
  private lazy val frames = Seq(
    ("R1", 0, 0, 0, 11000), ("R1", 0, 0, 1, Fill),
    ("R1", 0, 1, 0, 22000), ("R1", 0, 1, 1, Fill),
    ("R1", 1, 0, 0, Fill), ("R1", 1, 0, 1, Fill),
    ("R1", 1, 1, 0, Fill), ("R1", 1, 1, 1, Fill)
  ).toDF("region", "t", "i", "j", "raw")

  private lazy val static = Seq(
    ("R1", 0, 0, -5.0f), ("R1", 0, 1, 10.0f), ("R1", 1, 0, 20.0f), ("R1", 1, 1, 30.0f)
  ).toDF("region", "i", "j", "elev")

  test("A1: fill pixels imputed with frame mean; all-fill frame -> 0.0") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("region", "t")
    val v = scalars.fillToNull($"raw".cast("double"), lit(Fill.toDouble))
    val imputed = frames
      .withColumn("v", v)
      .withColumn("imp", coalesce($"v", avg($"v").over(w), lit(0.0)))
    val t0 = imputed.where($"t" === 0).select("imp").collect().map(_.getDouble(0)).sorted
    assert(t0.toSeq == Seq(11000.0, 16500.0, 16500.0, 22000.0)) // mean of 11000,22000
    val t1 = imputed.where($"t" === 1).select("imp").collect().map(_.getDouble(0))
    assert(t1.forall(_ == 0.0)) // the all-fill branch
  }

  test("decode normalizes the imputed frame into [0,1]") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("region", "t")
    val v = scalars.fillToNull($"raw".cast("double"), lit(Fill.toDouble))
    val dec = frames.withColumn("imp", coalesce(v, avg(v).over(w), lit(0.0)))
      .select(scalars.minmaxDecode($"imp", 0, 22000).as("d"))
      .agg(min($"d"), max($"d")).collect()(0)
    assert(dec.getDouble(0) >= 0.0 && dec.getDouble(1) <= 1.0)
  }

  test("J1+P4: broadcast static join with elevation clamp") {
    val joined = frames.join(broadcast(
      static.select($"region", $"i", $"j", scalars.clampMin($"elev".cast("double")).as("elev"))),
      Seq("region", "i", "j"))
    assert(joined.count() == 8)
    assert(joined.where($"elev" < 0).count() == 0)
    assert(joined.where($"i" === 0 && $"j" === 0).select("elev").distinct()
      .collect()(0).getDouble(0) == 0.0) // -5 clamped
  }

  test("N2 encode emits integers in the uint16 range") {
    val enc = frames.select(
      scalars.minmaxEncode(scalars.minmaxDecode($"raw".cast("double"), 0, Fill), 0, Fill).as("e"))
    val bad = enc.where($"e" < 0 || $"e" > 65535).count()
    assert(bad == 0)
  }
}
