package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** pipe_submit_e2e branch coverage the real testdata may not reach:
  * an ALL-FILL sequence (every deduped step an 'error' event) must
  * flow decode→NULL → impute-0.0 → blend → encode without dropping
  * the row, and a user with no dim row must survive the left join
  * with segment 'NONE'. Runs the actual graded query fn over a
  * synthetic mini-lake written to a temp dir. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship pipeline: all-fill sequence and missing dim row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    // user 7: three consecutive hourly buckets, ALL error events
    // (value irrelevant) -> the all-fill -> 0.0 impute branch.
    // user 1: buckets 0-2, mixed: one error at step 1 (imputed from
    // the other two), has a customer row.
    val h = 3600L
    val ev = Seq(
      (7L, 100L, 0L * h, 50.0, "error"), (7L, 101L, 1L * h, 60.0, "error"),
      (7L, 102L, 2L * h, 70.0, "error"),
      (1L, 200L, 0L * h, 100.0, "purchase"), (1L, 201L, 1L * h, 0.0, "error"),
      (1L, 202L, 2L * h, 40.0, "click"),
      // same bucket as 202 but lower priority -> dedup must drop it
      (1L, 203L, 2L * h + 5, 999.0, "view"))
      .toDF("user_id", "event_id", "sec", "value", "event_type")
      .select(col("user_id"), col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("value"), col("event_type"))
    ev.write.parquet(s"$dir/events.parquet")
    // dim row only for user 1
    Seq((1L, "BUILDING")).toDF("c_custkey", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")

    val rows = SparkEntry.queries("pipe_submit_e2e")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getString(4)))
    assert(rows.length == 2)
    val byUser = rows.map(r => r._1 -> r).toMap

    // all-fill: iv = 0.0 for every step -> bv = 0.7*0 + 0.3*sigmoid(-2)
    val bvFill = 0.3 * (1.0 / (1.0 + math.exp(2.0)))
    val codeFill = math.floor(bvFill * 32768.0 + 0.5).toLong
    val hexFill = f"$codeFill%04X" * 3
    assert(byUser(7L) == ((7L, "NONE", 3L, hexFill)))

    // mixed: steps decode to 0.5 and 0.2; the error step imputes to
    // the quantized mean (0.5+0.2)/2 = 0.35 exactly (1e-5 grid)
    def code(iv: Double): Long = {
      val bv = iv * 0.7 + (1.0 / (1.0 + math.exp(-(iv * 4.0 - 2.0)))) * 0.3
      math.floor(bv * 32768.0 + 0.5).toLong
    }
    val hexMixed = f"${code(0.5)}%04X${code(0.35)}%04X${code(0.2)}%04X"
    assert(byUser(1L) == ((1L, "BUILDING", 3L, hexMixed)))
  }
}
