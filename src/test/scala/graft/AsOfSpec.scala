package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AsOf, Sequences}

/** As-of join + sessionization semantics on hand-built fixtures. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("asofJoin: <= match, equal-ts inclusive, pre-anchor NULL, same-ts tie-break") {
    val left = Seq((1L, 10L, 50L), (2L, 10L, 100L), (3L, 10L, 150L), (4L, 20L, 100L))
      .map { case (id, k, sec) => (id, k, ts(sec)) }.toDF("id", "k", "t")
    val right = Seq((100L, 10L, 100L, 1.0), (101L, 10L, 100L, 2.0), (102L, 10L, 120L, 3.0))
      .map { case (aid, k, sec, v) => (aid, k, ts(sec), v) }.toDF("aid", "k", "t", "av")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("av"), tieBreak = "aid")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.get(r.fieldIndex("av")))).toMap
    assert(out(1L).isEmpty, "row before any anchor must get NULL")
    assert(out(2L).contains(2.0), "equal-ts anchor matches; larger tie-break id wins")
    assert(out(3L).contains(3.0), "latest preceding anchor wins")
    assert(out(4L).isEmpty, "keys never mix")
  }

  test("asofJoin matches a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    // deliberately collision-heavy: few keys, few timestamps, so ties
    // and missing-anchor cases all occur
    val left = (1L to 200L).map(id => (id, rnd.nextInt(5).toLong, ts(rnd.nextInt(50).toLong)))
      .toDF("id", "k", "t")
    val rightRows = (1L to 60L).map(aid =>
      (aid, rnd.nextInt(5).toLong, ts(rnd.nextInt(50).toLong), rnd.nextDouble()))
    val right = rightRows.toDF("aid", "k", "t", "av")
      // unique (k, t): keep the max-aid row, as the query layer does
      .groupBy($"k", $"t").agg(max_by($"av", $"aid").as("av"), max($"aid").as("aid"))
    val got = AsOf.asofJoin(left.toDF(), right, "k", "t", Seq("av", "aid"), tieBreak = "aid")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.get(r.fieldIndex("av"))), Option(r.get(r.fieldIndex("aid"))))).toMap
    // brute force: latest (max t, then max aid) anchor with t <= left.t
    val anchors = right.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[java.sql.Timestamp]("t"), r.getAs[Double]("av"), r.getAs[Long]("aid")))
    for ((id, k, t) <- left.collect().map(r =>
        (r.getAs[Long]("id"), r.getAs[Long]("k"), r.getAs[java.sql.Timestamp]("t")))) {
      val eligible = anchors.filter(a => a._1 == k && !a._2.after(t))
      val expect = if (eligible.isEmpty) (None, None) else {
        val best = eligible.maxBy(a => (a._2.getTime, a._4))
        (Some(best._3), Some(best._4))
      }
      assert(got(id) == expect, s"id=$id k=$k t=$t")
    }
  }

  test("sessionize: gap strictly greater than maxGap starts a new session") {
    val ev = Seq((1L, 10L, 0L), (2L, 10L, 100L), (3L, 10L, 200L), (4L, 10L, 501L), (5L, 20L, 0L))
      .map { case (id, k, sec) => (id, k, ts(sec)) }.toDF("event_id", "user_id", "t")
    val s = Sequences.sessionize(ev, "user_id", "t", maxGapSeconds = 100L, tieBreak = "event_id")
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(s(1L) == 1L && s(2L) == 1L && s(3L) == 1L, "gaps == maxGap stay in session")
    assert(s(4L) == 2L, "gap > maxGap starts session 2")
    assert(s(5L) == 1L, "each key numbers its own sessions")
  }
}
