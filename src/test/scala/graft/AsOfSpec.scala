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
