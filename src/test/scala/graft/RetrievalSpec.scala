package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Retrieval

/** BM25 + RRF on planted fixtures: the ranking properties the graded
  * queries can't show on synthetic word-soup (term-frequency
  * monotonicity, length normalization, idf weighting, and the
  * fusion-boost of an id present in BOTH lists). */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scores(docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, Double] =
    Retrieval.bm25Scores(docs.toDF("doc_id", "text"), $"text", $"doc_id", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("BM25: tf monotone, length-normalized, idf favors rare terms, non-matches omitted") {
    val docs = Seq(
      (1L, "spark spark spark filler filler filler"),   // tf=3
      (2L, "spark filler filler filler filler filler"), // tf=1, same length
      (3L, "spark " + Seq.fill(50)("filler").mkString(" ")), // tf=1, much longer
      (4L, "nothing relevant here at all whatsoever"))  // no match
    val s = scores(docs, Seq("spark"))
    assert(!s.contains(4L), "non-matching docs are omitted")
    assert(s(1L) > s(2L), s"higher tf must score higher: $s")
    assert(s(2L) > s(3L), s"same tf in a longer doc must score lower (b=0.75): $s")

    // idf: a term in 1 of 4 docs outweighs a term in 3 of 4 at equal tf
    val docs2 = Seq(
      (1L, "common rare x"), (2L, "common x y"), (3L, "common y z"), (4L, "w x y"))
    val s2 = scores(docs2, Seq("common", "rare"))
    // doc 1 matches both; its rare-term contribution alone must exceed
    // doc 2's common-term score
    assert(s2(1L) > s2(2L) + s2(3L), s"rare term must dominate: $s2")
  }

  test("BM25 scores replay as the documented closed form") {
    // one doc, one term, hand-computed: N=2, df=1, tf=2, dl=4, avgdl=3.5
    val docs = Seq((1L, "t t a b"), (2L, "a b c")) // dl 4 and 3
    val s = scores(docs, Seq("t"))
    val idf = math.floor(math.log(1.0 + (2.0 - 1.0 + 0.5) / 1.5) * 1e6 + 0.5) / 1e6
    val expect = {
      val raw = idf * (2.0 * 2.2) / (2.0 + 1.2 * (0.25 + 0.75 * 4.0 * 2.0 / 7.0))
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    assert(math.abs(s(1L) - expect) < 1e-9, s"got ${s(1L)}, want $expect")
  }

  test("RRF: an id ranked in BOTH lists beats either list's top-1; absent ranks read 0") {
    val a = Seq((10L, 1L), (42L, 2L), (11L, 3L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (42L, 2L), (21L, 3L)).toDF("id", "rank")
    val f = Retrieval.rrfFuse(a, b, 60).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    // 42: 1/62 + 1/62 > 1/61 (either top-1 alone)
    assert(f(42L)._1 > f(10L)._1 && f(42L)._1 > f(20L)._1,
      s"both-lists id must win: $f")
    assert(f(10L)._2 == 1L && f(10L)._3 == 0L, "absent rank reads 0")
    assert(f.keySet == Set(10L, 11L, 20L, 21L, 42L), "full outer union of ids")
    val rrf42 = math.floor((1.0 / 62 + 1.0 / 62) * 1e6 + 0.5) / 1e6
    assert(math.abs(f(42L)._1 - rrf42) < 1e-9)
  }

  test("AnnIndex filtered search: only allow-listed vectors rank; composes with takedown") {
    import graft.ops.{AnnIndex, Pq}
    val dim = 8
    val p = Pq.Params(dim = dim, m = 2, ks = 4)
    val rnd = new scala.util.Random(11)
    val emb = (1 to 40).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble())))
      .toDF("vec_id", "ve")
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-filter").toString
    AnnIndex.build(emb, dir, 2, p)
    val q = Seq(Tuple1(Seq.fill(dim)(rnd.nextDouble()))).toDF("qv")
    val even = emb.where($"vec_id" % 2 === 0).select($"vec_id")
    val got = AnnIndex.search(spark, dir, q, nprobe = 2, limit = 40, p = p,
      allow = Some(even)).select($"vec_id").collect().map(_.getLong(0))
    assert(got.nonEmpty && got.forall(_ % 2 == 0), s"odd ids served: ${got.toSeq}")
    // filter AND tombstone compose: erased evens disappear from the
    // filtered result too
    AnnIndex.takedown(spark, Seq(got.head).toDF("vec_id"), dir)
    val after = AnnIndex.search(spark, dir, q, nprobe = 2, limit = 40, p = p,
      allow = Some(even)).select($"vec_id").collect().map(_.getLong(0))
    assert(!after.contains(got.head) && after.forall(_ % 2 == 0))
  }
}
