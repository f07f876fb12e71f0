package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Pq

/** The native PQ/IVF kernels (graft_pq_score, graft_ivf_cell) must be
  * BIT-identical to the composable HOF forms they replace — same
  * left-to-right folds, same floor-based quantization including the
  * double→long→double hop, same (d2, id) argmin order. Row-for-row on
  * real data, so every DuckDB oracle downstream is provably
  * untouched by the swap. */
class PqExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"
  private val P = Pq.Params()

  private def emb = sources.Tables.load(spark, d, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))

  test("graft_pq_score == HOF scoredQ: code, ad2, ed2 row-for-row on real embeddings") {
    val qRow = emb.where(col("vec_id") === 0).select(col("ve").as("qv"))
    val embQ = emb.crossJoin(broadcast(qRow))
    val cb = Pq.codebookRow(emb, P)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("vec_id").collect().map(_.toSeq).toSeq
    val native = rows(Pq.scoredQ(embQ, cb, P))
    val hof = rows(Pq.scoredQHof(embQ, cb, P))
    assert(native.length == 499 && native == hof)
  }

  test("graft_pq_score == HOF scoredQ on the RESIDUAL corpus (IVFADC shape)") {
    val assigned = Pq.ivfAssigned(emb, 8)
      .select(col("vec_id"), zip_with(col("ve"), col("cv"), (x, c) => x - c).as("ve"))
    val qRow = assigned.where(col("vec_id") === 0).select(col("ve").as("qv"))
    val embQ = assigned.crossJoin(broadcast(qRow))
    val cb = Pq.codebookRow(assigned, P)
    val native = Pq.scoredQ(embQ, cb, P).orderBy("vec_id").collect().map(_.toSeq).toSeq
    val hof = Pq.scoredQHof(embQ, cb, P).orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(native == hof)
  }

  test("graft_ivf_cell == HOF assignment, seed and trained centroids") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell"), col("cv"))
        .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val seed = Pq.cellsRow(emb, 8)
    assert(rows(Pq.ivfAssignedWith(emb, seed)) == rows(Pq.ivfAssignedWithHof(emb, seed)))
    val trained = Pq.ivfLloydStep(emb, Pq.ivfLloydStep(emb, seed))
    assert(rows(Pq.ivfAssignedWith(emb, trained)) == rows(Pq.ivfAssignedWithHof(emb, trained)))
  }

  test("encode-only (NULL query) codes equal the scored path's code string") {
    val cb = Pq.codebookRow(emb, P)
    val enc = Pq.encoded(emb.where(col("vec_id") =!= 0), cb, P)
      .select(col("vec_id"),
        concat_ws(",", transform(col("codes"), c => c.cast("string"))).as("code"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val qRow = emb.where(col("vec_id") === 0).select(col("ve").as("qv"))
    val scored = Pq.scoredQ(emb.crossJoin(broadcast(qRow)), cb, P)
      .select(col("vec_id"), col("code"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(enc == scored)
  }

  test("graft_matvec == HOF rotation, bit-for-bit on real embeddings") {
    // a dense (non-permutation) orthogonal-ish matrix so every
    // multiply-add path is exercised; both forms accumulate j
    // left-to-right, so equality is BIT equality, not tolerance
    val rng = new scala.util.Random(13)
    val r = Array.fill(64, 64)(rng.nextGaussian() / 8.0)
    val native = Pq.rotatedBy(emb, r, P).orderBy("vec_id")
      .collect().map(row => row.getLong(0) -> row.getSeq[Double](1)).toSeq
    val hof = Pq.rotatedByHof(emb, r, P).orderBy("vec_id")
      .collect().map(row => row.getLong(0) -> row.getSeq[Double](1)).toSeq
    assert(native.length == 500 && native == hof)
    // keepOrig carries the unrotated vector unchanged
    val both = Pq.rotatedBy(emb, r, P, keepOrig = true).orderBy("vec_id")
    assert(both.columns.toSeq == Seq("vec_id", "xo", "ve"))
  }

  test("graft_matvec / graft_bfd_assign compile under CODEGEN_ONLY (full codegen, no fallback)") {
    // round-15 polish item: both kernels were CodegenFallback — every
    // row paid the interpreted-call wrapper around the tight JVM
    // loop. They now doGenCode into a static-kernel call; this pin
    // turns any regression back to fallback into a hard error.
    import spark.implicits._
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val id2 = Seq(1.0, 0.0, 0.0, 1.0)
      val mv = Seq((id2, Seq(3.0, 4.0))).toDF("rflat", "x")
        .select(call_function("graft_matvec", col("rflat"), col("x")).as("y"))
        .collect()(0).getSeq[Double](0)
      assert(mv == Seq(3.0, 4.0))
      val bfd = Seq(Seq((-5L, 1L, 5L), (-3L, 2L, 3L))).toDF("ds")
        .select(explode(call_function("graft_bfd_assign", col("ds"), lit(8L))).as("a"))
        .select(col("a.doc_id"), col("a.pack_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(bfd == Map(1L -> 0L, 2L -> 0L), bfd.toString)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("graft_matvec fails LOUDLY on a mis-dimensioned rotation") {
    import spark.implicits._
    // round-15 advice: a silent NULL on len(rflat) != len(x)^2 turns a
    // wrong-dim query vector into empty search results; the contract
    // is a thrown error (null stays reserved for null INPUTS)
    val e = intercept[Exception] {
      Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("rflat", "x")
        .select(call_function("graft_matvec", col("rflat"), col("x")))
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("graft_matvec"), rootMsg(e))
    // null inputs still yield null, not an error
    val nulls = Seq((null.asInstanceOf[Seq[Double]], Seq(1.0, 2.0)))
      .toDF("rflat", "x")
      .select(call_function("graft_matvec", col("rflat"), col("x")).as("y"))
      .collect()
    assert(nulls.length == 1 && nulls(0).isNullAt(0))
  }

  test("graft_bfd_assign: hand-checked fixture + oversized/empty edges") {
    import spark.implicits._
    // en/web fixture from TextPipelineSpec, as the raw kernel call:
    // sorted (negn, doc_id, n): d6=1200 oversized -> bin0 closes;
    // best-fit then packs {1,3} and {2,4,5}
    val got = Seq(Seq((-1200L, 6L, 1200L), (-700L, 1L, 700L), (-400L, 2L, 400L),
        (-300L, 3L, 300L), (-300L, 4L, 300L), (-200L, 5L, 200L)))
      .toDF("ds")
      .select(explode(call_function("graft_bfd_assign", col("ds"), lit(1024L))).as("a"))
      .select(col("a.doc_id"), col("a.pack_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(6L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 2L), got.toString)
    // empty shard -> empty assignment, not null
    val empty = Seq(Seq.empty[(Long, Long, Long)]).toDF("ds")
      .select(size(call_function("graft_bfd_assign", col("ds"), lit(1024L))).as("n"))
      .collect()(0).getInt(0)
    assert(empty == 0)
  }
}
