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
}
