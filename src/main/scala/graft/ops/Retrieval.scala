package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.{qlong, qround}

/** Retrieval scoring — the lexical half of a RAG/search stack over a
  * document lake, paired with the vector half the `e_*` queries
  * already serve. Two pieces:
  *
  *  - [[bm25Scores]]: Okapi BM25 (Robertson & Spärck Jones; the
  *    k1/b form in Robertson & Zaragoza 2009 §3.3) of every document
  *    against a FIXED term set. Scale shape: corpus work is confined
  *    to the query's terms in the scan stage (a `terms`-literal
  *    filter before any aggregation), the per-term document
  *    frequencies and the corpus length stats are term-count-sized
  *    aggregates broadcast back, and scoring is one scan-stage
  *    expression — no corpus-keyed shuffle other than the per-doc tf
  *    re-agg of the MATCHING rows.
  *  - [[rrfFuse]]: reciprocal-rank fusion (Cormack et al. 2009) of
  *    two ranked lists — the standard hybrid-search combiner: score =
  *    Σ 1/(k + rank), summed over the lists that contain the id.
  *    Rank-based, so the lexical and vector score scales never need
  *    calibrating against each other.
  *
  * Determinism discipline (the t_lm_score convention): the one
  * transcendental (idf's ln) is quantized per TERM via qlong(·, 1e6),
  * every other operand is exact-integer-derived with a fixed
  * association order, and final scores are qround(·, 6) — so a DuckDB
  * oracle replays bit-identical hashes.
  */
object Retrieval {

  /** (id, dl, tf-per-term rows) → one BM25 score row per document
    * that matches at least one term (docs matching none score 0 and
    * are omitted — callers wanting them add a left join). Returns
    * (id, score) with score already qround(·, 6).
    *
    * idf uses the +1 form ln(1 + (N - df + 0.5)/(df + 0.5)) — always
    * positive, the Lucene choice. */
  def bm25Scores(docs: DataFrame, textCol: Column, idCol: Column,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val toks = docs.select(idCol.as("_id"), split(textCol, " ").as("tk"))
      .select(col("_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("t"))
    // corpus stats: N and Σdl — one tiny agg off the per-doc lengths
    val stats = docs.select(idCol.as("_id"), size(split(textCol, " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("nd"), sum(col("dl")).as("sumdl"))
    // term-confined scan: only query-term rows survive into the aggs
    val hits = toks.where(col("t").isin(terms.map(lit): _*))
    val tf = hits.groupBy(col("_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    // df per term + the quantized idf (ln runs |terms| times, never
    // per corpus row — the t_lm_score precompute convention)
    val idf = hits.select(col("_id"), col("t")).distinct()
      .groupBy(col("t")).agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(stats))
      .select(col("t"),
        qlong(log(lit(1.0) + (col("nd").cast("double") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))), 1e6).as("idf_q"))
    // per-term score with a FIXED association order, mirrored
    // verbatim by the oracle —
    //   idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/sumdl))
    // — then quantized to 1e-6 BEFORE the per-doc sum, so the sum is
    // exact-integer (reassociation across partitions cannot move it)
    val perTerm = tf.join(broadcast(idf), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col("_id"),
        qlong((col("idf_q").cast("double") / lit(1e6)) * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") * col("nd").cast("double") / col("sumdl").cast("double"))),
          1e6).as("s_q"))
    perTerm.groupBy(col("_id"))
      .agg((sum(col("s_q")).cast("double") / lit(1e6)).as("score"))
      .select(col("_id").as("id"), col("score"))
  }

  /** Reciprocal-rank fusion of two ranked lists `a`, `b` — each
    * (id, rank) with rank 1-based — into (id, rrf, rank_a, rank_b),
    * rrf = Σ 1/(k + rank) over the lists containing the id
    * (qround(·, 6)), absent ranks reported as 0. Full outer join on
    * id: both lists are top-k-sized, so the join is trivially small
    * at any corpus scale — fusion cost never touches the lake. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 60): DataFrame = {
    val aa = a.select(col("id"), col("rank").as("rank_a"))
    val bb = b.select(col("id"), col("rank").as("rank_b"))
    aa.join(bb, Seq("id"), "full_outer")
      .select(col("id"),
        qround(
          coalesce(lit(1.0) / (lit(k) + col("rank_a")).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k) + col("rank_b")).cast("double"), lit(0.0)), 6)
          .as("rrf"),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"))
  }
}
