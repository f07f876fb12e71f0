package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.vectors

/** Similarity search over the 64-dim `embeddings` table: brute-force
  * cosine top-k (the correctness baseline) and the LSH-bucketed
  * variant (the 100 TB scale path: the pairwise join is confined to
  * same-bucket candidates instead of a cross join).
  */
object SimilarityQueries {

  private val Dim = 64
  private val Bits = 8
  private val AnnBits = 4

  /** DuckDB twin of vectors.cosine on DOUBLE[] columns `a`,`b`. */
  private def cosSql(a: String, b: String) =
    s"""(list_sum(list_transform(range(1, ${Dim + 1}), i -> $a[i] * $b[i]))
       | / nullif(sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> $a[i] * $a[i])))
       |   * sqrt(list_sum(list_transform(range(1, ${Dim + 1}), i -> $b[i] * $b[i]))), 0e0))""".stripMargin

  /** DuckDB twin of vectors.hyperplaneBucket: the ±1 planes are the
    * same driver-computed constants, emitted as list literals. */
  private def bucketSql(v: String, nBits: Int = Bits): String = {
    val signs = vectors.hyperplaneSigns(nBits, Dim)
    val bits = (0 until nBits).map { k =>
      val plane = signs(k).map(x => if (x > 0) "1e0" else "-1e0").mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}), i -> $v[i] * ($plane)[i])) > 0e0 THEN ${1L << k} ELSE 0 END)"
    }
    s"CAST(${bits.mkString("\n    + ")} AS BIGINT)"
  }

  val all: Seq[Q] = Seq(

    // brute-force cosine top-k against the vec_id=0 query vector
    Q("e_cosine_topk",
      (s, d) => {
        val emb = T(s, d, "embeddings")
        val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
        emb.crossJoin(broadcast(q))
          .where(col("vec_id") =!= 0)
          .select(col("vec_id"),
            round(vectors.cosine(col("embedding"), col("qv")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id").asc)
          .limit(20)
      },
      Some(s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
              |SELECT vec_id, round(${cosSql("ve", "qv")}, 6) AS cos
              |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings WHERE vec_id <> 0), q
              |ORDER BY cos DESC, vec_id LIMIT 20""".stripMargin)),

    // LSH bucket histogram — validates the bucketing function itself
    Q("e_lsh_buckets",
      (s, d) => T(s, d, "embeddings")
        .select(vectors.hyperplaneBucket(col("embedding"), Bits, Dim).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")),
      Some(s"""SELECT ${bucketSql("ve")} AS bucket, count(*) AS n
              |FROM (SELECT CAST(embedding AS DOUBLE[]) AS ve FROM embeddings)
              |GROUP BY bucket""".stripMargin)),

    // bucketed ANN: candidates = the query vector's bucket only, then
    // exact cosine top-10 within it — the scale path end-to-end.
    // 4 bits here (16 buckets) so buckets hold enough candidates at
    // test scale; at corpus scale you'd raise bits to keep buckets
    // ~constant-sized.
    Q("e_ann_bucketed",
      (s, d) => {
        val emb = T(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"),
            vectors.hyperplaneBucket(col("embedding"), AnnBits, Dim).as("bucket"))
        val q = emb.where(col("vec_id") === 0)
          .select(col("embedding").as("qv"), col("bucket").as("qbucket"))
        emb.join(broadcast(q), col("bucket") === col("qbucket"))
          .where(col("vec_id") =!= 0)
          .select(col("vec_id"),
            round(vectors.cosine(col("embedding"), col("qv")), 6).as("cos"))
          .orderBy(col("cos").desc, col("vec_id").asc)
          .limit(10)
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
              |            ${bucketSql("CAST(embedding AS DOUBLE[])", AnnBits)} AS bucket
              |          FROM embeddings),
              |q AS (SELECT ve AS qv, bucket AS qbucket FROM e WHERE vec_id = 0)
              |SELECT vec_id, round(${cosSql("ve", "qv")}, 6) AS cos
              |FROM e, q WHERE bucket = qbucket AND vec_id <> 0
              |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),
  )
}
