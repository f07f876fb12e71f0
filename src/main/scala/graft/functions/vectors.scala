package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns.
  *
  * All higher-order-function compositions accumulate in index order, so
  * results are bit-reproducible across engines (the DuckDB oracle sums
  * in the same order). Everything is cast to double before arithmetic:
  * float accumulation order would otherwise make cross-engine
  * comparison flaky.
  */
object vectors {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product `sum_i a_i * b_i`, left-to-right accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity `a.b / (|a| |b|)`. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket id over `nBits` pseudo-random
    * hyperplanes. Hyperplane k's d-th component is ±1 derived from the
    * first hex digit of `md5("k:d")` — deterministic, engine-agnostic,
    * and reproducible in the SQL oracle. Bucket bit k = [v . h_k > 0].
    *
    * At 100 TB this is the scale path for similarity search: buckets
    * partition the corpus so the pairwise-cosine join is confined to
    * same-bucket candidates instead of a full cross join.
    */
  def hyperplaneBucket(v: Column, nBits: Int, dim: Int): Column = {
    val bits = (0 until nBits).map { k =>
      // h_k . v with signs from md5 — stays a static literal vector:
      // the md5 calls are over literals, so Catalyst constant-folds them.
      val terms = (0 until dim).map { d =>
        val sign = when(
          substring(md5(lit(s"$k:$d")), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"),
          lit(1.0)).otherwise(lit(-1.0))
        element_at(v, d + 1).cast("double") * sign
      }
      val proj = terms.reduce(_ + _)
      when(proj > 0, lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
