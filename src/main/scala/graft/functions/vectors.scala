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

  /** Dot product `sum_i a_i * b_i`, left-to-right accumulation.
    * Native codegen'd expression (graft.expressions.DotProduct,
    * registered by GraftExtensions via Tables.conf); [[dotHof]] is the
    * built-in-only equivalent. Any numeric element type is accepted
    * and read directly, widening per element to double — no per-row
    * `cast(array<float> as array<double>)` copy on the hot path (and
    * ad-hoc `array(1, 2, 3)` int arrays work unchanged). */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Composable-builtins form of [[dot]] — identical semantics
    * (left-to-right fold, null on length mismatch or null element),
    * but the HOF lambdas evaluate interpreted. Kept for sessions
    * without GraftExtensions and as the test cross-check. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity `a.b / (|a| |b|)`; NULL (not an ANSI error) when
    * either vector has zero norm — e.g. an all-zero padded embedding.
    * Fused native expression: one array traversal for all three
    * accumulators (graft.expressions.CosineSim); [[cosineComposed]]
    * is the 3-pass builtin composition it is bit-identical to.
    * Float arrays are read directly, as in [[dot]]. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Composable 3-pass form of [[cosine]] — the test cross-check. */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Deterministic ±1 hyperplane components: hyperplane `k`'s `d`-th
    * component is +1 when the first hex digit of `md5("k:d")` is in
    * [0,8), else -1 — computed driver-side (java.security MD5 ==
    * Spark/DuckDB md5), so the plane is a plain constant. */
  def hyperplaneSigns(nBits: Int, dim: Int): IndexedSeq[IndexedSeq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nBits).map { k =>
      (0 until dim).map { d =>
        val hex = md.digest(s"$k:$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (hex.charAt(0) <= '7') 1.0 else -1.0
      }
    }
  }

  /** Random-hyperplane LSH bucket id over `nBits` deterministic
    * hyperplanes. Bucket bit k = [v . h_k > 0].
    *
    * At 100 TB this is the scale path for similarity search: buckets
    * partition the corpus so the pairwise-cosine join is confined to
    * same-bucket candidates instead of a full cross join.
    *
    * Each plane is ONE ArrayType literal (`typedlit`) and each
    * projection is ONE `aggregate(zip_with(...))` pass — constant
    * expression size per bit regardless of `dim`, so whole-stage
    * codegen survives real embedding widths (a per-component
    * CASE/when expansion would blow Janino's method limit at
    * dim >= 256 and fall back to interpreted execution).
    */
  def hyperplaneBucket(v: Column, nBits: Int, dim: Int): Column = {
    val signs = hyperplaneSigns(nBits, dim)
    val bits = (0 until nBits).map { k =>
      // one ArrayType literal per plane (not array(lit × dim)): same
      // folded constant, but the analyzer/optimizer walk ONE node
      // instead of dim children per plane per pass — planning cost,
      // re-paid on every action over a lineage containing this bucket
      val plane = typedlit(signs(k))
      val proj = dot(v, plane)
      when(proj > 0, lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
