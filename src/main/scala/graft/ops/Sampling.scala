package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.qround

/** Seeded weighted sampling without replacement — Efraimidis &
  * Spirakis 2006: key_i = -ln(u_i) / w_i with u_i ~ U(0,1); the k
  * SMALLEST keys are a weighted sample without replacement (a doc's
  * inclusion probability rises with its weight, exactly — this is
  * the one-pass, merge-friendly form of weighted reservoir
  * sampling). u_i derives from a seeded md5, so the draw is
  * worker-reproducible and oracle-replayable (the w4/n12 seeded-
  * determinism convention); keys are 1e-6-quantized before
  * comparison so both engines rank identical doubles, id tie-break.
  *
  * Scale shape: u and key are scan-stage; the draw is ONE bounded
  * `graft_bottom_k` aggregate — <= k rows of partial state per
  * partition and a single k-row merge, never an ORDER BY..LIMIT
  * corpus sort. The quality-weighted corpus subsampling step of a
  * curation pipeline at any corpus size.
  */
object Sampling {

  /** Uniform-in-(0,1) from the first 8 hex digits of a seeded md5 of
    * `id` — the same arithmetic the DuckDB oracle replays digit by
    * digit (no dialect-specific hex parsing). */
  private def seededUniform(idCol: Column, seed: String): Column = {
    val h = md5(concat(lit(s"$seed:"), idCol.cast("string")))
    def hexDigit(i: Int) = {
      val a = ascii(substring(h, i, 1)).cast("long")
      when(a >= 97, a - 87).otherwise(a - 48)
    }
    val v = (1 to 8).map(hexDigit).reduce((acc, dg) => acc * 16 + dg)
    (v.cast("double") + lit(0.5)) / lit(4294967296.0)
  }

  /** Draw `k` rows of `df` without replacement with probability
    * proportional to `weightCol` (must be strictly positive — add a
    * smoothing floor for zero-weight rows). Returns (rn, id, key)
    * in draw order. */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
                     k: Int, seed: String): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val key = qround(-log(seededUniform(idCol, seed)) / weightCol, 6)
    df.select(struct(key.as("k"), idCol.as("id")).as("_e"))
      .agg(call_function("graft_bottom_k", col("_e"), lit(k)).as("_top"))
      .select(posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select((col("_pos") + 1).cast("long").as("rn"),
        col("_t.id").as("id"), col("_t.k").as("key"))
  }
}
