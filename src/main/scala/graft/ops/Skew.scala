package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation salted join — the plan-level lever for hot join
  * keys the SURVEY's 100 TB design cites alongside AQE's runtime
  * skew-split.
  *
  * A plain shuffle equi-join sends every row of a hot key to ONE
  * reducer partition; with a handful of distinct keys (or a Zipfian
  * key) the whole join serializes onto a few tasks. Salting rewrites
  * the join to an equivalent one with `s`x the key cardinality:
  * the fact side gets a deterministic salt in [0, s) derived from one
  * of its own columns, the (small) dim side is replicated `s` ways,
  * and the join runs on (key, salt). Row-for-row the output is
  * IDENTICAL to the plain join — each fact row still matches exactly
  * its key's dim rows — but a hot key's rows now spread over `s`
  * reducer partitions.
  *
  * When to reach for it rather than alternatives:
  *  - dim small enough to broadcast -> broadcast, no salt needed;
  *  - skewed sort-merge join under AQE -> AQE splits it at runtime;
  *  - skewed SHUFFLE-HASH or pre-shuffle aggregation paths, or an
  *    engine/stage where AQE cannot re-plan -> salt explicitly.
  * The replicated dim costs `s`x its size in shuffle volume — keep
  * `s` near the executor-count / hot-partition ratio, not higher.
  */
object Skew {

  /** Join `fact` to `dim` on `keys`, salted `s` ways. `saltSrc` must
    * be a fact-side integral column (ideally unique or uniform — a
    * line number, a hash — so the salt spreads evenly); the salt is
    * `pmod(saltSrc, s)`, deterministic so retried tasks re-derive the
    * same salt. A NULL `saltSrc` value salts to 0 (coalesce) rather
    * than producing a NULL salt — which the inner equi-join would
    * silently eliminate, breaking the row-for-row contract above.
    * Output = the plain inner equi-join on `keys`, with fact-then-dim
    * columns and no salt column. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltSrc: Column, s: Int): DataFrame = {
    require(s >= 1, "salt fan-out must be >= 1")
    require(!(fact.columns ++ dim.columns).contains("_salt"),
      "_salt is a reserved working column")
    val saltedFact = fact.withColumn("_salt",
      coalesce(pmod(saltSrc.cast("int"), lit(s)), lit(0)))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until s).map(lit): _*)))
    saltedFact.join(saltedDim, keys :+ "_salt").drop("_salt")
  }
}
