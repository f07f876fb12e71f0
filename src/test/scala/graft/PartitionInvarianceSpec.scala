package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must not depend on the physical partitioning — the property
  * that makes the sf0.01 oracle hashes transfer to a 1000-executor
  * cluster. Runs representative queries under a deliberately odd
  * shuffle-partition count and compares row sets against the default. */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  // one per family: join+agg, quantized single-pass agg, LSH banding,
  // window rank rewrite, as-of join — plus the round-12 iteration
  // chains, where a float re-mean would be the classic partition-
  // order leak (the exact integer-space sums are what make the
  // chained Lloyd steps and the bounded bottom-k draw invariant)
  // session-3 additions: the persisted dedup store (set-valued probe
  // results must not depend on how the store files were written or
  // read), SQ8 (min/max fold + floor-quantized codes), containment
  // (candidate-confined set intersections), interval join
  // session-4 additions: the BPE merge chain (a tie in the weighted
  // pair counts resolved differently per partitioning would cascade
  // through every later iteration — the (cnt DESC, pair ASC) total
  // order is what makes it invariant), the span scrub (bottom-k
  // gather + coverage sets), the rollup data card (keeper = min
  // doc_id per fingerprint), and the JL projection top-10
  private val probes = Seq("j3_equi_join_agg", "a3_gram_matrix", "d_lsh_pairs",
    "o3_rank_family", "j7_asof_join",
    "e_kmeans_train", "e_cluster_sample", "e_ivfpq_trained", "pipe_curate_e2e",
    "d_delta_index_keep", "d_delta_index_appended", "e_sq8_adc",
    "d_containment_pairs", "j9_interval_join",
    "t_bpe_train", "t_bpe_encode", "t_substr_scrub", "t_datacard",
    "e_rand_proj", "t_source_overlap", "pipe_tokenize_e2e", "w9_interp_fill", "w7b_session_window", "a9_zscore_outliers",
    // round-15 additions: the id string surfaces are ordered
    // collect_list folds (array_sort inside the agg is the
    // invariance mechanism), BFD assignment sorts (n DESC, doc ASC)
    // before its fold, the artifact round-trips replay a fixed merge
    // list per word, the batched trainer must resolve pair-count
    // ties identically at any partitioning, and the foreign unigram
    // DP breaks ties on the (cost, np, seg) total order
    "t_bpe_encode_ids", "t_pack_ids", "t_pack_ids_bfd", "t_pack_bfd_rows",
    "t_bpe_export_roundtrip", "t_bpe_train_batched", "t_bpe_foreign_vocab",
    "t_unigram_foreign_vocab", "pipe_ids_e2e")

  private def rows(name: String): Set[Seq[Any]] = {
    val q = SparkEntry.allQueries.find(_.name == name).get
    val out = q.fn(spark, d).collect().map(_.toSeq.map {
      case ts: java.sql.Timestamp => ts.getTime
      case x => x
    }.toSeq).toSet
    spark.catalog.clearCache()
    out
  }

  test("row sets identical under shuffle.partitions = 7 vs default") {
    val default = spark.conf.get("spark.sql.shuffle.partitions")
    val baseline = probes.map(n => n -> rows(n)).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      for (n <- probes) assert(rows(n) == baseline(n), s"$n changed under 7 partitions")
    } finally spark.conf.set("spark.sql.shuffle.partitions", default)
  }
}
