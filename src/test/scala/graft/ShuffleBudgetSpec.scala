package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-VOLUME regression budgets on the flagship pipelines.
  *
  * PlanSpec pins plan SHAPES and Bench pins wall-time, but an
  * exchange-volume regression (a filter that stopped pushing below a
  * shuffle, a projection that widened shuffled rows, a broadcast that
  * silently became a shuffle) surfaces only as noisy wall-time drift —
  * the recurring cross-round diagnosis burden SCALE.md documents. This
  * spec reads the populated SQLMetrics straight off the executed plan
  * (synchronous — no listener-bus race): total `shuffleBytesWritten`
  * (actual bytes moved) over every ShuffleExchange, compared against
  * a ceiling a few x the measured sf0.01 value (recorded in SCALE.md
  * shuffle-budget section) so shared-box noise can't flake it but an
  * order-of-magnitude volume regression fails loudly. Broadcasts get
  * a per-node dataSize guard instead of a tight total: AQE
  * legitimately promotes medium shuffle sides to broadcast at sf0.01
  * runtime stats (e.g. pipe_submit's ~10k-row starts relation — a
  * choice it would NOT make against 100 TB stats), so the broadcast
  * assertion only catches the catastrophic case of a fact-sized
  * relation being hashed onto the driver. Reused exchanges count
  * once — they execute once.
  */
class ShuffleBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  /** All physical nodes reachable through AQE wrappers (the final
    * adaptive plan, materialized query stages) without double-counting
    * exchange reuse. */
  private def walk(p: SparkPlan, seen: java.util.IdentityHashMap[SparkPlan, Unit]): Seq[SparkPlan] = {
    if (seen.containsKey(p)) Seq.empty
    else {
      seen.put(p, ())
      val below = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, seen)
        case q: QueryStageExec => walk(q.plan, seen)
        case r: ReusedExchangeExec => walk(r.child, seen)
        case other => other.children.flatMap(walk(_, seen))
      }
      p +: below
    }
  }

  private def metric(p: SparkPlan, key: String): Long =
    p.metrics.get(key).map(_.value).getOrElse(0L)

  /** (shuffle exchange count, total shuffle bytes written, largest
    * single broadcast dataSize) after a full execution of the named
    * query at sf0.01. */
  private def volumes(name: String): (Int, Long, Long) = {
    val df: DataFrame = SparkEntry.allQueries.find(_.name == name).get.fn(spark, sfDir)
    df.collect() // execute THIS QueryExecution (df.write would spawn its own)
    val nodes = walk(df.queryExecution.executedPlan,
      new java.util.IdentityHashMap[SparkPlan, Unit])
    val perShuffle = nodes.collect { case s: ShuffleExchangeLike =>
      metric(s, "shuffleBytesWritten")
    }
    val maxBroadcast = (0L +: nodes.collect { case b: BroadcastExchangeLike =>
      metric(b, "dataSize")
    }).max
    (perShuffle.length, perShuffle.sum, maxBroadcast)
  }

  // a fact-sized relation hashed onto the driver is the failure mode;
  // AQE's legitimate medium-side promotions stay far under this
  private val BroadcastGuard = 96L << 20

  /** `minShuffleNodes` separates the two zero-bytes causes: a plan
    * that still HAS exchanges but reports 0 bytes is broken metric
    * wiring; a plan whose exchanges disappeared entirely (AQE
    * broadcast promotion, or a rewrite to a scan-stage form) is a
    * plan-shape change that should be re-baselined, not misdiagnosed
    * as wiring. Zero-shuffle-by-construction queries pass 0. */
  private def assertBudget(name: String, shuffleCeiling: Long,
                           minShuffleNodes: Int = 1): Unit = {
    val (nSh, sh, bc) = volumes(name)
    info(s"$name: shuffles=$nSh, volume=${sh / 1024} KiB " +
      s"(ceiling ${shuffleCeiling / 1024} KiB), " +
      s"largest broadcast=${bc / 1024} KiB (guard ${BroadcastGuard / 1024} KiB)")
    assert(nSh >= minShuffleNodes,
      s"$name executed with $nSh shuffle exchanges, expected >= $minShuffleNodes — " +
        "the plan shape changed (AQE promotion or a rewrite); re-baseline this budget")
    if (nSh > 0)
      assert(sh > 0L,
        s"$name has $nSh shuffle exchanges but zero shuffleBytesWritten — metric wiring broke")
    assert(sh <= shuffleCeiling,
      s"$name shuffled $sh bytes, over the $shuffleCeiling ceiling — " +
        "an exchange started carrying more than the plan needs")
    assert(bc <= BroadcastGuard,
      s"$name built a $bc-byte broadcast relation — " +
        "a join side that must stay distributed is being hashed onto the driver")
  }

  test("pipe_submit_e2e: shuffle volume stays inside its sf0.01 budget") {
    assertBudget("pipe_submit_e2e", shuffleCeiling = 4L << 20) // measured ~300 KiB
  }

  test("pipe_scrub_e2e: shuffle volume stays inside its sf0.01 budget") {
    assertBudget("pipe_scrub_e2e", shuffleCeiling = 4L << 20) // measured ~250 KiB
  }

  test("d_rescored_keep: shuffle volume stays inside its sf0.01 budget") {
    assertBudget("d_rescored_keep", shuffleCeiling = 1L << 20) // measured ~10 KiB
  }

  test("pipe_rag_e2e: curation + hybrid serve stays inside its sf0.01 budget") {
    // the crawl-curation stages dominate (the pipe_scrub_e2e class);
    // the retrieval legs add only term-stat partials, two top-20
    // gathers, and the 40-row fusion — a corpus-volume exchange
    // anywhere in the serve path (e.g. an allow-list distinct, a
    // global sort instead of TakeOrdered) blows this ceiling
    assertBudget("pipe_rag_e2e", shuffleCeiling = 8L << 20)
  }

  // The similarity family is where a silent corpus-volume exchange
  // crept in before (the r11 IVF coarse-assign crossJoin+min_by, fixed
  // to the scan-stage broadcast-row argmin): a byte ceiling here would
  // have caught it automatically — the old plan shuffled ~2x corpus
  // volume (vector + centroid payloads per row), orders of magnitude
  // over these ceilings.

  test("e_ivfpq_adc: the corpus never shuffles — only bounded codebook/query aggregates") {
    // scan-stage assign/encode/ADC + TakeOrderedAndProject: the only
    // exchanges are the corpus-size-INDEPENDENT centroid/codebook
    // aggregate partials (measured 8 KiB over 2 exchanges at sf0.01)
    assertBudget("e_ivfpq_adc", shuffleCeiling = 64L << 10, minShuffleNodes = 0)
  }

  test("e_ivf_train: only the K-group re-mean shuffle remains") {
    // groupBy(cell) re-mean over K*64 partial rows, never corpus-sized
    // (measured 10 KiB over 2 exchanges at sf0.01)
    assertBudget("e_ivf_train", shuffleCeiling = 1L << 20)
  }

  test("e_ivfpq_indexed: probe-cell search off the persisted index stays zero-shuffle") {
    assertBudget("e_ivfpq_indexed", shuffleCeiling = 64L << 10, minShuffleNodes = 0)
  }

  test("e_kmeans_train: two Lloyd iterations shuffle only centroid-group partials") {
    // per iteration: one K*dim-group map-side-combined agg + the
    // centroid-row folds — corpus-size-independent by construction
    assertBudget("e_kmeans_train", shuffleCeiling = 1L << 20)
  }

  test("e_cluster_sample: the balanced draw shuffles <= K x partitions x n sample rows") {
    assertBudget("e_cluster_sample", shuffleCeiling = 1L << 20)
  }

  test("pipe_curate_e2e: training + assignment + id join + draw stay inside budget") {
    // the only data-proportional exchange is the doc_id equi-join of
    // the (doc_id, cell) assignment to the quality-gated doc stats —
    // ~2 small columns per surviving doc; everything else is
    // centroid-sized or bounded bottom-k partials
    assertBudget("pipe_curate_e2e", shuffleCeiling = 2L << 20)
  }

  test("e_sq8_adc: only the one-row range fold exchanges — the corpus never shuffles") {
    // 64 mins + 64 maxs of per-partition partials collapsing to a
    // single row; encode + dequantized ADC ride the scan stage
    assertBudget("e_sq8_adc", shuffleCeiling = 256L << 10, minShuffleNodes = 0)
  }

  test("d_delta_index_keep: only delta-bounded exchanges shuffle — the store never does") {
    // delta fingerprints, delta bucket keys, near ids (all
    // crawl-batch-sized) plus the density-capped bucket gather, whose
    // graft_bottom_k partials are O(cap) per (touched bucket,
    // partition) — the fp/bands store scans stream through broadcast
    // hash joins and never exchange full buckets
    assertBudget("d_delta_index_keep", shuffleCeiling = 1L << 20)
  }

  test("pipe_tokenize_e2e: the tokenize flagship stays inside its sf0.01 budget") {
    // exchanges: fingerprint-keyed dedup, the corpus word explode agg
    // feeding the dict chain, the doc-keyed encode re-agg, the
    // (lang, source) pack window — all keyed, none carrying text
    // payloads beyond the dedup exchange
    // measured 10 KiB over 2 exchanges at sf0.01 (AQE broadcasts the
    // keeper join at these stats)
    assertBudget("pipe_tokenize_e2e", shuffleCeiling = 1L << 20)
  }

  test("t_bpe_encode_ids: the id-sequence exchange carries int triples, never text") {
    // exchanges: the word-dict corpus pass + per-iteration pair aggs
    // (vocab-bounded strings) and the ONE doc-keyed re-agg whose rows
    // are (doc_id, wpos, tpos, tok_id) ints — the output's own volume.
    // A text/token-string payload regression would blow this ceiling
    // ~10x (the corpus is ~2.7 MB of text at sf0.01)
    assertBudget("t_bpe_encode_ids", shuffleCeiling = 3L << 20)
  }

  test("pipe_ids_e2e: the id flagship's exchanges stay id-sized") {
    // exchanges: ONE fingerprint-keyed dedup exchange (the only text
    // payload), the dict chain's dictionary-space aggs, the doc-keyed
    // id re-agg (int triples), and the (lang,source) pack shard —
    // the output's own volume. The model gate adds ZERO exchanges
    // (driver-held literal weights)
    assertBudget("pipe_ids_e2e", shuffleCeiling = 8L << 20)
  }

  test("t_unigram_encode_ids: the id exchange carries int triples, never text") {
    // exchanges: the corpus word-dict pass + dictionary-space piece
    // aggs (EM rounds), then the ONE doc-keyed re-agg of
    // (doc_id, wpos, tpos, tok_id) ints — the t_bpe_encode_ids
    // contract for the unigram half
    assertBudget("t_unigram_encode_ids", shuffleCeiling = 3L << 20)
  }

  test("t_quality_filter: serving shuffles NOTHING") {
    // training collects p=4 gradient rows driver-side at plan
    // construction; the served frame is scan+filter+project with
    // literal weights — zero exchanges by contract (PlanSpec pins
    // the shape; this pins the bytes)
    assertBudget("t_quality_filter", shuffleCeiling = 1L, minShuffleNodes = 0)
  }

  test("t_line_dedup_indexed: every exchange is batch-bounded — the line store never shuffles") {
    // batch line profile + the semi-joined store sums + the per-doc
    // cut re-agg; the store side streams through the broadcast
    // semi-join in its scan stage
    assertBudget("t_line_dedup_indexed", shuffleCeiling = 1L << 20)
  }

  test("t_html_extract: extraction is pure scan-stage work — zero exchanges") {
    // the crawl front door must never shuffle: wrap + kernel + length
    // all ride the parquet scan's WholeStageCodegen span
    assertBudget("t_html_extract", shuffleCeiling = 1L, minShuffleNodes = 0)
  }

  test("t_pack_ids: pack exchanges carry id payloads, never corpus text") {
    // exchanges: the training chain's dict/pair aggs, the id re-agg
    // (int triples), and the (lang,source) shard exchange whose rows
    // are (doc_id, token_ids) — the output's own volume. A text
    // payload regression would blow this ~10x
    assertBudget("t_pack_ids", shuffleCeiling = 6L << 20)
  }

  test("e_rand_proj: the projected corpus never shuffles — query broadcast only") {
    // 16-plane JL projection + distances ride the scan stage; top-10
    // is TakeOrderedAndProject — zero shuffle by construction
    assertBudget("e_rand_proj", shuffleCeiling = 64L << 10, minShuffleNodes = 0)
  }

  test("t_substr_scrub: gram-keyed + doc-keyed exchanges bounded by gram volume") {
    // the gram-keyed occurrence gather IS proportional to corpus gram
    // volume (that is the operator's honest cost — Lee et al. exact
    // substring dedup cannot avoid touching every gram once); the
    // ceiling pins that it stays ~one row of (doc_id, pos) per gram
    // and never widens to carrying text payloads through the shuffle
    // (measured 1 MiB over 2 exchanges at sf0.01)
    assertBudget("t_substr_scrub", shuffleCeiling = 4L << 20)
  }

  test("t_pack_ids_bfd: the assignment exchange carries (n, doc) int pairs, never ids") {
    // the metrics query persists its deterministic slice
    // (graft.Caches-owned), and the training-chain + slice exchanges
    // execute inside the InMemoryRelation's own adaptive plan — not
    // reachable from this walk. The visible top-level plan is the
    // three packer arms over the cached slice; AQE promotes their
    // tiny sf0.01 sides to broadcast, so no minimum-shuffle floor
    // applies here. The broadcast guard still catches the
    // catastrophic case; the full-corpus BFD volume budget lives on
    // t_pack_bfd_rows below (no persists — every exchange visible).
    assertBudget("t_pack_ids_bfd", shuffleCeiling = 8L << 20, minShuffleNodes = 0)
  }

  test("t_pack_bfd_rows: pack content rides the doc-keyed join at output volume") {
    assertBudget("t_pack_bfd_rows", shuffleCeiling = 8L << 20)
  }

  test("t_bpe_export_roundtrip: the replay encode shuffles the word dict, never text") {
    // exchanges: ONE corpus word-dict distinct (the replay input) and
    // the doc-keyed id re-agg (int triples); the merge replay itself
    // is scan-stage — zero joins. Export is marker-skipped on the
    // repeat run this spec measures... the FIRST run in a fresh
    // session may include the training chain's dict aggs, so the
    // ceiling allows them
    assertBudget("t_bpe_export_roundtrip", shuffleCeiling = 6L << 20)
  }

  // e_opq_refined gets no budget row: its returned frame is the
  // driver-assembled boolean table — the refinement's exchanges run
  // in their own jobs at query-construction time, invisible to this
  // executed-plan probe. Its model-sized-exchange claim is covered
  // structurally instead: every shuffle in opqRefine is a groupBy
  // over <= m*ks*sub or dim groups (source-visible), and the pinned
  // deterministic qerr trajectories in ApproxSpec would move if the
  // integer-snapped aggregation paths changed.
}
