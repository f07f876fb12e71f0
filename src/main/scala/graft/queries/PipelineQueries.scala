package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.scalars
import graft.ops.{Raster, Sequences}

/** The flagship submit pipeline as ONE composed graded query —
  * the reference's end-to-end path (weather4cast/main.py:226-262 →
  * datasets.py:397-459): catalog scan → S4 priority dedup → P5 valid
  * starts → J2 sequence assembly → J1 broadcast static-dim join →
  * N1 min-max decode + P3 fill→NULL → A1 conditional mean imputation
  * (all-fill → 0.0) → N6/N7 sigmoid-member blend → N2/S2 uint16
  * encode → S8 sink-shaped packed frame (the Raster codec's hex
  * blob, one row per assembled sequence).
  *
  * Every stage is an operator already graded solo; this proves the
  * COMPOSITION — one Catalyst plan from scan to sink-shaped frame.
  * Plan shape at scale: dedup + valid-starts + assembly are key
  * shuffles on (user, bucket); the dim join broadcasts; impute rides
  * one (user, t0) window exchange that the final pack-aggregation
  * reuses. No cartesian, no collect, no UDF.
  */
object PipelineQueries {

  private val Step = 3600L // hourly buckets
  private val L = 3        // sequence length

  val all: Seq[Q] = Seq(

    Q("pipe_submit_e2e",
      (s, d) => {
        // S1 catalog scan + bucketize
        val ev = T(s, d, "events").select(col("user_id"),
          Sequences.tsBucket(col("ts"), Step).as("bkt"),
          col("value"), col("event_type"), col("event_id"))
        // S4: per (user, bucket) keep the best-priority event
        val pri = when(col("event_type") === "purchase", 0)
          .when(col("event_type") === "signup", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "view", 3)
          .otherwise(4)
        val dedup = Sequences.priorityDedup(ev, Seq("user_id", "bkt"), pri, col("event_id"))
        // P5: valid starts from the RAW bucket grid, not the deduped
        // rows — the bucket set is identical (dedup keeps one row per
        // existing bucket), and deriving it upstream lets this branch
        // prune to 2 columns and skip the dedup window entirely
        // (plan-audited: saves a whole window+exchange recompute)
        val starts = Sequences.validStarts(
          ev.select(col("user_id"), col("bkt")), "user_id", "bkt", L)
        // J2: assemble [t0, t0+L) per start
        val asm = Sequences.assemble(starts, dedup, "user_id", "bkt", L)
        // J1: broadcast static dim (left: keep users without a dim row)
        val dim = T(s, d, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
        val joined = asm.join(broadcast(dim), Seq("user_id"), "left")
          .withColumn("segment", coalesce(col("seg"), lit("NONE")))
        // N1 decode + P3 fill→NULL ('error' events are the fill mask)
        val dv = when(col("event_type") === "error", lit(null))
          .otherwise(scalars.minmaxDecode(col("value"), 0.0, 200.0))
        // A1: conditional mean impute over the sequence, all-fill → 0.0
        val w = Window.partitionBy("user_id", "t0")
        val withDv = joined.withColumn("dv", dv)
        val cnt = sum(when(col("dv").isNotNull, 1).otherwise(0)).over(w)
        val sumc = sum(when(col("dv").isNotNull, qlong(col("dv"), 100000.0))).over(w)
        val mean = when(cnt > 0, sumc / (lit(100000.0) * cnt))
        val imputed = withDv.withColumn("iv",
          when(col("dv").isNull, coalesce(mean, lit(0.0))).otherwise(col("dv")))
        // N6/N7: blend the imputed member with its sigmoid-activated twin
        val m2 = scalars.sigmoid((col("iv") * lit(4.0)) - lit(2.0))
        val blended = imputed.withColumn("bv", scalars.blend(Seq((col("iv"), 0.7), (m2, 0.3))))
        // N2/S2: uint16 encode (invScale 2^15 — exact binary fraction)
        val coded = blended.withColumn("code", Raster.encodeU16(col("bv"), 32768.0, lit(false)))
        // S8: sink-shaped pack — one ordered hex frame per sequence
        coded.groupBy(col("user_id"), col("t0"), col("segment"))
          .agg(count(lit(1)).as("n_steps"),
            hex(Raster.packOrdered(col("step"), Raster.cellHex(col("code")))).as("frame_hex"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, CAST(floor(epoch(ts) / $Step) AS BIGINT) AS bkt,
              |         value, event_type, event_id
              |  FROM events),
              |dd AS (SELECT user_id, bkt, value, event_type FROM (
              |    SELECT *, row_number() OVER (PARTITION BY user_id, bkt
              |      ORDER BY CASE event_type WHEN 'purchase' THEN 0 WHEN 'signup' THEN 1
              |        WHEN 'click' THEN 2 WHEN 'view' THEN 3 ELSE 4 END, event_id) AS rn
              |    FROM ev) WHERE rn = 1),
              |st AS (SELECT user_id, bkt AS t0 FROM (
              |    SELECT user_id, bkt, lead(bkt, ${L - 1}) OVER (PARTITION BY user_id ORDER BY bkt) AS l
              |    FROM dd)
              |  WHERE l = bkt + ${L - 1}),
              |asm AS (
              |  SELECT st.user_id, st.t0, o.step, dd.value, dd.event_type
              |  FROM st, (SELECT unnest([0, 1, 2]) AS step) o
              |  JOIN dd ON dd.user_id = st.user_id AND dd.bkt = st.t0 + o.step),
              |dimj AS (
              |  SELECT a.*, coalesce(c.c_mktsegment, 'NONE') AS segment
              |  FROM asm a LEFT JOIN customer c ON c.c_custkey = a.user_id),
              |dec AS (SELECT user_id, t0, step, segment,
              |    CASE WHEN event_type = 'error' THEN NULL
              |         ELSE (value - 0e0) * 0.005e0 END AS dv FROM dimj),
              |imp AS (SELECT user_id, t0, step, segment,
              |    CASE WHEN dv IS NULL THEN
              |      coalesce(CASE WHEN cnt > 0 THEN CAST(sumc AS BIGINT) / (100000.0e0 * cnt) END, 0e0)
              |    ELSE dv END AS iv
              |  FROM (SELECT *,
              |      sum(CASE WHEN dv IS NOT NULL THEN 1 ELSE 0 END)
              |        OVER (PARTITION BY user_id, t0) AS cnt,
              |      sum(CASE WHEN dv IS NOT NULL THEN CAST(floor(dv * 100000 + 0.5e0) AS BIGINT) END)
              |        OVER (PARTITION BY user_id, t0) AS sumc
              |    FROM dec)),
              |bl AS (SELECT user_id, t0, step, segment,
              |    (iv * 0.7e0) + ((1e0 / (1e0 + exp(-((iv * 4e0) - 2e0)))) * 0.3e0) AS bv FROM imp),
              |enc AS (SELECT user_id, t0, step, segment,
              |    least(65534, greatest(0, CAST(floor(bv * 32768e0 + 0.5e0) AS BIGINT))) AS code FROM bl)
              |SELECT user_id, t0, segment, count(*) AS n_steps,
              |  string_agg(lpad(upper(to_hex(code)), 4, '0'), '' ORDER BY step) AS frame_hex
              |FROM enc GROUP BY user_id, t0, segment""".stripMargin)),

    // The CURATION flagship — the LLM-data-pipeline composition the
    // similarity/text families exist for, as ONE Catalyst plan:
    // k-means the embedding corpus (2 chained Lloyd iterations,
    // centroid-sized shuffles), assign every document's embedding to
    // its trained semantic cluster, gate on the graded quality score,
    // and draw the top-5 HIGHEST-QUALITY docs per cluster as a
    // bounded graft_bottom_k aggregate — the SemDeDup/DsDm-style
    // "cluster, then balance the mix" recipe. Plan shape at scale:
    // training folds to broadcast rows, assignment is scan-stage, the
    // doc join is ONE id-keyed equi-shuffle (bucket/co-locate at
    // 100 TB), and the draw's partial state is <= 5 rows per (cell,
    // partition) — the corpus is never sorted or windowed. Every
    // stage is graded solo (e_kmeans_train, t_quality_score,
    // e_cluster_sample); this pins the composition.
    Q("pipe_curate_e2e",
      (s, d) => {
        val emb = T(s, d, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))
        val c2 = graft.ops.Pq.ivfLloydStep(emb,
          graft.ops.Pq.ivfLloydStep(emb, graft.ops.Pq.cellsRow(emb, 8)))
        val assigned = graft.ops.Pq.ivfAssignedWith(emb, c2)
          .select(col("vec_id").as("doc_id"), col("cell"))
        val gated = T(s, d, "documents")
          .select(col("doc_id"),
            graft.functions.text.qualityScore(col("text")).as("quality"),
            col("n_chars"))
          .where(col("quality") >= 0.5)
        assigned.join(gated, "doc_id")
          .groupBy(col("cell"))
          .agg(call_function("graft_bottom_k",
            struct(negate(col("quality")).as("nq"), col("doc_id").as("doc_id"),
              col("n_chars").as("n_chars")), lit(5)).as("_top"))
          .select(col("cell").cast("long").as("cid"),
            posexplode(col("_top")).as(Seq("_pos", "_t")))
          .select(col("cid"), (col("_pos") + 1).cast("long").as("rn"),
            col("_t.doc_id").as("doc_id"),
            negate(col("_t.nq")).as("quality"),
            col("_t.n_chars").as("n_chars"))
      },
      Some(s"""${SimilarityQueries.kmeansCtes(2)},
              |af AS (${SimilarityQueries.kmeansAssignSql(2)}),
              |dq AS (SELECT doc_id, ${TextQueries.qualitySql} AS quality, n_chars
              |       FROM documents),
              |j AS (SELECT af.cell, dq.doc_id, dq.quality, dq.n_chars
              |      FROM af JOIN dq ON dq.doc_id = af.vec_id
              |      WHERE dq.quality >= 0.5e0)
              |SELECT cid, rn, doc_id, quality, n_chars FROM (
              |  SELECT CAST(cell AS BIGINT) AS cid, doc_id, quality, n_chars,
              |    CAST(row_number() OVER (PARTITION BY cell
              |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rn
              |  FROM j) WHERE rn <= 5""".stripMargin)),

    // FLAGSHIP 4 — the TOKENIZE pipeline: what a preprocessing run
    // executes between raw crawl and training batches, as ONE graded
    // composition: quality floor -> exact dedup (min-id keeper) ->
    // BPE training ON THE KEPT CORPUS (2 merge iterations, dictionary
    // -space — the dict derives from the same plan's scrub output) ->
    // encode every kept doc with the freshly trained dict -> greedy
    // sequence packing by BPE-token budget per (lang, source) shard.
    // Every stage is graded solo (t_quality_score, t_exact_dedup,
    // t_bpe_train, t_bpe_encode, t_pack_sequences); the composition
    // proves they chain: the oracle splices the scrub CTEs into the
    // BPE chain's word source and the pack window on top. Scale
    // shape: one fingerprint-keyed exchange (dedup), one corpus word
    // explode feeding the vocab-sized dict chain, one broadcast dict
    // join back, one (lang, source) window for the pack cum-sum — the
    // corpus text itself crosses the wire only in the dedup exchange.
    Q("pipe_tokenize_e2e",
      (s, d) => {
        val docs = graft.sources.Tables.load(s, d, "documents")
        val scored = docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
            graft.functions.text.qualityScore(col("text")).as("q"),
            graft.functions.text.fingerprint(col("text")).as("fp"))
          .where(col("q") >= 0.5)
        val keep = scored.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
        // feeds the dict chain, the encode, and the pack —
        // checkpointed (r20): each consumer re-analyzed the
        // scrub+dedup lineage per action under a plain persist;
        // harness-owned release (graft.Caches)
        val kept = graft.Caches.checkpointed(scored.join(keep, Seq("fp"))
          .where(col("doc_id") === col("keeper"))
          .select(col("doc_id"), col("text"), col("lang"), col("source")))
        val dict = graft.ops.Bpe.trainedDictFull(kept, col("text"), iters = 2)
        val enc = graft.ops.Bpe.encode(kept, col("text"), col("doc_id"), dict.result)
        val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        kept.select(col("doc_id"), col("lang"), col("source"))
          .join(enc.select(col("doc_id"), col("n_bpe_tokens")), Seq("doc_id"))
          .withColumn("cum", sum(col("n_bpe_tokens")).over(w))
          .select(col("doc_id"), col("lang"), col("source"), col("n_bpe_tokens"),
            expr("CAST((cum - 1) DIV 1024 AS BIGINT)").as("pack_id"))
      },
      Some {
        val prelude =
          s"""scored AS (SELECT doc_id, text, lang, source,
             |    CASE WHEN length(norm) = 0 THEN md5(text) ELSE md5(norm) END AS fp
             |  FROM (SELECT doc_id, text, lang, source, ${TextQueries.normSql} AS norm,
             |          ${TextQueries.qualitySql} AS q FROM documents)
             |  WHERE q >= 0.5e0),
             |kept AS MATERIALIZED (SELECT doc_id, text, lang, source FROM (
             |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM scored)
             |  WHERE doc_id = keeper),""".stripMargin
        s"""${TextQueries.bpeCtes(2, srcRel = "kept", prelude = prelude)},
           |enc AS (SELECT t.doc_id,
           |    CAST(sum(coalesce(len(string_split(d2.seq, ' ')), length(t.w))) AS BIGINT)
           |      AS n_bpe_tokens
           |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM kept) t
           |  LEFT JOIN d2 ON d2.w = t.w GROUP BY t.doc_id),
           |c AS (SELECT k.doc_id, k.lang, k.source, e.n_bpe_tokens,
           |    sum(e.n_bpe_tokens) OVER (PARTITION BY k.lang, k.source ORDER BY k.doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM kept k JOIN enc e ON e.doc_id = k.doc_id)
           |SELECT doc_id, lang, source, n_bpe_tokens,
           |  CAST((cum - 1) // 1024 AS BIGINT) AS pack_id FROM c""".stripMargin
      }),

    // FLAGSHIP 5 — the round-13 id pipeline: raw corpus -> MODEL
    // -based quality gate (the 6-step distilled logistic filter,
    // weights trained in the same invocation and folded into the
    // scan as literals) -> exact dedup (min-id keeper) -> BPE
    // training on the curated corpus (2 merge iterations) -> token-
    // ID encoding -> id PACKING into fixed-budget training rows.
    // This is pipe_tokenize_e2e's successor with the two upgrades a
    // real pipeline ships: a learned filter instead of the heuristic
    // floor, and actual token-id arrays instead of counts — the
    // packs' token_ids are literally what a loader feeds a trainer.
    // Every stage is graded solo (t_quality_filter, t_exact_dedup,
    // t_bpe_train, t_bpe_encode_ids, t_pack_ids); this pins the
    // composition as ONE plan. Scale shape: the gate rides the scan
    // (zero exchanges — weights are driver-held literals), dedup is
    // one fingerprint-keyed exchange, the dict chain is dictionary-
    // space, ids cross the wire once as int triples, and the pack
    // shard exchange carries the output's own volume.
    Q("pipe_ids_e2e",
      (s, d) => {
        val docs = graft.sources.Tables.load(s, d, "documents")
        // ownedLazy: trainWeights' first gradient aggregate is the
        // first consumer — a sequential driver loop, no build race
        val feat = graft.Caches.ownedLazy(TextQueries.qualityFeat(docs))
        val w = graft.ops.Logistic.trainWeights(feat, p = 4, steps = 6, lr = 2.0)
        val scored = docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
            graft.functions.text.fingerprint(col("text")).as("fp"))
          // scoreCols, not score(qualityX): the array-then-index form
          // breaks codegen function-splitting inside this large gate
          // predicate (interpreted fallback); inline columns stay in
          // whole-stage codegen (see Logistic.sigmaCols)
          .where(graft.ops.Logistic.scoreCols(TextQueries.qualityXs, w) >= 0.5)
        val keep = scored.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
        // feeds the dict chain, the id encode, and the pack —
        // checkpointed (r20, same rationale as pipe_tokenize_e2e);
        // harness-owned release (graft.Caches)
        val kept = graft.Caches.checkpointed(scored.join(keep, Seq("fp"))
          .where(col("doc_id") === col("keeper"))
          .select(col("doc_id"), col("text"), col("lang"), col("source")))
        val dict = graft.ops.Bpe.trainedDictFull(kept, col("text"), iters = 2)
        val ids = graft.ops.Bpe.encodeIds(kept, col("text"), col("doc_id"), dict.result)
        // token_ids graded as its space-joined string form (the
        // idsAsString convention — the driver's oracle harness cannot
        // sort array<int> cells); packIds itself keeps the real array
        TextQueries.idsAsString(graft.ops.Bpe.packIds(ids,
          kept.select(col("doc_id"), col("lang"), col("source")),
          TextQueries.PackBudget))
      },
      Some {
        val sig = TextQueries.logitSigSql("w6")
        val prelude =
          s"""${TextQueries.logitBody(6)},
             |qk AS (SELECT d.doc_id, d.text, d.lang, d.source
             |  FROM documents d JOIN feat f ON f.doc_id = d.doc_id, w6
             |  WHERE $sig >= 0.5e0),
             |sc2 AS (SELECT doc_id, text, lang, source,
             |    CASE WHEN length(norm) = 0 THEN md5(text) ELSE md5(norm) END AS fp
             |  FROM (SELECT *, ${TextQueries.normSql} AS norm FROM qk)),
             |kept AS MATERIALIZED (SELECT doc_id, text, lang, source FROM (
             |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM sc2)
             |  WHERE doc_id = keeper),""".stripMargin
        s"""${TextQueries.bpeCtes(2, srcRel = "kept", prelude = prelude)},
           |${TextQueries.idsCtes(2, srcRel = "kept")},
           |encl AS (SELECT doc_id, list(coalesce(voc.tok_id, -1) ORDER BY wpos, tpos) AS token_ids
           |         FROM tkq LEFT JOIN voc ON voc.tok = tkq.tok GROUP BY doc_id),
           |pk AS (SELECT k.lang, k.source, e.doc_id, e.token_ids,
           |         CAST(len(e.token_ids) AS BIGINT) AS n_tokens,
           |         sum(CAST(len(e.token_ids) AS BIGINT)) OVER (
           |           PARTITION BY k.lang, k.source ORDER BY e.doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |       FROM encl e JOIN kept k ON k.doc_id = e.doc_id)
           |SELECT lang, source, CAST((cum - 1) // ${TextQueries.PackBudget} AS BIGINT) AS pack_id,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  array_to_string(flatten(list(token_ids ORDER BY doc_id)), ' ') AS token_ids
           |FROM pk GROUP BY lang, source, pack_id""".stripMargin
      }),
  )
}
