package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Sequences

/** SURVEY.md §2.5 time-series / sequence operators (P5, W1-W6, J2) on
  * the `events` stream table, bucketized to hourly cadence (events are
  * irregular; Sequences operators work on dense integer buckets).
  *
  * Scale: every window is partitioned by `user_id` — one hash shuffle,
  * then local sorted scans; the sequence-assembly join is an equi-join
  * after `explode(sequence(...))`, never an O(N²) theta range join.
  */
object SequenceQueries {

  private val Step = 3600L // hourly buckets
  private val L = 3        // sequence length

  /** Shared oracle CTEs: bucketized events + distinct buckets + valid
    * starts (lead-based, mirroring Sequences.validStarts). */
  private val bucketCte =
    s"""WITH b AS (SELECT user_id, CAST(floor(epoch(ts) / $Step) AS BIGINT) AS bkt, value, event_id
       |           FROM events),
       |d AS (SELECT DISTINCT user_id, bkt FROM b),
       |s AS (SELECT user_id, bkt FROM (
       |        SELECT user_id, bkt, lead(bkt, ${L - 1}) OVER (PARTITION BY user_id ORDER BY bkt) AS l
       |        FROM d)
       |      WHERE l = bkt + ${L - 1})""".stripMargin

  val all: Seq[Q] = Seq(

    // P5/W1/W2: valid sequence starts (datasets.py:15-47) — THE
    // load-bearing reference computation.
    Q("p5_valid_starts",
      (s, d) => {
        val b = T(s, d, "events").select(col("user_id"),
          Sequences.tsBucket(col("ts"), Step).as("bkt"))
        Sequences.validStarts(b, "user_id", "bkt", L)
      },
      Some(s"$bucketCte\nSELECT user_id, bkt FROM s")),

    // W2: gap detection via lag (datasets.py:39-45)
    Q("w2_gap_detect",
      (s, d) => Sequences.gaps(T(s, d, "events"), "user_id", "ts", 7200L),
      Some("""SELECT user_id, prev_ts AS gap_start, ts AS gap_end FROM (
             |  SELECT user_id, ts, lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
             |  FROM events)
             |WHERE prev_ts IS NOT NULL
             |  AND CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 7200""".stripMargin)),

    // J2/W1: sequence assembly — explode+equi-join, then per-sequence
    // aggregate (datasets.py:320-337)
    Q("j2_sequence_assemble",
      (s, d) => {
        val ev = T(s, d, "events").select(col("user_id"),
          Sequences.tsBucket(col("ts"), Step).as("bkt"), col("value"))
        val starts = Sequences.validStarts(ev.select(col("user_id"), col("bkt")), "user_id", "bkt", L)
        Sequences.assemble(starts, ev, "user_id", "bkt", L)
          .groupBy(col("user_id"), col("t0"))
          .agg(count(lit(1)).as("n_events"),
            (sum(qlong(col("value"), 100)) / 100.0).as("sum_val"))
      },
      Some(s"""$bucketCte
              |SELECT b.user_id AS user_id, s.bkt AS t0, count(*) AS n_events,
              |  CAST(sum(CAST(floor((value) * 100 + 0.5e0) AS BIGINT)) AS BIGINT) / 100.0e0 AS sum_val
              |FROM s JOIN b ON b.user_id = s.user_id AND b.bkt BETWEEN s.bkt AND s.bkt + ${L - 1}
              |GROUP BY b.user_id, s.bkt""".stripMargin)),

    // W1 (collect form): the assembled sequence as an ordered vector —
    // per valid start, the per-bucket event counts in time order,
    // serialized to a string so the oracle compares exactly
    // (datasets.py:303-347's batch tensor, one row per sample)
    Q("w1_sequence_vector",
      (s, d) => {
        val ev = T(s, d, "events").select(col("user_id"),
          Sequences.tsBucket(col("ts"), Step).as("bkt"))
        val starts = Sequences.validStarts(ev, "user_id", "bkt", L)
        val perBucket = Sequences.assemble(starts, ev, "user_id", "bkt", L)
          .groupBy(col("user_id"), col("t0"), col("bkt"))
          .agg(count(lit(1)).as("n"))
        perBucket.groupBy(col("user_id"), col("t0"))
          .agg(concat_ws(",",
            transform(sort_array(collect_list(struct(col("bkt"), col("n")))),
              x => x.getField("n").cast("string"))).as("seq_counts"))
      },
      Some(s"""$bucketCte,
              |pb AS (SELECT b.user_id AS user_id, s.bkt AS t0, b.bkt AS bkt, count(*) AS n
              |       FROM s JOIN b ON b.user_id = s.user_id AND b.bkt BETWEEN s.bkt AND s.bkt + ${L - 1}
              |       GROUP BY 1, 2, 3)
              |SELECT user_id, t0,
              |  string_agg(CAST(n AS VARCHAR), ',' ORDER BY bkt) AS seq_counts
              |FROM pb GROUP BY user_id, t0""".stripMargin)),

    // W1 at the REFERENCE parameters: 36-frame sequences
    // (datasets.py:15-47,172 — seq len 36). Three scale decisions,
    // all forced by L=36:
    //  1. the per-(series, bucket) counts are pre-aggregated FIRST
    //     (map-side combined groupBy whose shuffle is bounded by
    //     series x time-range, never the number of events);
    //  2. the 36-bucket sliding aggregate is ONE range-frame window
    //     pass over that series, not a 36-way explode join: the join
    //     form multiplies the series 36x, the range frame reads it
    //     once. n_buckets = 36 is exactly the valid-start predicate;
    //  3. the window is PARTITIONED BY the series key — every series
    //     is an independent task, so the plan scales with the number
    //     of series (the reference's regions/products). The synthetic
    //     key here is user_id % 4 at 1h cadence (the fixture's events
    //     are too sparse for 36 consecutive 15-min buckets per key);
    //     a real deployment keys by region/product at 900s.
    Q("w1_seq36_range",
      (s, d) => {
        val series = T(s, d, "events")
          .select((col("user_id") % 4).as("sid"),
            Sequences.tsBucket(col("ts"), 3600L).as("bkt"), col("value"))
          .groupBy(col("sid"), col("bkt"))
          .agg(count(lit(1)).as("n_ev"),
            sum(qlong(col("value"), 100)).as("cents"))
        val w = Window.partitionBy(col("sid")).orderBy(col("bkt"))
          .rangeBetween(Window.currentRow, 35)
        series.select(col("sid"), col("bkt").as("t0"),
            count(lit(1)).over(w).as("n_buckets"),
            sum(col("n_ev")).over(w).as("n_events"),
            (sum(col("cents")).over(w) / 100.0).as("sum_val"))
          .where(col("n_buckets") === 36)
      },
      Some("""WITH p AS (SELECT user_id % 4 AS sid,
             |             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bkt,
             |             count(*) AS n_ev,
             |             CAST(sum(CAST(floor((value) * 100 + 0.5e0) AS BIGINT)) AS BIGINT) AS cents
             |           FROM events GROUP BY 1, 2)
             |SELECT sid, t0, n_buckets, n_events, sum_val FROM (
             |  SELECT sid, bkt AS t0, count(*) OVER w AS n_buckets,
             |    CAST(sum(n_ev) OVER w AS BIGINT) AS n_events,
             |    CAST(sum(cents) OVER w AS BIGINT) / 100.0e0 AS sum_val
             |  FROM p WINDOW w AS (PARTITION BY sid ORDER BY bkt
             |                      RANGE BETWEEN CURRENT ROW AND 35 FOLLOWING))
             |WHERE n_buckets = 36""".stripMargin)),

    // W3: last-frame selection (models.py:119,174,223)
    Q("w3_last_event",
      (s, d) => T(s, d, "events").groupBy(col("user_id")).agg(
        max(col("ts")).as("last_ts"),
        max_by(col("value"), col("ts")).as("last_value"),
        max_by(col("event_id"), col("ts")).as("last_event")),
      Some("""SELECT user_id, max(ts) AS last_ts, arg_max(value, ts) AS last_value,
             |  arg_max(event_id, ts) AS last_event
             |FROM events GROUP BY user_id""".stripMargin)),

    // W4: seeded deterministic shuffle order (datasets.py:251-254) —
    // md5-derived so the oracle reproduces the permutation exactly
    Q("w4_seeded_shuffle",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(md5(concat(lit("11:"), col("event_id").cast("string"))), col("event_id"))
        T(s, d, "events").select(col("user_id"), col("event_id"),
          row_number().over(w).as("shuffled_pos"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(row_number() OVER (PARTITION BY user_id
             |    ORDER BY md5(concat('11:', CAST(event_id AS VARCHAR))), event_id) AS INT) AS shuffled_pos
             |FROM events""".stripMargin)),

    // W6: future-window offset — target window starts past_len steps
    // after the predictor window (datasets.py:322-323)
    Q("w6_future_offset",
      (s, d) => {
        val b = T(s, d, "events").select(col("user_id"),
          Sequences.tsBucket(col("ts"), Step).as("bkt"))
        Sequences.validStarts(b, "user_id", "bkt", L)
          .select(col("user_id"),
            timestamp_seconds(col("bkt") * Step).as("t0_ts"),
            timestamp_seconds((col("bkt") + 1) * Step).as("target_ts"))
      },
      Some(s"""$bucketCte
              |SELECT user_id, make_timestamp(bkt * $Step * 1000000) AS t0_ts,
              |  make_timestamp((bkt + 1) * $Step * 1000000) AS target_ts
              |FROM s""".stripMargin)),

    // W7: gap-based sessionization — two window passes over one key
    // shuffle (lag flags session starts, cumulative sum numbers them),
    // then per-session stats. The clickstream-analytics staple.
    Q("w7_sessionize",
      (s, d) => Sequences.sessionize(T(s, d, "events"), "user_id", "ts", 7200L, "event_id")
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("s_start"), max(col("ts")).as("s_end")),
      Some("""SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts) AS s_start, max(ts) AS s_end
             |FROM (
             |  SELECT user_id, ts,
             |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM (
             |    SELECT user_id, ts, event_id,
             |      CASE WHEN prev_ts IS NULL
             |             OR epoch_us(ts) - epoch_us(prev_ts) > 7200000000 THEN 1 ELSE 0 END AS is_new
             |    FROM (SELECT user_id, ts, event_id,
             |            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |          FROM events)))
             |GROUP BY user_id, session_id""".stripMargin)),

    // W7 via Spark's BUILT-IN session_window — the native operator
    // behind streaming sessionization, graded on its batch
    // degeneration (w7_sessionize grades the manual lag+cumsum form;
    // this pins the built-in against an independent SQL spec).
    // Boundary semantics differ from w7 BY CONTRACT: session_window
    // closes at last_ts + gap EXCLUSIVE, so an event exactly gap
    // seconds after the last starts a NEW session (diff >= gap; the
    // manual form splits only on diff > gap) — the oracle encodes
    // the built-in's own rule.
    Q("w7b_session_window",
      (s, d) => T(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "7200 seconds").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("s_start"),
          col("sw.end").as("s_end"), col("n_events")),
      Some("""SELECT user_id, min(ts) AS s_start,
             |  max(ts) + INTERVAL 7200 SECOND AS s_end,
             |  count(*) AS n_events
             |FROM (
             |  SELECT user_id, ts,
             |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM (
             |    SELECT user_id, ts, event_id,
             |      CASE WHEN prev_ts IS NULL
             |             OR epoch_us(ts) - epoch_us(prev_ts) >= 7200000000 THEN 1 ELSE 0 END AS is_new
             |    FROM (SELECT user_id, ts, event_id,
             |            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |          FROM events)))
             |GROUP BY user_id, session_id""".stripMargin)),

    // W8: moving average over a bounded row frame — the time-series
    // smoothing staple. The frame sum runs in quantized BIGINT space:
    // engines may accumulate sliding windows differently (segment
    // trees vs running sums), which integer arithmetic is immune to.
    Q("w8_moving_avg",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
        T(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            (sum(qlong(col("value"), 1e6)).over(w)
              / (lit(1e6) * count(lit(1)).over(w))).as("mavg"))
      },
      Some("""SELECT user_id, event_id, ts,
             |  CAST(sum(CAST(floor((value) * 1000000 + 0.5e0) AS BIGINT)) OVER w AS BIGINT)
             |    / (1e6 * count(*) OVER w) AS mavg
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // W9 (extension): time-series GAP FILLING by linear interpolation
    // — the sequence-completion alternative to dropping gapped windows
    // (P5/W2 detect gaps; this REPAIRS them, the other standard
    // treatment of a sparse frame cadence). Per user: densify the
    // bucket grid (scan-stage sequence explode between the series
    // bounds), then one user-keyed shuffle carries BOTH directional
    // ignoreNulls window passes (nearest present neighbor on each
    // side) and the lerp is scan work; exact-integer bucket means
    // feed it, and the 1e-6 qround absorbs the last-ulp division.
    // Edge buckets with only one neighbor stay unfilled (strict
    // interpolation, not extrapolation).
    Q("w9_interp_fill",
      (s, d) => {
        val ser = T(s, d, "events")
          .select(col("user_id"), Sequences.tsBucket(col("ts"), Step).as("bkt"),
            col("value"))
          .groupBy(col("user_id"), col("bkt"))
          .agg((sum(qlong(col("value"), 1e5)) / (lit(1e5) * count(lit(1)))).as("v"))
        Sequences.interpFill(ser, "user_id", "bkt", "v")
      },
      Some(s"""WITH ser AS (
              |  SELECT user_id, CAST(floor(epoch(ts) / $Step) AS BIGINT) AS bkt,
              |    CAST(sum(CAST(floor(value * 100000 + 0.5e0) AS BIGINT)) AS BIGINT)
              |      / (1e5 * count(*)) AS v
              |  FROM events GROUP BY 1, 2),
              |bounds AS (SELECT user_id, min(bkt) AS mnb, max(bkt) AS mxb FROM ser GROUP BY 1),
              |grid AS (SELECT user_id, unnest(range(mnb, mxb + 1)) AS bkt FROM bounds),
              |g AS (SELECT grid.user_id, grid.bkt, ser.v
              |      FROM grid LEFT JOIN ser USING (user_id, bkt)),
              |w AS (SELECT user_id, bkt, v,
              |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bkt
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              |    last_value(CASE WHEN v IS NOT NULL THEN bkt END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY bkt
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
              |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bkt
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |    first_value(CASE WHEN v IS NOT NULL THEN bkt END IGNORE NULLS)
              |      OVER (PARTITION BY user_id ORDER BY bkt
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
              |  FROM g)
              |SELECT user_id, bkt,
              |  (floor((CASE WHEN v IS NOT NULL THEN v
              |      ELSE pv + (nv - pv) * (CAST(bkt - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
              |    END) * 1000000 + 0.5e0) / 1000000.0e0) AS value,
              |  (v IS NULL) AS filled
              |FROM w
              |WHERE v IS NOT NULL OR (pv IS NOT NULL AND nv IS NOT NULL)""".stripMargin)),
  )
}
