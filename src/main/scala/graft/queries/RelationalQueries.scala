package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1-2.4, §2.8 relational core: scans, filters, set ops,
  * joins, sorts/limits (S1/S4, P1/P2/P7, SO1-SO3, J1/J3/J4, O1/O2).
  *
  * Scale notes per query are inline; the broad rules: dimension tables
  * (region 5 rows, nation 25) are broadcast so fact-side joins never
  * shuffle the big table on a dim key; exact money arithmetic is done
  * as BIGINT cents so partial-aggregation reassociation cannot change
  * the answer; windows are partitioned by a key (never one global
  * partition) except over already-limited tiny inputs.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // S1: catalog scan -> distinct (key, hour) availability index
    // (datasets.py:26-36). One shuffle on the (user, hour) hash.
    Q("s1_catalog_scan",
      (s, d) => T(s, d, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
        .distinct(),
      Some("SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr FROM events")),

    // S4: priority dedup — keep best-priority row per (user, hour),
    // the relational MSG4->MSG2 fallback (datasets.py:86-89).
    Q("s4_priority_dedup",
      (s, d) => {
        val pri = when(col("event_type") === "purchase", 0)
          .when(col("event_type") === "signup", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "view", 3)
          .otherwise(4)
        graft.ops.Sequences.priorityDedup(
          T(s, d, "events").withColumn("hr", date_trunc("hour", col("ts"))),
          Seq("user_id", "hr"), pri, col("event_id"))
          .select(col("user_id"), col("hr"), col("event_id"), col("event_type"))
      },
      Some("""SELECT user_id, hr, event_id, event_type FROM (
             |  SELECT user_id, date_trunc('hour', ts) AS hr, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
             |      ORDER BY CASE event_type WHEN 'purchase' THEN 0 WHEN 'signup' THEN 1
             |        WHEN 'click' THEN 2 WHEN 'view' THEN 3 ELSE 4 END, event_id) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin)),

    // P1: projection + filter — both push to the parquet scan
    // (ReadSchema prunes to 3 columns, PushedFilters on l_shipdate).
    Q("p1_projection",
      (s, d) => T(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '2000-01-01'""".stripMargin)),

    // P2: spatial box crop as a predicate on grid coords (datasets.py:102)
    Q("p2_box_crop",
      (s, d) => T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey") % 16).as("i"), (col("l_partkey") % 16).as("j"),
          col("l_quantity"))
        .where(col("i") >= 4 && col("i") < 12 && col("j") >= 4 && col("j") < 12),
      Some("""SELECT * FROM (SELECT l_orderkey, l_linenumber, l_orderkey % 16 AS i,
             |  l_partkey % 16 AS j, l_quantity FROM lineitem)
             |WHERE i >= 4 AND i < 12 AND j >= 4 AND j < 12""".stripMargin)),

    // P7: region-membership filter (main.py:48-52) — partition-prunable
    Q("p7_region_filter",
      (s, d) => T(s, d, "nation")
        .join(broadcast(T(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name").isin("EUROPE", "ASIA"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")),
      Some("""SELECT n_nationkey, n_name, r_name FROM nation
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name IN ('EUROPE', 'ASIA')""".stripMargin)),

    // SO1: distinct (datasets.py:31-36)
    Q("so1_distinct",
      (s, d) => T(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // SO2: N-way intersection of key sets (datasets.py:229-240's
    // set.intersection(*lists) — chained, here 3-way)
    Q("so2_intersect",
      (s, d) => T(s, d, "orders").select(col("o_custkey").as("custkey"))
        .intersect(T(s, d, "customer").where(col("c_acctbal") > 1000.0)
          .select(col("c_custkey").as("custkey")))
        .intersect(T(s, d, "orders").where(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))),
      Some("""SELECT o_custkey AS custkey FROM orders
             |INTERSECT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 1000e0
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin)),

    // SO3: union / concatenation (datasets.py:110,162,447)
    Q("so3_union",
      (s, d) => T(s, d, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          lit("customer").as("src"))
        .unionByName(T(s, d, "supplier")
          .select(col("s_suppkey").as("key"), col("s_name").as("name"),
            lit("supplier").as("src"))),
      Some("""SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
             |UNION ALL
             |SELECT s_suppkey, s_name, 'supplier' FROM supplier""".stripMargin)),

    // SO4: set DIFFERENCE — customers with no OPEN order (EXCEPT
    // semantics via Dataset.except, which plans as a left-anti join
    // over the distinct key sets, never a full sort; non-empty at
    // every test scale — the generator gives every customer orders,
    // but not every customer an 'O'-status one). Completes the
    // set-op family: distinct (SO1), intersect (SO2), union (SO3),
    // except.
    Q("so4_except",
      (s, d) => T(s, d, "customer").select(col("c_custkey").as("custkey"))
        .except(T(s, d, "orders").where(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey"))),
      Some("""SELECT c_custkey AS custkey FROM customer
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),

    // J1: static-dim broadcast equi-join (datasets.py:151-162).
    // region/nation broadcast: the customer side never shuffles.
    Q("j1_broadcast_dim",
      (s, d) => T(s, d, "customer")
        .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_cust"),
          (sum(qlong(col("c_acctbal"), 100)) / 100.0).as("sum_bal")),
      Some("""SELECT r_name, count(*) AS n_cust,
             |  CAST(sum(CAST(floor((c_acctbal) * 100 + 0.5e0) AS BIGINT)) AS BIGINT) / 100.0e0 AS sum_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // J3: multi-table equi-join + agg (datasets.py:325-336 analog).
    // Money summed as exact 1e-4-dollar BIGINTs: reassociation-proof.
    Q("j3_equi_join_agg",
      (s, d) => T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_items"),
          (sum(qlong(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
            / 10000.0).as("revenue")),
      Some("""SELECT c_mktsegment, o_orderstatus, count(*) AS n_items,
             |  CAST(sum(CAST(floor((l_extendedprice * (1e0 - l_discount)) * 10000 + 0.5e0) AS BIGINT)) AS BIGINT)
             |    / 10000.0e0 AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment, o_orderstatus""".stripMargin)),

    // J4: conditional dispatch — per-group flag joined back, CASE
    // selects the "model" output (models.py:262-272)
    Q("j4_conditional_dispatch",
      (s, d) => {
        val flags = T(s, d, "lineitem").groupBy(col("l_orderkey"))
          .agg(bool_or(col("l_quantity") > 45.0).as("has_big"))
        T(s, d, "orders")
          .join(flags, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("has_big"),
            when(col("has_big"), col("o_totalprice") * 1.1)
              .otherwise(col("o_totalprice") * 0.9).as("dispatched"))
      },
      Some("""SELECT o_orderkey, has_big,
             |  CASE WHEN has_big THEN o_totalprice * 1.1e0 ELSE o_totalprice * 0.9e0 END AS dispatched
             |FROM orders
             |JOIN (SELECT l_orderkey, bool_or(l_quantity > 45e0) AS has_big
             |      FROM lineitem GROUP BY l_orderkey) ON o_orderkey = l_orderkey""".stripMargin)),

    // J6: salted skew join — o_orderstatus has 3 distinct values, so a
    // plain shuffle join would serialize 150k+ rows onto <=3 reducer
    // partitions; Skew.saltedJoin spreads each status over 8 salt
    // buckets (24 join keys). shuffle_hash hint keeps the dim from
    // being broadcast so the demonstrated distribution is the real
    // one. Output is row-identical to the unsalted join (the oracle
    // IS the unsalted join).
    Q("j6_salted_skew_join",
      (s, d) => {
        val orders = T(s, d, "orders")
        val dim = orders.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_status"))
        graft.ops.Skew.saltedJoin(
            orders, dim.hint("shuffle_hash"), Seq("o_orderstatus"),
            col("o_orderkey"), s = 8)
          .groupBy(col("o_orderstatus"), col("n_status"))
          .agg((sum(qlong(col("o_totalprice"), 100)) / 100.0).as("sum_price"))
      },
      Some("""WITH dim AS (SELECT o_orderstatus, count(*) AS n_status
             |            FROM orders GROUP BY 1)
             |SELECT o.o_orderstatus, d.n_status,
             |  CAST(sum(CAST(floor((o.o_totalprice) * 100 + 0.5e0) AS BIGINT)) AS BIGINT) / 100.0e0 AS sum_price
             |FROM orders o JOIN dim d ON o.o_orderstatus = d.o_orderstatus
             |GROUP BY 1, 2""".stripMargin)),

    // J7: as-of (point-in-time) join — every event gets the latest
    // anchor (event_id % 7 == 0, deduped to one per (user, ts)) at or
    // before its timestamp. Spark-first shape: tagged union + one key
    // window (ops/AsOf), never a range theta-join; the oracle is
    // DuckDB's NATIVE ASOF LEFT JOIN, so the window rewrite is proven
    // equivalent to the dedicated operator.
    Q("j7_asof_join",
      (s, d) => {
        val ev = T(s, d, "events")
        val anchors = ev.where(pmod(col("event_id"), lit(7)) === 0)
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("anchor_val"),
            max(col("event_id")).as("anchor_id"))
        graft.ops.AsOf.asofJoin(
            ev.select(col("event_id"), col("user_id"), col("ts"), col("value")),
            anchors, "user_id", "ts",
            valCols = Seq("anchor_val", "anchor_id"), tieBreak = "anchor_id")
      },
      Some("""WITH r AS (SELECT user_id, ts, arg_max(value, event_id) AS anchor_val,
             |            max(event_id) AS anchor_id
             |          FROM events WHERE event_id % 7 = 0 GROUP BY 1, 2)
             |SELECT l.event_id, l.user_id, l.ts, l.value, r.anchor_val, r.anchor_id
             |FROM events l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin)),

    // J8: semi/anti joins — existence filtering without row
    // multiplication (the dedup-safe way to ask "has orders?"/"has
    // none"). full_outer + coalesce keeps segments where either count
    // is zero, matching the oracle's FILTER counts.
    Q("j8_semi_anti",
      (s, d) => {
        val c = T(s, d, "customer")
        val o = T(s, d, "orders")
        val active = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_active"))
        val inactive = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_inactive"))
        active.join(inactive, Seq("c_mktsegment"), "full_outer")
          .select(col("c_mktsegment"),
            coalesce(col("n_active"), lit(0L)).as("n_active"),
            coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
      },
      Some("""SELECT c_mktsegment,
             |  CAST(count(*) FILTER (has_o) AS BIGINT) AS n_active,
             |  CAST(count(*) FILTER (NOT has_o) AS BIGINT) AS n_inactive
             |FROM (SELECT c_mktsegment,
             |        EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
             |      FROM customer)
             |GROUP BY 1""".stripMargin)),

    // J9: interval (correlation) join — the BATCH-graded twin of the
    // ST4 streaming operator (Streaming.intervalJoin, the
    // view→click / impression→conversion attribution shape): each
    // click pairs with the same-user views it follows within 6 hours.
    // Same call as the streaming form — on batch frames Spark plans
    // it as ONE key equi-join with the time range as a post-join
    // filter (never a theta join); on watermarked streams the
    // two-sided bound is what lets state expire. Grading the batch
    // form here + stream==batch in FoldStreamSpec closes the loop:
    // the streaming operator's semantics carry a DuckDB oracle.
    Q("j9_interval_join",
      (s, d) => {
        val ev = T(s, d, "events")
        val views = ev.where(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
            col("ts").as("click_ts"))
        graft.streaming.Streaming.intervalJoin(views, clicks,
            "user_id", "c_user", "view_ts", "click_ts", maxLagSeconds = 6 * 3600)
          .select(col("view_id"), col("click_id"), col("user_id"),
            col("view_ts"), col("click_ts"))
      },
      Some("""SELECT l.event_id AS view_id, r.event_id AS click_id,
             |  l.user_id, l.ts AS view_ts, r.ts AS click_ts
             |FROM events l JOIN events r
             |  ON l.user_id = r.user_id
             | AND l.event_type = 'view' AND r.event_type = 'click'
             | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR""".stripMargin)),

    // O3: the ANSI rank family over a tie-heavy column. NOT computed
    // as a window over the raw rows — l_returnflag has 3 values, so
    // that window would sort the whole table on 3 tasks. Instead:
    // parallel partial+final groupBy collapses the 600k rows to ~150
    // (flag, quantity) groups, and the rank family falls out of
    // cumulative counts over that TINY series (rank = preceding rows
    // + 1, dense_rank = distinct position, percent_rank/cume_dist =
    // the ANSI count formulas on exact integers). The oracle stays
    // DuckDB's real window functions — proving the aggregation
    // rewrite IS the rank family.
    Q("o3_rank_family",
      (s, d) => {
        val g = T(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
        val wAll = Window.partitionBy(col("l_returnflag"))
        g.select(col("l_returnflag"), col("l_quantity"),
            (coalesce(sum(col("cnt")).over(
              w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L).as("rnk"),
            row_number().over(w).cast("long").as("drnk"),
            sum(col("cnt")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
            sum(col("cnt")).over(wAll).as("n"))
          .select(col("l_returnflag"), col("l_quantity"), col("rnk"), col("drnk"),
            qround((col("rnk") - 1).cast("double") / (col("n") - 1).cast("double"), 6).as("prnk"),
            qround(col("cum").cast("double") / col("n").cast("double"), 6).as("cdist"))
      },
      Some(s"""SELECT DISTINCT l_returnflag, l_quantity,
              |  CAST(rank() OVER w AS BIGINT) AS rnk,
              |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
              |  ${qroundSql("percent_rank() OVER w", 6)} AS prnk,
              |  ${qroundSql("cume_dist() OVER w", 6)} AS cdist
              |FROM lineitem
              |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)""".stripMargin)),

    // O4: top-N per group — NOT the naive full-table window (3 groups
    // => 3 tasks sort everything) but ops/TopN's per-input-partition
    // local prune: every core ranks its own slice per group, only the
    // <= n x partitions survivors reach the global ordering window.
    // The oracle is the one-pass window form — proving the two-phase
    // rewrite emits identical rows.
    Q("o4_topn_per_group",
      (s, d) => graft.ops.TopN.topNPerGroupAgg(
          T(s, d, "lineitem")
            .select(col("l_returnflag"), col("l_orderkey"),
              col("l_linenumber"), col("l_extendedprice")),
          group = "l_returnflag", value = "l_extendedprice", n = 3,
          tieBreaks = Seq("l_orderkey", "l_linenumber"))
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice")),
      Some("""SELECT l_returnflag, CAST(rn AS BIGINT) AS rn, l_orderkey, l_linenumber, l_extendedprice
             |FROM (SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             |        row_number() OVER (PARTITION BY l_returnflag
             |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |      FROM lineitem)
             |WHERE rn <= 3""".stripMargin)),

    // O1: sort + top-k with rank. Spark plans TakeOrderedAndProject
    // (no global sort of the full table); the rank window runs over
    // the 100 surviving rows only.
    Q("o1_sort_topk",
      (s, d) => {
        val top = T(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
        top.withColumn("rnk",
          row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
          .select(col("o_orderkey"), col("o_totalprice"), col("rnk"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
             |FROM (SELECT o_orderkey, o_totalprice FROM orders
             |      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)""".stripMargin)),

    // O2/W5: batch partitioning with tail-drop (datasets.py:248-249,
    // 303-310): per-user deterministic order -> batches of 8, drop the
    // trailing partial batch. Window is partitioned — scales per key.
    Q("o2_batch_limit",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(md5(concat(lit("7:"), col("event_id").cast("string"))), col("event_id"))
        T(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .withColumn("batch", floor((col("rn") - 1) / 8).cast("long"))
          .groupBy(col("user_id"), col("batch"))
          .agg(count(lit(1)).as("n"))
          .where(col("n") === 8)
      },
      Some("""SELECT user_id, batch, count(*) AS n FROM (
             |  SELECT user_id, CAST(floor((rn - 1) / 8) AS BIGINT) AS batch FROM (
             |    SELECT user_id, row_number() OVER (PARTITION BY user_id
             |      ORDER BY md5(concat('7:', CAST(event_id AS VARCHAR))), event_id) AS rn
             |    FROM events))
             |GROUP BY user_id, batch HAVING count(*) = 8""".stripMargin)),
  )
}
