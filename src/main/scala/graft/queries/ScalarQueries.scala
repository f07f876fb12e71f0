package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.{scalars, geometry}

/** SURVEY.md §2.7 scalar library (N1-N16) as graded queries.
  *
  * Each query applies the reusable `Column` functions from
  * `graft.functions` to the driver's `lineitem`/`customer`/`events`
  * tables; the oracle mirrors the exact expression shape (see the
  * package doc for the determinism rules). All are embarrassingly
  * parallel scans — no shuffle, full whole-stage codegen, filters and
  * projections push to the parquet footer.
  */
object ScalarQueries {

  private val lo = 0.0
  private val hi = 110000.0
  private val inv = 1.0 / (hi - lo) // exact double, same fold in SQL

  val all: Seq[Q] = Seq(

    // N1: min-max decode (weather4cast/datasets.py:62-64)
    Q("n1_minmax_decode",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        scalars.minmaxDecode(col("l_extendedprice"), lo, hi).as("decoded")),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  (l_extendedprice - 0e0) * $inv AS decoded
              |FROM lineitem""".stripMargin)),

    // N2: encode(decode(x)) quantization round-trip (datasets.py:387-394)
    Q("n2_encode_roundtrip",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        scalars.minmaxEncode(
          scalars.minmaxDecode(col("l_extendedprice"), lo, hi), lo, hi).as("encoded")),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  CAST(floor(((l_extendedprice - 0e0) * $inv) * ${hi - lo} + $lo + 0.5e0) AS BIGINT) AS encoded
              |FROM lineitem""".stripMargin)),

    // N3/P3: fill-value -> NULL (datasets.py:61)
    Q("n3_fill_to_null",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        scalars.fillToNull(col("l_tax"), lit(0.0)).as("tax_or_null")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_tax = 0e0 THEN NULL ELSE l_tax END AS tax_or_null
             |FROM lineitem""".stripMargin)),

    // P4: clamp-below (datasets.py:148)
    Q("p4_clamp",
      (s, d) => T(s, d, "customer").select(
        col("c_custkey"),
        scalars.clampMin(col("c_acctbal"), 0.0).as("bal_clamped")),
      Some("SELECT c_custkey, greatest(c_acctbal, 0e0) AS bal_clamped FROM customer")),

    // N4: log-clip (models.py:102-106); ln last-ulp differs across
    // libm implementations -> snap to the 1e-6 grid (qround)
    Q("n4_log_clip",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        qround(scalars.logClip(col("l_discount")), 6).as("log_clipped")),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${qroundSql("ln(greatest(l_discount, 2e-4))", 6)} AS log_clipped
              |FROM lineitem""".stripMargin)),

    // N5: logit on clipped domain (ensemble.py:7-15)
    Q("n5_logit",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        qround(scalars.logit(scalars.clip(col("l_discount"), 0.003, 0.997)), 6).as("logit_v")),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${qroundSql("""ln(least(greatest(l_discount, 3e-3), 0.997e0)
             |    / (1e0 - least(greatest(l_discount, 3e-3), 0.997e0)))""", 6)} AS logit_v
              |FROM lineitem""".stripMargin)),

    // N5: normlogit and its exact inverse (ensemble.py:60-78)
    Q("n5_normlogit_roundtrip",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        qround(scalars.normlogit(col("l_discount")), 6).as("nl"),
        qround(scalars.invNormlogit(scalars.normlogit(col("l_discount"))), 6).as("nl_inv")),
      Some {
        val lM = scalars.lM
        val nlE = s"""(ln(least(greatest(l_discount, 3e-3), 0.997e0)
           |    / (1e0 - least(greatest(l_discount, 3e-3), 0.997e0))) + $lM) / ${2.0 * lM}"""
        val invE = s"""1e0 / (1e0 + exp(-(${2.0 * lM} * ((ln(least(greatest(l_discount, 3e-3), 0.997e0)
           |    / (1e0 - least(greatest(l_discount, 3e-3), 0.997e0))) + $lM) / ${2.0 * lM}) - $lM)))"""
        s"""SELECT l_orderkey, l_linenumber,
           |  ${qroundSql(nlE, 6)} AS nl,
           |  ${qroundSql(invE, 6)} AS nl_inv
           |FROM lineitem""".stripMargin
      }),

    // N6: sigmoid (models.py:22-23)
    Q("n6_sigmoid",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        qround(scalars.sigmoid((col("l_quantity") - lit(25.0)) / lit(10.0)), 6).as("sig")),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${qroundSql("1e0 / (1e0 + exp(-((l_quantity - 25e0) / 10e0)))", 6)} AS sig
              |FROM lineitem""".stripMargin)),

    // N7: weighted linear blend (ensemble.py:86-97); pure linear ops,
    // identical shape both sides -> bit-exact, no rounding needed
    Q("n7_blend",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        scalars.blend(Seq(
          (col("l_extendedprice"), 0.5),
          (col("l_quantity") * lit(1000.0), 0.3),
          (col("l_tax") * lit(100000.0), 0.2))).as("blended")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  ((l_extendedprice * 0.5e0) + ((l_quantity * 1000e0) * 0.3e0))
             |    + ((l_tax * 100000e0) * 0.2e0) AS blended
             |FROM lineitem""".stripMargin)),

    // N7: blend in normlogit space (ensemble.py:88-96)
    Q("n7_blend_logit_space",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        qround(scalars.blendLogitSpace(Seq(
          (col("l_discount") + lit(0.01), 0.6),
          (col("l_tax") + lit(0.01), 0.4))), 6).as("blended_nl")),
      Some {
        val lM = scalars.lM
        def nl(x: String) =
          s"((ln(least(greatest($x, 3e-3), 0.997e0) / (1e0 - least(greatest($x, 3e-3), 0.997e0))) + $lM) / ${2.0 * lM})"
        val blendE = s"""1e0 / (1e0 + exp(-(${2.0 * lM} * ((${nl("l_discount + 0.01e0")} * 0.6e0)
           |    + (${nl("l_tax + 0.01e0")} * 0.4e0)) - $lM)))"""
        s"""SELECT l_orderkey, l_linenumber,
           |  ${qroundSql(blendE, 6)} AS blended_nl
           |FROM lineitem""".stripMargin
      }),

    // N8: %Y%j day key + %Y%m%dT%H%M%SZ file key (datasets.py:26-28,258-259)
    Q("n8_time_keys",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        scalars.dayKey(col("l_shipdate")).as("day_key"),
        scalars.tsKey(col("l_shipdate")).as("ts_key")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  strftime(l_shipdate, '%Y%j') AS day_key,
             |  strftime(l_shipdate, '%Y%m%dT%H%M%SZ') AS ts_key
             |FROM lineitem""".stripMargin)),

    // N9: t + k*15min interval arithmetic (datasets.py:41-43,323)
    Q("n9_plus_steps",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        scalars.plusSteps(col("l_shipdate"), col("l_linenumber")).as("ts_plus")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_shipdate + (l_linenumber * 15) * INTERVAL 1 MINUTE AS ts_plus
             |FROM lineitem""".stripMargin)),

    // N10: reference filename construction incl. ASII rename
    // (datasets.py:256-269)
    Q("n10_ref_filename",
      (s, d) => T(s, d, "events").select(
        col("event_id"),
        scalars.refFileName(
          when(col("event_type") === "error", lit("ASII")).otherwise(upper(col("event_type"))),
          col("ts")).as("fname")),
      Some("""SELECT event_id,
             |  printf('S_NWC_%s_MSG4_Europe-VISIR_%s.nc',
             |    CASE WHEN (CASE WHEN event_type = 'error' THEN 'ASII' ELSE upper(event_type) END) = 'ASII'
             |         THEN 'ASII-TF'
             |         ELSE (CASE WHEN event_type = 'error' THEN 'ASII' ELSE upper(event_type) END) END,
             |    strftime(ts, '%Y%m%dT%H%M%SZ')) AS fname
             |FROM events""".stripMargin)),

    // N11: rot90 / flips as pure (i,j) projections (datasets.py:289-297)
    Q("n11_rot_flip", (s, d) => {
      val g = T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_orderkey") % 16).as("i"), (col("l_partkey") % 16).as("j"),
        col("l_quantity"))
      val (ri, rj) = geometry.rot90(col("i"), col("j"), 16, 1)
      g.select(col("l_orderkey"), col("l_linenumber"), col("i"), col("j"),
        ri.as("rot_i"), rj.as("rot_j"),
        geometry.flipUd(col("i"), 16).as("flip_i"),
        geometry.flipLr(col("j"), 16).as("flip_j"),
        col("l_quantity"))
    },
      Some("""SELECT l_orderkey, l_linenumber, i, j,
             |  15 - j AS rot_i, i AS rot_j, 15 - i AS flip_i, 15 - j AS flip_j,
             |  l_quantity
             |FROM (SELECT l_orderkey, l_linenumber, l_orderkey % 16 AS i,
             |        l_partkey % 16 AS j, l_quantity FROM lineitem)""".stripMargin)),

    // N12: seeded pseudo-random draws, md5-derived so the oracle can
    // reproduce them (datasets.py:271-287 one-draw-per-batch semantics)
    Q("n12_seeded_draws",
      (s, d) => {
        val h = md5(concat(lit("42:"), col("l_orderkey").cast("string")))
        T(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          ((ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 192).cast("long").as("box_i"),
          ((ascii(substring(h, 3, 1)) * 256 + ascii(substring(h, 4, 1))) % 192).cast("long").as("box_j"),
          (ascii(substring(h, 5, 1)) % 8).cast("long").as("aug_code"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST((ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1))) % 192 AS BIGINT) AS box_i,
             |  CAST((ascii(substring(h, 3, 1)) * 256 + ascii(substring(h, 4, 1))) % 192 AS BIGINT) AS box_j,
             |  CAST(ascii(substring(h, 5, 1)) % 8 AS BIGINT) AS aug_code
             |FROM (SELECT l_orderkey, l_linenumber,
             |        md5(concat('42:', CAST(l_orderkey AS VARCHAR))) AS h FROM lineitem)""".stripMargin)),

    // N13: array stack + positional restack (datasets.py:110,443-447)
    Q("n13_stack_restack",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        element_at(
          array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          (((col("l_linenumber") - 1) % 3) + 1).cast("int")).as("picked")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  [l_quantity, l_extendedprice, l_discount][((l_linenumber - 1) % 3) + 1] AS picked
             |FROM lineitem""".stripMargin)),

    // N15: reflection-padding source index (layers.py:5-20), n=16 pad=2
    Q("n15_reflect_pad",
      (s, _) => s.range(0, 20).toDF("o").select(
        col("o"), geometry.reflectIndex(col("o"), 16, 2).as("src")),
      Some("""SELECT o, CASE WHEN o - 2 < 0 THEN -(o - 2)
             |            WHEN o - 2 >= 16 THEN 30 - (o - 2)
             |            ELSE o - 2 END AS src
             |FROM generate_series(0, 19) AS t(o)""".stripMargin)),

    // N16: meshgrid relation (layers.py:29-35)
    Q("n16_meshgrid",
      (s, _) => geometry.meshgrid(s, 8, 8),
      Some("""SELECT a.i AS i, b.j AS j
             |FROM generate_series(0, 7) AS a(i), generate_series(0, 7) AS b(j)""".stripMargin)),
  )
}
