package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Raster

/** N14: bilinear warp / advection gather (weather4cast/layers.py:23-79)
  * plus the S5 date-key fallback and P6 threshold-any predicate — the
  * last SURVEY.md §2 stragglers.
  *
  * The warp samples the grid at fractional coordinates: floor/clamp to
  * the 4 neighbor cells, gather via ONE equi-join after exploding the
  * 4 corner keys (never 4 separate joins), 2-D lerp as the weighted
  * sum. Displacements are quarter-step fractions, so every weight is
  * an exact binary fraction — corner-sum order cannot change the
  * result, keeping the oracle bit-exact.
  */
object WarpQueries {

  val all: Seq[Q] = Seq(

    // S5: previous-day %Y%j date-key fallback (datasets.py:430-435,
    // 450-454)
    Q("s5_prevday_key",
      (s, d) => T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyyDDD").as("day_key"),
        date_format(col("l_shipdate") - expr("INTERVAL 1 DAY"), "yyyyDDD").as("prev_day_key")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  strftime(l_shipdate, '%Y%j') AS day_key,
             |  strftime(l_shipdate - INTERVAL 1 DAY, '%Y%j') AS prev_day_key
             |FROM lineitem""".stripMargin)),

    // P6: rain-presence predicate — any value above a physical
    // threshold over the sequence (models.py:268-270, crr > 0.026)
    Q("p6_threshold_any",
      (s, d) => T(s, d, "events").groupBy(col("user_id")).agg(
        bool_or(col("value") > 150.0).as("has_heavy"),
        max(col("value")).as("max_value")),
      Some("""SELECT user_id, bool_or(value > 150e0) AS has_heavy,
             |  max(value) AS max_value
             |FROM events GROUP BY user_id""".stripMargin)),

    // N14: bilinear warp gather
    Q("n14_bilinear_warp",
      (s, d) => {
        val g = T(s, d, "lineitem")
          .select((col("l_orderkey") % 16).as("i"), (col("l_partkey") % 16).as("j"),
            col("l_quantity"))
          .groupBy(col("i"), col("j"))
          .agg(sum(col("l_quantity").cast("long")).cast("double").as("v"))
        // per-cell fractional displacement in quarter steps (exact
        // binary fractions -> order-independent sums)
        val x = col("i") - (col("i") % 3) * lit(0.25)
        val y = col("j") - (col("j") % 2) * lit(0.5)
        val x0 = floor(x).cast("long")
        val y0 = floor(y).cast("long")
        val fx = x - x0
        val fy = y - y0
        def clamp(c: org.apache.spark.sql.Column) = least(greatest(c, lit(0L)), lit(15L))
        val corners = array(
          struct(clamp(x0).as("ci"), clamp(y0).as("cj"), ((lit(1.0) - fx) * (lit(1.0) - fy)).as("w")),
          struct(clamp(x0 + 1).as("ci"), clamp(y0).as("cj"), (fx * (lit(1.0) - fy)).as("w")),
          struct(clamp(x0).as("ci"), clamp(y0 + 1).as("cj"), ((lit(1.0) - fx) * fy).as("w")),
          struct(clamp(x0 + 1).as("ci"), clamp(y0 + 1).as("cj"), (fx * fy).as("w")))
        g.select(col("i"), col("j"), explode(corners).as("c"))
          .select(col("i"), col("j"), col("c.ci"), col("c.cj"), col("c.w"))
          .join(g.select(col("i").as("ci"), col("j").as("cj"), col("v")), Seq("ci", "cj"))
          .groupBy(col("i"), col("j"))
          .agg(sum(col("w") * col("v")).as("warped"))
      },
      Some("""WITH g AS (SELECT l_orderkey % 16 AS i, l_partkey % 16 AS j,
             |             CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS v
             |           FROM lineitem GROUP BY 1, 2),
             |f AS (SELECT i, j,
             |        CAST(floor(i - (i % 3) * 0.25e0) AS BIGINT) AS x0,
             |        CAST(floor(j - (j % 2) * 0.5e0) AS BIGINT) AS y0,
             |        (i - (i % 3) * 0.25e0) - floor(i - (i % 3) * 0.25e0) AS fx,
             |        (j - (j % 2) * 0.5e0) - floor(j - (j % 2) * 0.5e0) AS fy
             |      FROM g),
             |corners AS (
             |  SELECT i, j, least(greatest(x0, 0), 15) AS ci, least(greatest(y0, 0), 15) AS cj,
             |         ((1e0 - fx) * (1e0 - fy)) AS w FROM f
             |  UNION ALL
             |  SELECT i, j, least(greatest(x0 + 1, 0), 15), least(greatest(y0, 0), 15),
             |         (fx * (1e0 - fy)) FROM f
             |  UNION ALL
             |  SELECT i, j, least(greatest(x0, 0), 15), least(greatest(y0 + 1, 0), 15),
             |         ((1e0 - fx) * fy) FROM f
             |  UNION ALL
             |  SELECT i, j, least(greatest(x0 + 1, 0), 15), least(greatest(y0 + 1, 0), 15),
             |         (fx * fy) FROM f)
             |SELECT c.i AS i, c.j AS j, sum(c.w * g2.v) AS warped
             |FROM corners c JOIN g g2 ON g2.i = c.ci AND g2.j = c.cj
             |GROUP BY c.i, c.j""".stripMargin)),

    // S2/S7 ingest boundary END-TO-END through a real binary carrier
    // (datasets.py:75-110 NetCDF uint16 reads; 455-459 uint16 writes):
    // each user's event series becomes one packed two-variable uint16
    // "frame" (v1 = value at scale 1/128 with event_type='error'
    // playing _FillValue; v2 = even-second-of-day at scale 2), then
    // the blob is decoded back to long-form (frame, cell, v1, v2)
    // rows. Pack is ONE shuffle (the row_number window's uid exchange
    // is reused by the groupBy); decode hexes each blob once below an
    // explode over cell indexes. The oracle computes the
    // quantize->dequantize identity directly from events — any
    // corruption in the hex/unhex/substr/conv carrier hash-mismatches.
    Q("s2_raster_pack_decode",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("uid")).orderBy(col("event_id"))
        val coded = T(s, d, "events")
          .select(col("user_id").as("uid"), col("event_id"), col("value"),
            col("event_type"), col("ts"))
          .withColumn("k", (row_number().over(w) - 1).cast("long"))
          .select(col("uid"), col("k"),
            Raster.encodeU16(col("value"), 128.0, col("event_type") === "error").as("c1"),
            shiftright(unix_timestamp(col("ts")) % 86400L, 1).as("c2"))
        val packed = coded.groupBy(col("uid"))
          .agg(Raster.packOrdered(col("k"), Raster.cellHex(col("c1"), col("c2"))).as("blob"))
        packed.select(col("uid"), hex(col("blob")).as("hxs"))
          .select(col("uid"), col("hxs"),
            explode(sequence(lit(0L), (length(col("hxs")) / 8).cast("long") - 1)).as("k"))
          .select(col("uid"), col("k"),
            Raster.decodeU16(Raster.unpackCode(col("hxs"), col("k"), 0, 2), 0.0078125).as("v1"),
            Raster.decodeU16(Raster.unpackCode(col("hxs"), col("k"), 1, 2), 2.0).as("v2"))
      },
      Some("""WITH coded AS (
             |  SELECT user_id AS uid,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS BIGINT) AS k,
             |    CASE WHEN event_type = 'error' OR value IS NULL THEN 65535
             |         ELSE least(65534, greatest(0, CAST(floor(value * 128e0 + 0.5e0) AS BIGINT))) END AS c1,
             |    (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 2 AS c2
             |  FROM events)
             |SELECT uid, k,
             |  CASE WHEN c1 = 65535 THEN NULL ELSE CAST(c1 AS DOUBLE) * 0.0078125e0 END AS v1,
             |  CAST(c2 AS DOUBLE) * 2e0 AS v2
             |FROM coded""".stripMargin)),
  )
}
