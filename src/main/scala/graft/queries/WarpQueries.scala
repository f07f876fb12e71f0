package graft.queries

import org.apache.spark.sql.functions._

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
  )
}
