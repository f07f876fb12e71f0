package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config(graft.sources.Tables.conf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    li.write.format("noop").mode("overwrite").save()

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s cold=${ts.head}%.3f min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val S = graft.ops.Ensemble.Scale.toDouble
    def q(c: org.apache.spark.sql.Column) = round(c * S).cast("long")
    val p1 = col("l_discount")
    val p2 = col("l_quantity") / lit(50.0)
    val yv = col("l_extendedprice") / lit(110000.0)

    // stage 1: bare quantized projection + 6-sum agg (no division layer)
    def sumsOnly = li
      .select(q(p1).as("_q1"), q(p2).as("_q2"), q(yv).as("_qy"))
      .agg(count(lit(1)).as("n"),
        sum(col("_q1") * col("_q1")).as("s11"),
        sum(col("_q1") * col("_q2")).as("s12"),
        sum(col("_q2") * col("_q2")).as("s22"),
        sum(col("_q1") * col("_qy")).as("sb1"),
        sum(col("_q2") * col("_qy")).as("sb2"))

    // stage 2: a5-style agg (long casts, no round/mult)
    def a5Style = li
      .select(col("l_quantity").cast("long").as("_x"),
        round(col("l_extendedprice")).cast("long").as("_y"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
        sum(col("_x") * col("_x")).as("sxx"),
        sum(col("_y") * col("_y")).as("syy"),
        sum(col("_x") * col("_y")).as("sxy"))

    def gram = graft.ops.Ensemble.gramAgg(li, Seq(p1, p2), yv)

    def qf(c: org.apache.spark.sql.Column) = floor(c * S + lit(0.5)).cast("long")
    def sumsFloor = li
      .select(qf(p1).as("_q1"), qf(p2).as("_q2"), qf(yv).as("_qy"))
      .agg(count(lit(1)).as("n"),
        sum(col("_q1") * col("_q1")).as("s11"),
        sum(col("_q1") * col("_q2")).as("s12"),
        sum(col("_q2") * col("_q2")).as("s22"),
        sum(col("_q1") * col("_qy")).as("sb1"),
        sum(col("_q2") * col("_qy")).as("sb2"))

    time("a5_style_agg") { a5Style.write.format("noop").mode("overwrite").save() }
    time("sums_only") { sumsOnly.write.format("noop").mode("overwrite").save() }
    time("sums_floor") { sumsFloor.write.format("noop").mode("overwrite").save() }
    time("gramAgg_full") { gram.write.format("noop").mode("overwrite").save() }
    // value check: do the two quantizers agree on this data?
    val a = sumsOnly.collect()(0)
    val b = sumsFloor.collect()(0)
    println(s"[probe] round-vs-floor equal: ${a == b}  a=$a  b=$b")
    spark.stop()
  }
}
