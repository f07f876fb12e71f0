package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev-only single-query verify: run named graded queries at a given
  * SF dir, dump each result + its oracle SQL under /tmp/qcheck/<name>,
  * for a local DuckDB compare while iterating — the same artifact
  * shape the driver's correctness gate consumes, without the full
  * 98-query Verify pass.
  *
  *   sbt "Test/runMain graft.QCheck sf0.01 x2_convgru pipe_submit_e2e"
  */
object QCheck {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf0.01")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config(graft.sources.Tables.conf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = "/tmp/qcheck"
    new java.io.File(out).mkdirs()
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, s"/root/testdata/$sf")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
      SparkEntry.oracleSql.get(n).foreach(sql =>
        Files.writeString(Paths.get(s"$out/$n.sql"), sql))
      println(f"[qcheck] $n: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
