package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Spark session startup
  * dominates test wall-time otherwise). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(sources.Tables.conf)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
