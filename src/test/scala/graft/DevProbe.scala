package graft

/** Throwaway profiling main (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (n <- Seq("t_pack_ids", "t_quality_classifier", "t_bpe_decode")) {
      val df = SparkEntry.allQueries.find(_.name == n).get
        .fn(spark, "/root/testdata/sf0.01")
      df.write.format("noop").mode("overwrite").save()
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Window") || l.contains("Sort") || l.contains("FileScan"))
        .mkString("\n"))
      spark.catalog.clearCache()
    }
  }
}
