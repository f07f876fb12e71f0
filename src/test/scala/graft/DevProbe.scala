package graft

/** Throwaway profiling main (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("e_sq8_adc", "d_delta_index_keep")) {
      val df = SparkEntry.allQueries.find(_.name == name).get.fn(spark, d)
      df.write.format("noop").mode("overwrite").save()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
  }
}
