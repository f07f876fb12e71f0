package graft

/** Throwaway profiling main (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (d <- Seq("/root/repo/scaledata/x10", "/root/repo/scaledata/x100")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.allQueries.find(_.name == "d_lsh_pairs").get.fn(spark, d).count()
      println(f"[probe] $d d_lsh_pairs rows=$n t=${(System.nanoTime()-t0)/1e9}%.1f")
    }
  }
}
