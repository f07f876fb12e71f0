package graft
import org.apache.spark.sql.functions._
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = "/root/testdata/sf0.01"
    def plan(name: String): String = {
      val q = SparkEntry.allQueries.find(_.name == name).get
      val df = q.fn(spark, d)
      df.write.format("noop").mode("overwrite").save() // finalize AQE
      df.queryExecution.executedPlan.toString
    }
    // P1: filter + projection pushdown must reach the parquet scan
    val p1 = plan("p1_projection")
    println("== p1 pushdown ==")
    p1.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).foreach(l => println(l.trim.take(200)))
    // J1: both dims broadcast
    val j1 = plan("j1_broadcast_dim")
    println("== j1 broadcasts: " + "BroadcastHashJoin".r.findAllIn(j1).length + ", shuffles: " + "Exchange hashpartitioning".r.findAllIn(j1).length)
    // O1: TakeOrderedAndProject, not global sort
    val o1 = plan("o1_sort_topk")
    println("== o1 TakeOrdered: " + o1.contains("TakeOrderedAndProject") + ", global Sort+Exchange rangepartitioning: " + o1.contains("rangepartitioning"))
    // P5: single shuffle on user hash
    val p5 = plan("p5_valid_starts")
    println("== p5 shuffles: " + "Exchange".r.findAllIn(p5).length)
    // a3: shuffle-free single-stage agg (only final agg exchange of 1 row)
    val a3 = plan("a3_gram_matrix")
    println("== a3 exchanges: " + "Exchange".r.findAllIn(a3).length + " (expect 1 single-partition merge)")
    // n1: whole-stage codegen covers the project
    val n1 = plan("n1_minmax_decode")
    println("== n1 wholestage spans: " + "WholeStageCodegen".r.findAllIn(n1).length)
    // e_cosine_topk: broadcast of the query row
    val ec = plan("e_cosine_topk")
    println("== e_cosine broadcast: " + ec.contains("BroadcastNestedLoopJoin") + "/" + ec.contains("BroadcastExchange"))
    // j3: join strategy at this size
    val j3 = plan("j3_equi_join_agg")
    println("== j3 strategies: SMJ=" + j3.contains("SortMergeJoin") + " SHJ=" + j3.contains("ShuffledHashJoin") + " BHJ=" + j3.contains("BroadcastHashJoin"))
    // a1 rewritten join
    val a1 = plan("a1_cond_mean_impute")
    println("== a1: BHJ=" + a1.contains("BroadcastHashJoin") + " window=" + a1.contains("Window"))
    spark.stop()
  }
}
