package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed joins — the pre-partitioning lever for 100 TB
  * fact-to-fact joins (SURVEY's "bucketing for co-located joins"; the
  * reference's static per-region layout, datasets.py:113-127, is the
  * same idea: organize storage so the hot join never shuffles).
  *
  * Both sides are written `bucketBy(8, key)`; Spark then plans the
  * equi-join with ZERO Exchange operators — each task reads bucket i
  * of both tables. At cluster scale this converts the biggest shuffle
  * in a nightly pipeline (fact x fact on a shared key) into a local
  * merge per bucket, and it composes with everything else here: a
  * bucketed table feeds groupBy(key) aggregates exchange-free too. */
class BucketJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact-fact equi-join and groupBy plan with zero Exchange") {
    val d = "/root/testdata/sf0.001"
    val warehouse = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$warehouse'")
    try {
      sources.Tables.load(spark, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bkt.orders_b")
      sources.Tables.load(spark, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bkt.lineitem_b")

      val o = spark.table("graft_bkt.orders_b")
      val l = spark.table("graft_bkt.lineitem_b")
      // merge hint: at test scale Spark would broadcast the tiny side,
      // which hides the property under test — at fact-x-fact scale
      // neither side broadcasts and SMJ over matching buckets is the
      // plan this layout exists for
      val joined = l.join(o.hint("merge"), l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"),
        "bucketed join + same-key agg must be exchange-free:\n" + plan.take(1500))
      // correctness: identical to the plain (shuffled) join
      val plain = sources.Tables.load(spark, d, "lineitem")
        .join(sources.Tables.load(spark, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      assert(joined.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }
}
