package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.sources.{Sinks, Tables}

/** Multimodal plumbing: the typed mapPartitions decode stub must agree
  * field-for-field with the graded metadata query (same bytes, two
  * execution paths). Sinks: encode round-trip + real partition dirs. */
class MultimodalSinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decodeAll (mapPartitions stub) matches the expression-side metadata") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(200)
    val media = Multimodal.withPayload(docs, "text", "doc_id")
    val decoded = Multimodal.decodeAll(spark, media)
      .select($"id", $"width", $"height", $"channels", $"format", $"byteLen", $"checksum")
    val q = queries.MiscQueries.all.find(_.name == "m_multimodal_meta").get
    val viaQuery = q.fn(spark, "/root/testdata/sf0.001")
      .select($"doc_id".as("id"), $"width".as("q_width"), $"height".as("q_height"),
        $"channels".as("q_channels"), $"format".as("q_format"), $"checksum".as("q_checksum"))
    val j = decoded.join(viaQuery, "id").cache()
    assert(j.count() == 200)
    val mism = j.where($"width" =!= $"q_width" || $"height" =!= $"q_height" ||
      $"channels" =!= $"q_channels" || $"format" =!= $"q_format" ||
      $"checksum" =!= $"q_checksum")
    assert(mism.count() == 0)
    // byteLen is the md5 payload size
    assert(decoded.where($"byteLen" =!= 16).count() == 0)
  }

  test("encode sink: partitioned write + decode round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    // customer: c_custkey IS unique (lineitem's (orderkey, linenumber)
    // is NOT in this synthetic lake — 1161 dup pairs at sf0.001)
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select($"c_custkey", $"c_mktsegment", ($"c_acctbal" / 10000.0).as("v"))
    Sinks.writeEncoded(cust, dir, "v", 0.0, 65535.0, Seq("c_mktsegment"))
    // Hive-style partition dirs exist
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("c_mktsegment=")), dirs.mkString(","))
    val back = Sinks.readEncoded(spark, dir, "v", 0.0, 65535.0)
    val joined = cust.select($"c_custkey", $"v".as("orig"))
      .join(back.select($"c_custkey", $"v".as("rt")), Seq("c_custkey"))
    assert(joined.count() == 150)
    val maxErr = joined.agg(max(abs($"orig" - $"rt"))).collect()(0).getDouble(0)
    assert(maxErr <= 0.5 / 65535.0 + 1e-12, s"round-trip err $maxErr")

    // the partition layout must actually prune: filtering on the
    // partition column shows a PartitionFilter and reads one dir
    val pruned = spark.read.parquet(dir).where($"c_mktsegment" === "BUILDING")
    pruned.write.format("noop").mode("overwrite").save()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"), plan.take(600))
    val nSeg = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .where($"c_mktsegment" === "BUILDING").count()
    assert(pruned.count() == nSeg)
  }
}
