package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object DevProbe {
  def main(args: Array[String]): Unit = {
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
    import graft.ops.Dedup

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeIt(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROBE $name%-24s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.persist(); docs.count()
    val sig = Dedup.minhashSignature(docs, col("text"), col("doc_id"), 3, 4, keepShort = false)
    val pairs = Dedup.lshCandidateIdPairs(Dedup.lshBands(sig, 4, 4), 4).result.persist()
    println(s"PROBE pairs10x = ${pairs.count()}")

    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(32, col("src")).localCheckpoint()
    val labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    val nbrMin = edges.join(labels.select(col("id").as("src"), col("label")).hint("shuffle_hash"), "src")
      .groupBy(col("dst").as("id")).agg(min(col("label")).as("_nbr"))
    val prop = labels.join(nbrMin.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id"), least(col("label"), coalesce(col("_nbr"), col("label"))).as("label"))
    val next = prop.join(prop.select(col("id").as("label"), col("label").as("_ll")).hint("shuffle_hash"),
        Seq("label"), "left")
      .select(col("id"), coalesce(col("_ll"), col("label")).as("label"))
    next.explain("formatted")
    timeIt("nbrMin_only")(noop(nbrMin))
    timeIt("prop_only")(noop(prop))
    timeIt("full_iter_ckpt") { next.localCheckpoint() }
    spark.stop()
  }
}
