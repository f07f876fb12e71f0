package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the library surface over the real
  * /root/testdata parquet — run with `sbt "Test/runMain graft.DriveCheck"`. */
object DriveCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.conf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = sources.Tables.load(spark, "/root/testdata/sf0.001", "events")
    println("== N9 plusSteps on real events ==")
    ev.select(col("ts"), functions.scalars.plusSteps(col("ts"), col("user_id").cast("int")).as("ts_plus")).show(3, false)
    println("== fingerprint: CJK/Cyrillic must not collapse ==")
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "你好世界"), (3L, "мир труд"), (4L, "hello world")).toDF("id", "text")
    docs.select(col("id"), functions.text.fingerprint(col("text")).as("fp")).show(false)
    println("== cosine zero-norm guard + self-cosine on real embeddings ==")
    val emb = sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    emb.select(col("vec_id"),
      functions.vectors.cosine(col("embedding"), array((0 until 64).map(_ => lit(0.0f)): _*)).as("cos_zero"),
      functions.vectors.cosine(col("embedding"), col("embedding")).as("cos_self")).show(3)
    println("== hyperplaneBucket dim=64 nBits=8 distribution ==")
    emb.select(functions.vectors.hyperplaneBucket(col("embedding"), 8, 64).as("b"))
      .groupBy("b").count().orderBy(desc("count")).show(5)
    println("== tsBucket + validStarts on real events ==")
    val b = ev.select(col("user_id"), ops.Sequences.tsBucket(col("ts"), 600L).as("bkt"))
    ops.Sequences.validStarts(b, "user_id", "bkt", 3).orderBy("user_id", "bkt").show(5)
    println("== ANN index lifecycle: build -> append -> compact -> search ==")
    val embv = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("ve"))
    val corpus = embv.where(col("vec_id") =!= 0)
    val cut = col("vec_id") % 10 === 6 && col("vec_id") > 16
    val idxDir = s"${sys.props("java.io.tmpdir")}/graft-ivfpq-drivecheck"
    val hfs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(idxDir), true)
    ops.AnnIndex.build(corpus.where(!cut), idxDir)
    ops.AnnIndex.append(spark, corpus.where(cut), idxDir)
    ops.AnnIndex.compact(spark, idxDir)
    val hits = ops.AnnIndex.search(spark, idxDir,
      embv.where(col("vec_id") === 0).select(col("ve").as("qv")), nprobe = 2)
    hits.show(3)
    require(hits.count() == 10, "index search did not return a full top-10")
    println("== dedup store lifecycle: build -> deltaKeep -> append -> compact ==")
    val dx = sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dedupDir = s"${sys.props("java.io.tmpdir")}/graft-dedup-drivecheck"
    hfs.delete(new org.apache.hadoop.fs.Path(dedupDir), true)
    ops.DedupIndex.build(dx.where(col("doc_id") % 10 =!= 7), dedupDir,
      col("text"), col("doc_id"))
    val kept = ops.DedupIndex.deltaKeep(spark, dx.where(col("doc_id") % 10 === 7),
      dedupDir, col("text"), col("doc_id"))
    val nKept = kept.count()
    println(s"delta kept $nKept docs")
    require(nKept > 0 && nKept <= dx.where(col("doc_id") % 10 === 7).count(),
      "deltaKeep out of range")
    ops.DedupIndex.append(kept, dedupDir, col("text"), col("doc_id"))
    ops.DedupIndex.compact(spark, dedupDir)
    // after ingest+compact, re-running the SAME delta keeps nothing
    require(ops.DedupIndex.deltaKeep(spark, dx.where(col("doc_id") % 10 === 7),
      dedupDir, col("text"), col("doc_id")).count() == 0,
      "ingested delta must dedup against itself on re-run")
    println("== BPE lifecycle: train -> persist dict -> encode (batch == indexed) ==")
    val bpeDir = s"${sys.props("java.io.tmpdir")}/graft-bpe-drivecheck"
    hfs.delete(new org.apache.hadoop.fs.Path(bpeDir), true)
    val merges = ops.Bpe.train(dx, col("text"), iters = 2).collect()
    require(merges.length == 2 && merges.forall(_.getLong(2) > 0),
      s"BPE training degenerate: ${merges.toSeq}")
    println(s"merges: ${merges.map(r => s"${r.getString(1)}(${r.getLong(2)})").mkString(", ")}")
    ops.Bpe.buildDictIfAbsent(spark, dx, col("text"), bpeDir, iters = 2,
      fingerprint = "drivecheck")
    val encIdx = ops.Bpe.encodeIndexed(spark, dx, col("text"), col("doc_id"), bpeDir)
    val trainedDict = ops.Bpe.trainedDictFull(dx, col("text"), iters = 2)
    val encPlan = ops.Bpe.encode(dx, col("text"), col("doc_id"), trainedDict.result)
    require(encIdx.exceptAll(encPlan).isEmpty && encPlan.exceptAll(encIdx).isEmpty,
      "persisted-dict encode diverged from the in-plan encode")
    trainedDict.unpersistAll()
    println(s"encoded ${encIdx.count()} docs through the persisted dict")
    println("== flagship entry() — the driver's rows>0 smoke ==")
    val entryRows = SparkEntry.entry(spark).count()
    require(entryRows > 0, "flagship entry() returned no rows")
    println(s"entry rows: $entryRows")
    println("DRIVE OK")
    spark.stop()
  }
}
// (appended) cross-check of the general driver-side solver vs the
// in-plan p=2 closed form — run via Test/runMain graft.SolveCheck
object SolveCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config(sources.Tables.conf).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val li = sources.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val w = ops.Ensemble.fitWeights(li,
      Seq(col("l_discount"), col("l_quantity") / lit(50.0)),
      col("l_extendedprice") / lit(110000.0))
    println(s"fitWeights: ${w.mkString(", ")}")
    val w1 = ops.Ensemble.fitWeights(li,
      Seq(col("l_discount"), col("l_quantity") / lit(50.0)),
      col("l_extendedprice") / lit(110000.0), sumToOne = true)
    println(s"fitWeights sum1: ${w1.mkString(", ")} (sum=${w1.sum})")
    spark.stop()
  }
}
