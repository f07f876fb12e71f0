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

  test("real container headers: PNG/BMP/JPEG from the JDK's own encoders decode correctly") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def encode(fmt: String, img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
      bos.toByteArray
    }
    val rgb = new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(3, 4, 0xff8800) // non-trivial content
    val gray = new BufferedImage(5, 9, BufferedImage.TYPE_BYTE_GRAY)

    val png = Multimodal.decode(1L, encode("png", rgb))
    assert((png.width, png.height, png.channels, png.format) == ((37, 21, 3, "png")), png)
    val pngGray = Multimodal.decode(2L, encode("png", gray))
    assert((pngGray.width, pngGray.height, pngGray.channels, pngGray.format) == ((5, 9, 1, "png")), pngGray)
    val bmp = Multimodal.decode(3L, encode("bmp", rgb))
    assert((bmp.width, bmp.height, bmp.channels, bmp.format) == ((37, 21, 3, "bmp")), bmp)
    val jpg = Multimodal.decode(4L, encode("jpg", rgb))
    assert((jpg.width, jpg.height, jpg.channels, jpg.format) == ((37, 21, 3, "jpeg")), jpg)
  }

  test("real container headers: hand-built PNG IHDR byte literal (no encoder involved)") {
    // PNG signature + IHDR length/type + width=640 height=480,
    // bit depth 8, color type 6 (RGBA) — the spec's §11.2.2 layout
    val b = Array[Int](
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R', // IHDR chunk header
      0x00, 0x00, 0x02, 0x80, // width 640
      0x00, 0x00, 0x01, 0xe0, // height 480
      0x08, 0x06 // bit depth 8, color type 6
    ).map(_.toByte)
    val d = Multimodal.decode(7L, b)
    assert((d.width, d.height, d.channels, d.format) == ((640, 480, 4, "png")), d)
    assert(d.byteLen == b.length && d.checksum == b.map(_ & 0xff).sum.toLong)
  }

  test("decodeAll routes real containers through the Spark path (mapPartitions)") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(new BufferedImage(12, 8, BufferedImage.TYPE_INT_RGB), "png", bos)
    val media = Seq((1L, bos.toByteArray), (2L, Array[Byte](9, 8, 7, 6, 5)))
      .toDF("id", "payload")
    val out = Multimodal.decodeAll(spark, media).collect().map(d => d.id -> d).toMap
    assert((out(1L).width, out(1L).height, out(1L).format) == ((12, 8, "png")))
    // unrecognized payload falls back to the deterministic stub
    assert(out(2L) == Multimodal.decodeStub(2L, Array[Byte](9, 8, 7, 6, 5)))
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

  test("sampleFrames: every-k-th frame per video, stub fallback for non-video payloads") {
    // video 1: 10 distinguishable 2x3 frames; video 2: raw md5 bytes (stub path)
    val frames = (0 until 10).map(i => Array.tabulate(6)(j => (i * 10 + j).toByte))
    val v1 = Multimodal.packVideo(frames, 2, 3)
    val media = Seq((1L, v1), (2L, java.security.MessageDigest.getInstance("MD5")
      .digest("x".getBytes))).toDF("id", "payload")
    val got = Multimodal.sampleFrames(spark, media, 3).collect()
      .groupBy(_.id).view.mapValues(_.sortBy(_.frameIdx)).toMap
    assert(got(1L).map(_.frameIdx).toSeq == Seq(0, 3, 6, 9), "every 3rd frame")
    assert(got(1L).forall(f => f.h == 2 && f.w == 3))
    assert(got(1L)(1).pixels.sameElements(frames(3)), "frame payload intact")
    assert(got(2L).length == 1 && got(2L)(0).frameIdx == 0, "stub = one deterministic frame")
    // sampling never materializes unsampled frames
    assert(Multimodal.sampleFrames(spark, media, 1).collect().count(_.id == 1L) == 10)
  }

  test("resizeFrame: 2x2 mean-pool is exact round-half-up; bad pool is loud") {
    val f = Multimodal.Frame(7L, 0, 4, 4,
      Array[Int](0, 2, 10, 10, 4, 6, 10, 11, 255, 255, 0, 0, 255, 253, 1, 0)
        .map(_.toByte))
    val r = Multimodal.resizeFrame(f, 2)
    assert(r.h == 2 && r.w == 2)
    // blocks: (0+2+4+6)/4=3, (10+10+10+11+2)/4=10.25->10, (255*3+253+2)/4->255, (0+0+1+0+2)/4->0
    assert(r.pixels.map(_ & 0xff).toSeq == Seq(3, 10, 255, 0))
    intercept[IllegalArgumentException](Multimodal.resizeFrame(f, 3))
  }

  test("frameStats: exact integer sums, population variance, 4-bin histogram") {
    val px = Array[Int](0, 63, 64, 127, 128, 191, 192, 255).map(_.toByte)
    val ds = Seq(Multimodal.Frame(5L, 2, 2, 4, px)).toDS()
    val r = Multimodal.frameStats(ds).collect()(0)
    val vals = px.map(_ & 0xff)
    assert(r.getAs[Long]("pix_sum") == vals.map(_.toLong).sum)
    assert(r.getAs[Long]("pix_sq") == vals.map(v => v.toLong * v).sum)
    assert(r.getAs[Long]("h0") == 2 && r.getAs[Long]("h1") == 2 &&
      r.getAs[Long]("h2") == 2 && r.getAs[Long]("h3") == 2)
    val mean = vals.sum.toDouble / 8
    assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-12)
    val popVar = vals.map(v => (v - mean) * (v - mean)).sum / 8
    assert(math.abs(r.getAs[Double]("variance") - popVar) < 1e-9)
  }

  test("end-to-end: sample -> resize -> stats composes over a media table") {
    val vids = (1L to 4L).map { id =>
      val fr = (0 until 6).map(i =>
        Array.tabulate(16)(j => ((id * 37 + i * 11 + j) % 256).toByte))
      (id, Multimodal.packVideo(fr, 4, 4))
    }
    val media = vids.toDF("id", "payload")
    val stats = Multimodal.frameStats(
      Multimodal.sampleFrames(spark, media, 2)
        .map(f => Multimodal.resizeFrame(f, 2)))
    val rows = stats.collect()
    assert(rows.length == 4 * 3, "4 videos x frames {0,2,4}")
    assert(rows.forall(r => r.getAs[Int]("h") == 2 && r.getAs[Int]("w") == 2 &&
      r.getAs[Long]("n_pix") == 4))
  }
}
