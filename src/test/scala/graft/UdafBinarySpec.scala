package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Udafs

/** X3 typed Aggregators agree with the expression-form losses; S7 raw
  * binary scan via the binaryFile source unpacks to a dim table. */
class UdafBinarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weightedMse aggregator == expression form") {
    val df = sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(($"l_quantity" * 2200.0).as("pred"), $"l_extendedprice".as("truth"),
        lit(1.0).as("w"))
    val viaUdaf = df.as[(Double, Double, Double)]
      .select(udaf(Udafs.weightedMse).apply($"pred", $"truth", $"w")).collect()(0).getDouble(0)
    val viaExpr = df.agg(
      (sum(($"pred" - $"truth") * ($"pred" - $"truth") * $"w") / sum($"w"))).collect()(0).getDouble(0)
    assert(math.abs(viaUdaf - viaExpr) / viaExpr < 1e-9)
  }

  test("roundedMse aggregator rounds before differencing") {
    val df = Seq((1.4, 1.6), (2.5, 2.4)).toDF("pred", "truth")
    val v = df.as[(Double, Double)]
      .select(udaf(Udafs.roundedMse).apply($"pred", $"truth")).collect()(0).getDouble(0)
    // round(1.4)=1, round(1.6)=2 -> d=-1; round(2.5)=3 (half-up), round(2.4)=2 -> d=1
    assert(v == 1.0)
  }

  test("S7: binaryFile source scan unpacks a raw float grid to a dim table") {
    // write a raw little-endian float32 8x8 elevation grid (the
    // reference's np.fromfile format, datasets.py:145-147)
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    val n = 8
    val bb = java.nio.ByteBuffer.allocate(n * n * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until n * n) bb.putFloat(i.toFloat - 5.0f)
    java.nio.file.Files.write(dir.resolve("elev.bin"), bb.array())

    val raw = spark.read.format("binaryFile").load(dir.toString)
    assert(raw.select("path").collect()(0).getString(0).endsWith("elev.bin"))
    val dim = raw.select(explode(expr(
      s"transform(sequence(0, ${n * n - 1}), k -> struct(k div $n AS i, k % $n AS j," +
        " float(0) AS placeholder))")).as("c"), col("content"))
      .select(col("c.i"), col("c.j"),
        // little-endian float32 at offset 4k, via typed UDF-free slice + JVM decode in mapPartitions
        col("content"))
    // decode partition-batched (same shape as Multimodal.decodeAll)
    val decoded = dim.select(col("i"), col("j"), col("content")).as[(Long, Long, Array[Byte])]
      .mapPartitions(_.map { case (i, j, bytes) =>
        val off = (i * n + j).toInt * 4
        val v = java.nio.ByteBuffer.wrap(bytes, off, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat
        (i, j, v)
      }).toDF("i", "j", "elev")
    val rows = decoded.collect()
    assert(rows.length == n * n)
    assert(rows.find(r => r.getLong(0) == 0 && r.getLong(1) == 0).get.getFloat(2) == -5.0f)
    assert(rows.find(r => r.getLong(0) == 7 && r.getLong(1) == 7).get.getFloat(2) == 58.0f)
  }
}
