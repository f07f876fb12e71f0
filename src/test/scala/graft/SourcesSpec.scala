package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format round-trips beyond parquet: the engine's tables
  * survive CSV and JSON-lines round-trips with explicit schemas (the
  * interchange formats an ingest pipeline actually receives). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def roundTrip(fmt: String): Unit = {
    val nation = sources.Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
    nation.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
    val back = spark.read.format(fmt).option("header", "true")
      .schema(nation.schema) // explicit schema: no inference drift
      .load(dir)
    assert(back.schema == nation.schema)
    val a = nation.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"$fmt round-trip changed rows")
  }

  test("nation survives a CSV round-trip with explicit schema")(roundTrip("csv"))
  test("nation survives a JSON-lines round-trip with explicit schema")(roundTrip("json"))

  // ---- classic NetCDF fixtures, written from the format spec -------
  // (independently of sources.Netcdf: explicit field-by-field bytes,
  // two-pass begin patching — a reader bug can't self-agree with this)

  private def cdfBytes(header: (java.io.DataOutputStream, Long) => Unit)
                      (data: java.io.DataOutputStream => Unit): Array[Byte] = {
    def pass(begin: Long): java.io.ByteArrayOutputStream = {
      val b = new java.io.ByteArrayOutputStream()
      header(new java.io.DataOutputStream(b), begin)
      b
    }
    // pass 1 with begin=0 measures where the header ends; pass 2
    // writes the real begin, then the data lands exactly there
    val b = pass(pass(0L).size().toLong)
    data(new java.io.DataOutputStream(b))
    b.toByteArray
  }

  private def ncName(o: java.io.DataOutputStream, s: String): Unit = {
    o.writeInt(s.length); o.write(s.getBytes("US-ASCII"))
    (0 until ((4 - s.length % 4) % 4)).foreach(_ => o.writeByte(0))
  }

  /** CDF-1, fixed dims (t=2, y=2, x=3), NC_SHORT `temperature` with
    * valid_range [0, 500] and _FillValue -1 — the reference's variable
    * shape (datasets.py:86-94). Data has one fill per slab. */
  private lazy val fix1: Array[Byte] = cdfBytes { (o, begin) =>
    o.write(Array[Byte]('C', 'D', 'F', 1))
    o.writeInt(0) // numrecs: no record dim
    o.writeInt(0x0A); o.writeInt(3) // NC_DIMENSION x3
    ncName(o, "t"); o.writeInt(2)
    ncName(o, "y"); o.writeInt(2)
    ncName(o, "x"); o.writeInt(3)
    o.writeInt(0); o.writeInt(0) // no global attrs
    o.writeInt(0x0B); o.writeInt(1) // NC_VARIABLE x1
    ncName(o, "temperature")
    o.writeInt(3); o.writeInt(0); o.writeInt(1); o.writeInt(2) // rank 3: dims t,y,x
    o.writeInt(0x0C); o.writeInt(2) // NC_ATTRIBUTE x2
    ncName(o, "valid_range"); o.writeInt(3); o.writeInt(2) // NC_SHORT x2
    o.writeShort(0); o.writeShort(500) // 4 bytes, already aligned
    ncName(o, "_FillValue"); o.writeInt(3); o.writeInt(1) // NC_SHORT x1
    o.writeShort(-1); o.writeShort(0) // value + 2 pad bytes
    o.writeInt(3) // nc_type NC_SHORT
    o.writeInt(24) // vsize: 12 values x 2 bytes
    o.writeInt(begin.toInt) // CDF-1: 4-byte begin
  } { o =>
    Seq(10, 20, 30, -1, 50, 60, 70, -1, 90, 100, 110, 120).foreach(o.writeShort)
  }

  /** CDF-2 (8-byte begin), record dim: time(rec) x y=2 x x=2, lone
    * NC_FLOAT record variable over 3 records. */
  private lazy val fix2: Array[Byte] = cdfBytes { (o, begin) =>
    o.write(Array[Byte]('C', 'D', 'F', 2))
    o.writeInt(3) // numrecs
    o.writeInt(0x0A); o.writeInt(3)
    ncName(o, "time"); o.writeInt(0) // 0 = record dim
    ncName(o, "y"); o.writeInt(2)
    ncName(o, "x"); o.writeInt(2)
    o.writeInt(0); o.writeInt(0)
    o.writeInt(0x0B); o.writeInt(1)
    ncName(o, "rr")
    o.writeInt(3); o.writeInt(0); o.writeInt(1); o.writeInt(2)
    o.writeInt(0); o.writeInt(0) // no var attrs
    o.writeInt(5) // NC_FLOAT
    o.writeInt(16) // vsize of one record slab
    o.writeLong(begin) // CDF-2: 8-byte begin
  } { o =>
    (0 until 12).foreach(i => o.writeFloat(i * 1.5f))
  }

  test("NetCDF header parse: dims, attrs, type, begin recovered from spec-built bytes") {
    val hdr = sources.Netcdf.parseHeader(fix1)
    assert(hdr.version == 1 && hdr.numRecs == 0)
    assert(hdr.dims.map(d => (d.name, d.length)) == Seq(("t", 2), ("y", 2), ("x", 3)))
    val v = hdr.vars.head
    assert(v.name == "temperature" && v.ncType == 3 && !v.isRecord)
    assert(v.attrs("valid_range").values.toSeq == Seq(0.0, 500.0))
    assert(v.attrs("_FillValue").values.toSeq == Seq(-1.0))
    assert(sources.Netcdf.readVar(fix1, hdr, v).toSeq ==
      Seq(10, 20, 30, -1, 50, 60, 70, -1, 90, 100, 110, 120).map(_.toDouble))
  }

  test("NetCDF readGrid: long table with fill->NULL and valid_range scaling downstream") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_nc")
    java.nio.file.Files.write(dir.resolve("temp_20201106T120000Z.nc"), fix1)
    try {
      val grid = sources.Netcdf.readGrid(spark, s"$dir/*.nc", "temperature")
        .withColumn("value", sources.Netcdf.decodedValue)
      val rows = grid.orderBy("t", "y", "x").collect()
      assert(rows.length == 12)
      // fills at flat idx 3 (t0,y1,x0) and 7 (t1,y0,x1) decode to NULL
      assert(rows(3).isNullAt(rows(3).fieldIndex("value")))
      assert(rows(7).isNullAt(rows(7).fieldIndex("value")))
      // others scale by the file's own valid_range: raw/500
      assert(math.abs(rows(0).getAs[Double]("value") - 10.0 / 500) < 1e-12)
      assert(math.abs(rows(11).getAs[Double]("value") - 120.0 / 500) < 1e-12)
      assert(rows.forall(_.getAs[String]("path").endsWith(".nc")))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }

  test("NetCDF CDF-2 record variable: record dim becomes t, slabs in order") {
    val hdr = sources.Netcdf.parseHeader(fix2)
    assert(hdr.version == 2 && hdr.numRecs == 3)
    assert(hdr.vars.head.isRecord && hdr.recSize == 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_nc2")
    java.nio.file.Files.write(dir.resolve("rr.nc"), fix2)
    try {
      val got = sources.Netcdf.readGrid(spark, s"$dir/*.nc", "rr")
        .orderBy("t", "y", "x").collect()
      assert(got.length == 12)
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Double]("raw") == i * 1.5, s"cell $i")
        assert(r.getAs[Long]("t") == i / 4)
      }
      // no valid_range/_FillValue attrs -> decodedValue passes raw through
      import org.apache.spark.sql.functions._
      val passthrough = sources.Netcdf.readGrid(spark, s"$dir/*.nc", "rr")
        .withColumn("value", sources.Netcdf.decodedValue)
        .where(col("value") =!= col("raw")).count()
      assert(passthrough == 0)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }

  test("NetCDF writer reproduces the hand-built spec fixture BYTE-FOR-BYTE") {
    // fix1 was written field-by-field from the format spec; if
    // writeGrid3 emits identical bytes for the same logical content,
    // writer and reader are pinned to the spec independently — they
    // cannot drift together
    val b = new java.io.ByteArrayOutputStream()
    sources.Netcdf.writeGrid3(b, "temperature", 2, 2, 3,
      Array(10, 20, 30, -1, 50, 60, 70, -1, 90, 100, 110, 120).map(_.toDouble),
      ncType = sources.Netcdf.NcShort,
      validRange = Some((0.0, 500.0)), fillValue = Some(-1.0))
    assert(b.toByteArray.sameElements(fix1), "writer output != spec-built fixture bytes")
  }

  test("NetCDF writer NC_DOUBLE round-trip through the reader") {
    val vals = Array.tabulate(2 * 3 * 4)(i => i * 0.25 - 1.5)
    val b = new java.io.ByteArrayOutputStream()
    sources.Netcdf.writeGrid3(b, "rr", 2, 3, 4, vals, ncType = sources.Netcdf.NcDouble,
      validRange = Some((-2.0, 6.0)), fillValue = Some(-999.0))
    val hdr = sources.Netcdf.parseHeader(b.toByteArray)
    val v = hdr.vars.head
    assert(v.ncType == sources.Netcdf.NcDouble)
    assert(v.attrs("valid_range").values.toSeq == Seq(-2.0, 6.0))
    assert(v.attrs("_FillValue").values.toSeq == Seq(-999.0))
    assert(sources.Netcdf.readVar(b.toByteArray, hdr, v).sameElements(vals))
  }

  test("NetCDF per-key sink: one parseable .nc per key, absent cells take the fill value") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ncsink")
    try {
      val df = Seq(
        ("a", 0, 0, 0, 7.0), ("a", 0, 0, 1, 8.0), ("a", 0, 1, 0, 9.0), ("a", 0, 1, 1, 10.0),
        ("b", 0, 0, 0, 1.0), ("b", 1, 1, 1, 2.0)
      ).toDF("k", "t", "y", "x", "v")
      sources.Netcdf.writeFrames(df, dir.toString, "k", "t", "y", "x", "v",
        h = 2, w = 2, varName = "rr", validRange = Some((0.0, 100.0)),
        fillValue = Some(-1.0))
      val grid = sources.Netcdf.readGrid(spark, s"$dir/*.nc", "rr")
      val back = grid.orderBy("path", "t", "y", "x").collect()
      assert(back.length == 4 + 8, s"a: 1x2x2 cells + b: 2x2x2 cells, got ${back.length}")
      val bCells = back.filter(_.getAs[String]("path").endsWith("b.nc"))
        .map(r => (r.getAs[Long]("t"), r.getAs[Long]("y"), r.getAs[Long]("x")) -> r.getAs[Double]("raw")).toMap
      assert(bCells((0L, 0L, 0L)) == 1.0 && bCells((1L, 1L, 1L)) == 2.0)
      assert(bCells((0L, 1L, 1L)) == -1.0, "absent cell takes the declared fill value")
      // and the fill decodes to NULL downstream, like the reference's mask
      val nulls = grid.withColumn("value", sources.Netcdf.decodedValue)
        .where(col("value").isNull).count()
      assert(nulls == 6, s"6 absent cells in b.nc must decode to NULL, got $nulls")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }

  test("NetCDF reader is loud on garbage: bad magic and unknown variable throw") {
    intercept[IllegalArgumentException](
      sources.Netcdf.parseHeader("not a netcdf file".getBytes))
    val hdr = sources.Netcdf.parseHeader(fix1)
    assert(hdr.vars.forall(_.name != "no_such_var"))
  }

  test("NetCDF STREAMING numrecs sentinel (0xFFFFFFFF) is rejected at parse, not a NegativeArraySize later") {
    // fix2 with numrecs patched to the streaming sentinel: bytes 4..7
    val streaming = fix2.clone()
    streaming(4) = -1; streaming(5) = -1; streaming(6) = -1; streaming(7) = -1
    val e = intercept[IllegalArgumentException](sources.Netcdf.parseHeader(streaming))
    assert(e.getMessage.contains("STREAMING"), s"expected a loud STREAMING message, got: ${e.getMessage}")
  }

  test("per-key sink rejects null file keys loudly instead of mis-filing rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ncnull")
    try {
      val df = Seq((Some("a"), 0, 0, 0, 1.0), (Option.empty[String], 0, 0, 1, 2.0))
        .toDF("k", "t", "y", "x", "v")
      val e = intercept[Exception] {
        sources.Netcdf.writeFrames(df, dir.toString, "k", "t", "y", "x", "v", h = 1, w = 2)
      }
      // the require surfaces wrapped in SparkException; the root message travels
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("null k value")),
        s"expected the null-key contract message, got: ${msgs(e).mkString(" | ")}")
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); java.nio.file.Files.delete(dir)
    }
  }
}
