package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pure-JVM classic NetCDF (CDF-1 / CDF-2) reader — the ingest twin of
  * the reference's on-disk input path (weather4cast/datasets.py:86-94:
  * `netCDF4.Dataset(..., memory=raw_data)` with `set_auto_scale(False)`
  * then per-variable `valid_range` / `_FillValue` preprocessing).
  * Written from the public NetCDF Classic Format Specification
  * (magic `CDF\x01`/`CDF\x02`, big-endian, 4-byte-aligned tagged
  * lists); NetCDF-4 `.nc` files are HDF5 containers and route to
  * [[Hdf5Nc]]'s generic spec-walk — [[readGrid]] sniffs the magic,
  * so ONE API reads both on-disk generations.
  *
  * Split exactly like the reference: this layer only DECODES — raw
  * integer/float payloads plus the `valid_range`/`_FillValue` attrs —
  * and the numeric preprocessing (min-max scale N1, fill-to-NULL P3,
  * conditional mean-impute A1) stays in the existing column operators,
  * so one codepath serves parquet-packed and NetCDF inputs alike.
  *
  * Scale shape of [[readGrid]]: a `binaryFile` scan (one task per
  * file, the same per-file working set the reference holds) followed
  * by a flatMap into the repo-standard long table — embarrassingly
  * parallel, no shuffle; all downstream pruning/aggregation runs on
  * columnar rows. Imperative byte parsing sits in `mapPartitions` for
  * the same reason [[graft.ops.Multimodal]]'s container sniffing does:
  * a spec-driven cursor walk has no Catalyst equivalent.
  */
object Netcdf {

  /** nc_type codes from the spec (public: [[writeGrid3]] takes one). */
  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  private def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"unsupported nc_type $other")
  }

  final case class Dim(name: String, length: Int) { def isRecord: Boolean = length == 0 }
  final case class Attr(name: String, ncType: Int, values: Array[Double], text: String)
  final case class Var(name: String, ncType: Int, dims: Seq[Dim], attrs: Map[String, Attr],
                       vsize: Long, begin: Long) {
    def isRecord: Boolean = dims.headOption.exists(_.isRecord)
    /** Per-record (record var) or total (fixed var) element count. */
    def sliceElems: Long = dims.drop(if (isRecord) 1 else 0)
      .foldLeft(1L)((a, d) => a * d.length)
  }
  final case class Header(version: Int, numRecs: Int, dims: Seq[Dim], vars: Seq[Var],
                          recSize: Long)

  /** Parse the header of a classic NetCDF byte image. */
  def parseHeader(bytes: Array[Byte]): Header = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bytes.length >= 8 && bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F',
      "not a classic NetCDF file (missing CDF magic); for NetCDF-4/HDF5 containers use Hdf5Nc or readGrid, which routes by magic")
    val version = bytes(3).toInt
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    bb.position(4)
    val numRecs = bb.getInt()
    // 0xFFFFFFFF is the spec's STREAMING sentinel, not a count — a
    // reader that treats it as one surfaces an opaque
    // NegativeArraySizeException deep in readVar. Reject loudly here.
    require(numRecs >= 0,
      s"numrecs $numRecs: STREAMING (0xFFFFFFFF) / negative record counts " +
        "are not supported — the file was written by an interrupted or " +
        "streaming writer; re-write it with a fixed record count")

    def name(): String = {
      val n = bb.getInt()
      val s = new String(bytes, bb.position(), n, "UTF-8")
      bb.position(bb.position() + ((n + 3) / 4) * 4) // names pad to 4
      s
    }
    def taggedCount(expectTag: Int): Int = {
      val tag = bb.getInt(); val n = bb.getInt()
      require(tag == expectTag || (tag == 0 && n == 0),
        s"malformed list: tag $tag count $n (expected tag $expectTag)")
      n
    }
    def attrList(): Map[String, Attr] = {
      (0 until taggedCount(0x0C)).map { _ =>
        val nm = name(); val t = bb.getInt(); val n = bb.getInt()
        val start = bb.position()
        val raw = new Array[Double](if (t == NcChar) 0 else n)
        var i = 0
        while (i < raw.length) {
          raw(i) = t match {
            case NcByte => bb.get().toDouble
            case NcShort => bb.getShort().toDouble
            case NcInt => bb.getInt().toDouble
            case NcFloat => bb.getFloat().toDouble
            case NcDouble => bb.getDouble()
          }
          i += 1
        }
        val text = if (t == NcChar) new String(bytes, start, n, "UTF-8") else ""
        bb.position(start + ((n * typeSize(t) + 3) / 4) * 4) // values pad to 4
        nm -> Attr(nm, t, raw, text)
      }.toMap
    }

    val dims = (0 until taggedCount(0x0A)).map(_ => Dim(name(), bb.getInt()))
    attrList() // global attrs: parsed for cursor correctness, not used
    val vars = (0 until taggedCount(0x0B)).map { _ =>
      val nm = name()
      val vdims = (0 until bb.getInt()).map(_ => dims(bb.getInt()))
      val attrs = attrList()
      val t = bb.getInt()
      val vsize = bb.getInt().toLong & 0xFFFFFFFFL
      val begin = if (version == 2) bb.getLong() else bb.getInt().toLong & 0xFFFFFFFFL
      Var(nm, t, vdims, attrs, vsize, begin)
    }
    // spec: record slab stride = sum of record vars' vsize, EXCEPT a
    // lone record variable, whose slices pack without padding
    val recVars = vars.filter(_.isRecord)
    val recSize =
      if (recVars.length == 1) recVars.head.sliceElems * typeSize(recVars.head.ncType)
      else recVars.map(_.vsize).sum
    Header(version, numRecs, dims, vars, recSize)
  }

  /** Decode one variable to doubles in row-major dim order (record dim
    * outermost, `numRecs` slabs). No scaling, no fill substitution —
    * the reference's `set_auto_scale(False)` contract. */
  def readVar(bytes: Array[Byte], hdr: Header, v: Var): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val slice = v.sliceElems
    val nSlices = if (v.isRecord) hdr.numRecs else 1
    require(slice * nSlices <= Int.MaxValue, s"variable ${v.name} too large for one array")
    val out = new Array[Double]((slice * nSlices).toInt)
    var s = 0
    while (s < nSlices) {
      bb.position((v.begin + (if (v.isRecord) s * hdr.recSize else 0L)).toInt)
      var i = 0
      while (i < slice) {
        out(s * slice.toInt + i) = v.ncType match {
          case NcByte => bb.get().toDouble
          case NcShort => bb.getShort().toDouble
          case NcInt => bb.getInt().toDouble
          case NcFloat => bb.getFloat().toDouble
          case NcDouble => bb.getDouble()
          case NcChar => (bb.get() & 0xFF).toDouble
        }
        i += 1
      }
      s += 1
    }
    out
  }

  /** S2 over NetCDF: scan `pathGlob` as binary files and emit the
    * repo-standard long grid for `varName` — one row per cell:
    * `(path, t, y, x, raw, valid_lo, valid_hi, fill_value)` with the
    * trailing two dims mapped to (y, x), an optional third-from-last
    * (or record) dim to t, and 1-/2-d variables zero-padded. `raw` is
    * the unscaled stored value; feed it to the existing operators for
    * the reference's preprocessing (P3 `raw == fill_value` mask, N1
    * `(raw - lo) / (hi - lo)`, A1 mean-impute), e.g. via
    * [[decodedValue]]. */
  def readGrid(spark: SparkSession, pathGlob: String, varName: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (path, bytes) =>
          // one .nc API for both on-disk generations: NetCDF-4 files
          // are HDF5 containers — sniff the magic and route to the
          // generic HDF5 spec-walk; classic CDF-1/2 decodes here
          if (Hdf5Nc.isHdf5(bytes)) Hdf5Nc.gridRows(path, bytes, varName)
          else gridRowsClassic(path, bytes, varName)
        }
      }
      .toDF("path", "t", "y", "x", "raw", "valid_lo", "valid_hi", "fill_value")
  }

  /** Multi-variable S2 scan: the [[readGrid]] long grid plus a `var`
    * column, ALL requested variables decoded in ONE `binaryFile` pass
    * over the files — the reference's static file carries
    * latitude/longitude (+ elevation beside it) and its products can
    * carry several variables (datasets.py:129-162, 182-198); at fleet
    * scale a V-variable read costs one scan, not V. The per-variable
    * header re-parse is noise next to the payload decode. */
  def readGrids(spark: SparkSession, pathGlob: String, varNames: Seq[String]): DataFrame = {
    require(varNames.nonEmpty, "readGrids needs at least one variable name")
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (path, bytes) =>
          varNames.iterator.flatMap { vn =>
            val rows = if (Hdf5Nc.isHdf5(bytes)) Hdf5Nc.gridRows(path, bytes, vn)
                       else gridRowsClassic(path, bytes, vn)
            rows.map { case (p, t, y, x, raw, lo, hi, f) => (p, vn, t, y, x, raw, lo, hi, f) }
          }
        }
      }
      .toDF("path", "var", "t", "y", "x", "raw", "valid_lo", "valid_hi", "fill_value")
  }

  /** One file → long-grid rows for one variable, either `.nc`
    * generation (shared by [[readGrid]]/[[readGrids]] and the
    * `spark.read.format("netcdf")` connector). */
  private[sources] def fileGridRows(path: String, bytes: Array[Byte], varName: String)
      : Iterator[(String, Long, Long, Long, Double, Double, Double, Double)] =
    if (Hdf5Nc.isHdf5(bytes)) Hdf5Nc.gridRows(path, bytes, varName)
    else gridRowsClassic(path, bytes, varName)

  /** Classic CDF-1/2 branch of [[readGrid]]. */
  private def gridRowsClassic(path: String, bytes: Array[Byte], varName: String)
      : Iterator[(String, Long, Long, Long, Double, Double, Double, Double)] = {
    val hdr = parseHeader(bytes)
    val (v, (_, h, w), lo, hi, fill) = classicMeta(path, hdr, varName)
    val data = readVar(bytes, hdr, v)
    for (i <- data.indices.iterator) yield {
      val ti = i / (h * w).toInt; val rem = i % (h * w).toInt
      (path, ti.toLong, (rem / w).toLong, (rem % w).toLong, data(i), lo, hi, fill)
    }
  }

  /** Header-only (t, h, w) + decode attrs for one variable of either
    * `.nc` generation, NO payload read — the no-`raw` path of the
    * netcdf connector's column pruning. */
  private[sources] def gridShape(path: String, bytes: Array[Byte], varName: String)
      : ((Long, Long, Long), Double, Double, Double) =
    if (Hdf5Nc.isHdf5(bytes)) Hdf5Nc.gridShape(path, bytes, varName)
    else {
      val (_, thw, lo, hi, fill) = classicMeta(path, parseHeader(bytes), varName)
      (thw, lo, hi, fill)
    }

  private def classicMeta(path: String, hdr: Header, varName: String)
      : (Var, (Long, Long, Long), Double, Double, Double) = {
    val v = hdr.vars.find(_.name == varName).getOrElse(
      throw new IllegalArgumentException(
        s"$path has no variable '$varName'; has ${hdr.vars.map(_.name).mkString(", ")}"))
    val shape = (if (v.isRecord) hdr.numRecs +: v.dims.tail.map(_.length)
                 else v.dims.map(_.length)).map(_.toLong)
    val (t, h, w) = shape.reverse.padTo(3, 1L).take(3) match {
      case Seq(wd, ht, tm) => (tm, ht, wd)
    }
    require(shape.product == t * h * w,
      s"${v.name}: rank-${shape.length} shape ${shape.mkString("x")} needs >3-d flattening")
    val vr = v.attrs.get("valid_range").map { a =>
      require(a.values.length >= 2,
        s"$path ${v.name}: valid_range attr must carry >=2 numeric values, " +
          s"got ${a.values.length} (nc_type ${a.ncType}" +
          (if (a.ncType == NcChar) ", char-typed attrs have none" else "") + ")")
      a.values
    }
    val fill = v.attrs.get("_FillValue").map { a =>
      require(a.values.nonEmpty,
        s"$path ${v.name}: _FillValue attr must carry a numeric value, " +
          s"got none (nc_type ${a.ncType})")
      a.values(0)
    }
    (v, (t, h, w), vr.map(_(0)).getOrElse(Double.NaN),
      vr.map(_(1)).getOrElse(Double.NaN), fill.getOrElse(Double.NaN))
  }

  /** The reference's preprocess as one column (datasets.py:58-71 minus
    * the per-variable mean-impute, which is A1's job): fill cells →
    * NULL, others min-max scaled to [0, 1] by the file's own
    * `valid_range`. NaN attr sentinels (absent attrs) pass raw through. */
  def decodedValue: org.apache.spark.sql.Column =
    when(col("raw") === col("fill_value"), lit(null).cast("double"))
      .otherwise(when(isnan(col("valid_lo")), col("raw"))
        .otherwise((col("raw") - col("valid_lo")) / (col("valid_hi") - col("valid_lo"))))

  // ---- writer: the read path's exact inverse ------------------------

  /** Write one rank-3 variable as a classic CDF-1 file (CDF-2 only
    * buys >2 GiB offsets — a per-key frame file never needs them):
    * fixed dims (t, y, x), optional `valid_range`/`_FillValue` attrs
    * (NC_SHORT attr values for an NC_SHORT variable, as the reference
    * files carry), big-endian, 4-byte aligned. `ncType` 3 (short) or
    * 6 (double); values are truncated to the target type unchecked
    * for doubles, range-checked for shorts. The layout decisions
    * (attr order, name padding, vsize) match SourcesSpec's
    * hand-built from-the-spec fixture byte-for-byte — asserted there,
    * so writer and reader cannot drift together. */
  def writeGrid3(out: java.io.OutputStream, varName: String, t: Int, h: Int, w: Int,
                 data: Array[Double], ncType: Int = NcShort,
                 validRange: Option[(Double, Double)] = None,
                 fillValue: Option[Double] = None,
                 dimNames: (String, String, String) = ("t", "y", "x")): Unit = {
    require(t > 0 && h > 0 && w > 0, s"dims must be positive, got ($t,$h,$w)")
    require(data.length == t * h * w, s"data length ${data.length} != t*h*w = ${t * h * w}")
    require(ncType == NcShort || ncType == NcDouble,
      s"writer supports NC_SHORT (3) and NC_DOUBLE (6), got $ncType")
    if (ncType == NcShort) data.foreach(v =>
      require(v >= Short.MinValue && v <= Short.MaxValue && v == v.toShort.toDouble,
        s"value $v not representable as NC_SHORT"))

    def headerBytes(begin: Long): java.io.ByteArrayOutputStream = {
      val b = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(b)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.write(s.getBytes("US-ASCII"))
        (0 until ((4 - s.length % 4) % 4)).foreach(_ => o.writeByte(0))
      }
      def shortAttr(nm: String, vs: Seq[Double]): Unit = {
        name(nm); o.writeInt(NcShort); o.writeInt(vs.length)
        vs.foreach(v => o.writeShort(v.toInt))
        if (vs.length % 2 == 1) o.writeShort(0) // pad values to 4
      }
      def doubleAttr(nm: String, vs: Seq[Double]): Unit = {
        name(nm); o.writeInt(NcDouble); o.writeInt(vs.length)
        vs.foreach(o.writeDouble) // 8-byte values are always aligned
      }
      o.write(Array[Byte]('C', 'D', 'F', 1))
      o.writeInt(0) // numrecs: fixed dims only
      o.writeInt(0x0A); o.writeInt(3)
      name(dimNames._1); o.writeInt(t)
      name(dimNames._2); o.writeInt(h)
      name(dimNames._3); o.writeInt(w)
      o.writeInt(0); o.writeInt(0) // no global attrs
      o.writeInt(0x0B); o.writeInt(1)
      name(varName)
      o.writeInt(3); o.writeInt(0); o.writeInt(1); o.writeInt(2)
      val nAttrs = validRange.size + fillValue.size
      if (nAttrs == 0) { o.writeInt(0); o.writeInt(0) }
      else {
        o.writeInt(0x0C); o.writeInt(nAttrs)
        val attr: (String, Seq[Double]) => Unit =
          if (ncType == NcShort) shortAttr else doubleAttr
        validRange.foreach { case (lo, hi) => attr("valid_range", Seq(lo, hi)) }
        fillValue.foreach(f => attr("_FillValue", Seq(f)))
      }
      o.writeInt(ncType)
      val width = typeSize(ncType)
      o.writeInt(((data.length * width + 3) / 4) * 4) // vsize, padded
      o.writeInt(begin.toInt)
      b
    }
    val hdrLen = headerBytes(0L).size().toLong
    val b = headerBytes(hdrLen)
    val o = new java.io.DataOutputStream(b)
    if (ncType == NcShort) {
      data.foreach(v => o.writeShort(v.toInt))
      if (data.length % 2 == 1) o.writeShort(0) // data padded to 4
    } else data.foreach(o.writeDouble)
    b.writeTo(out)
  }

  /** Per-key NetCDF sink, the `.nc` twin of
    * [[Sinks.writeHdf5Frames]]: one `.nc` file per `fileKey` holding
    * that key's (T, h, w) grid, written with the driver's Hadoop
    * configuration via a task-attempt temp path + rename. Format
    * fidelity matches the read side's two generations: classic CDF-1
    * by default, or NetCDF-4 (HDF5 container with chunked+deflate
    * int16 + attr messages, [[Hdf5.writeGridNc]]) with
    * `netcdf4 = true` — [[readGrid]] sniffs and decodes either
    * identically. Same distribution shape: one hash repartition on
    * the key, sorted within partitions, one file's array in memory
    * at a time. */
  def writeFrames(df: DataFrame, outDir: String, fileKey: String,
                  tCol: String, yCol: String, xCol: String, valueCol: String,
                  h: Int, w: Int, varName: String = "data",
                  validRange: Option[(Double, Double)] = None,
                  fillValue: Option[Double] = None,
                  netcdf4: Boolean = false): Unit =
    Sinks.writeKeyedFiles(df, outDir, fileKey, tCol, yCol, xCol, valueCol, ".nc") {
      (out, tDim, cells) =>
        val arr = Array.fill(tDim * h * w)(fillValue.getOrElse(0.0))
        cells.foreach { case (t, y, x, v) =>
          require(y >= 0 && y < h && x >= 0 && x < w,
            s"coordinate ($t,$y,$x) outside (*, $h, $w)")
          arr(t * h * w + y * w + x) = v
        }
        if (netcdf4)
          Hdf5.writeGridNc(out, varName, tDim, h, w, arr,
            validRange = validRange, fillValue = fillValue)
        else
          writeGrid3(out, varName, tDim, h, w, arr,
            validRange = validRange, fillValue = fillValue)
    }
}
