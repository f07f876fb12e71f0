package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for `.nc` files (both generations — classic
  * CDF and NetCDF-4/HDF5, routed by magic like [[Netcdf.readGrid]]):
  *
  * {{{
  * spark.read.format("netcdf")
  *   .option("vars", "temperature,crr_intensity")   // or option("var", ...)
  *   .load("/data/region=EU/&#42;.nc")   // globs and directories both work
  * }}}
  *
  * Same long-grid schema as [[Netcdf.readGrids]]. One input partition
  * per file — at fleet scale the scan parallelizes over files exactly
  * like `binaryFile`, with no driver-side decode. Column pruning is
  * pushed into the decoder: a projection that never touches `raw`
  * (e.g. catalogs over `path`/`var`/`t` or attr audits) skips the
  * payload decode (chunk walk + inflate) entirely and answers from
  * the file HEADER — the S1-catalog-over-S2-files pattern costs
  * header reads, not data reads.
  */
class NetcdfSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "netcdf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = NetcdfSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new NetcdfTable(properties.asScala.toMap)
}

object NetcdfSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("var", StringType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("raw", DoubleType, nullable = false),
    StructField("valid_lo", DoubleType, nullable = false),
    StructField("valid_hi", DoubleType, nullable = false),
    StructField("fill_value", DoubleType, nullable = false)))

  private[sources] def varsOf(options: Map[String, String]): Seq[String] = {
    val opts = options.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val spec = opts.get("vars").orElse(opts.get("var")).getOrElse(
      throw new IllegalArgumentException(
        """the netcdf source needs .option("vars", "a,b,...") (or "var")"""))
    val names = spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, s"no variable names in vars='$spec'")
    names
  }

  private[sources] def pathsOf(options: Map[String, String]): Seq[String] = {
    val opts = options.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    // DSv2 passes .load(p) as "path"; .load(p1, p2) as JSON "paths"
    val single = opts.get("path").toSeq
    val multi = opts.get("paths").toSeq.flatMap { js =>
      js.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
    }
    val all = (single ++ multi).filter(_.nonEmpty)
    require(all.nonEmpty, "the netcdf source needs a load path")
    all
  }
}

private class NetcdfTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"netcdf(${NetcdfSource.pathsOf(options).mkString(",")})"
  override def schema(): StructType = NetcdfSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(options ++ caseInsensitive.asScala)
}

private class NetcdfScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NetcdfSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new NetcdfScan(options, required)
}

private class NetcdfScan(options: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"netcdf vars=${NetcdfSource.varsOf(options).mkString(",")} " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // driver side: glob + expand directories, one partition per file
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val files = NetcdfSource.pathsOf(options).flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty[FileStatus])
      require(matched.nonEmpty, s"netcdf source: no files match '$p'")
      matched.flatMap {
        case d if d.isDirectory => fs.listStatus(d.getPath).toSeq.filter(_.isFile)
        case f => Seq(f)
      }
    }
    files.map(f => NetcdfInputPartition(f.getPath.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(NetcdfSource.varsOf(options), required.fieldNames)
}

private case class NetcdfInputPartition(file: String) extends InputPartition

private class NetcdfReaderFactory(vars: Seq[String], fieldNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NetcdfPartitionReader(partition.asInstanceOf[NetcdfInputPartition].file, vars, fieldNames)
}

private class NetcdfPartitionReader(file: String, vars: Seq[String], fieldNames: Array[String])
    extends PartitionReader[InternalRow] {
  // executor side: default Hadoop conf resolves file:// and plain-path
  // URIs; cluster-specific FS conf rides spark.hadoop.* into executors
  private lazy val bytes: Array[Byte] = {
    val hp = new Path(file)
    val fs = hp.getFileSystem(new Configuration())
    val in = fs.open(hp)
    try {
      val len = fs.getFileStatus(hp).getLen
      require(len <= Int.MaxValue, s"$file: ${len}B exceeds one-buffer decode")
      val buf = new Array[Byte](len.toInt)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
  // pruning reaches the DECODER: no `raw` in the projection -> answer
  // from the header walk alone (no chunk decode / inflate)
  private val needData = fieldNames.contains("raw")
  private val pathU = UTF8String.fromString(file)

  private val rows: Iterator[InternalRow] = vars.iterator.flatMap { vn =>
    val vnU = UTF8String.fromString(vn)
    val cells: Iterator[(Long, Long, Long, Double, Double, Double, Double)] =
      if (needData) {
        Netcdf.fileGridRows(file, bytes, vn)
          .map { case (_, t, y, x, raw, lo, hi, f) => (t, y, x, raw, lo, hi, f) }
      } else {
        val (dims, lo, hi, f) = Netcdf.gridShape(file, bytes, vn)
        val (t, h, w) = (dims._1, dims._2, dims._3)
        for {
          ti <- (0L until t).iterator
          yi <- 0L until h
          xi <- 0L until w
        } yield (ti, yi, xi, 0.0, lo, hi, f)
      }
    cells.map { case (t, y, x, raw, lo, hi, f) =>
      InternalRow.fromSeq(fieldNames.toSeq.map {
        case "path" => pathU
        case "var" => vnU
        case "t" => t
        case "y" => y
        case "x" => x
        case "raw" => raw
        case "valid_lo" => lo
        case "valid_hi" => hi
        case "fill_value" => f
        case other => throw new IllegalArgumentException(s"unknown column '$other'")
      })
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
