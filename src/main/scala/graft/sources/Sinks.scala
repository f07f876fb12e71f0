package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.scalars

/** S8: partitioned encode sink — the Spark form of the reference's
  * per-(region, day) uint16 gzip HDF5 submission writer
  * (weather4cast/datasets.py:455-459, scaling table 379-384).
  *
  * Values are encoded back to quantized integers (N2) and written as
  * gzip parquet partitioned by the given keys — partition pruning on
  * read replaces the reference's hand-built per-day paths.
  */
object Sinks {

  /** Encode `valueCol` via inverse min-max scaling + quantize, write
    * partitioned gzip parquet. `partitionCols` become directory-level
    * partition columns (Hive layout). */
  def writeEncoded(df: DataFrame, out: String, valueCol: String,
                   lo: Double, hi: Double, partitionCols: Seq[String]): Unit =
    df.withColumn(valueCol + "_enc",
        scalars.minmaxEncode(col(valueCol), lo, hi))
      .drop(valueCol)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("compression", "gzip")
      .parquet(out)

  /** Round-trip read: decode back to the value domain. */
  def readEncoded(spark: org.apache.spark.sql.SparkSession, path: String,
                  valueCol: String, lo: Double, hi: Double): DataFrame =
    spark.read.parquet(path)
      .withColumn(valueCol, scalars.minmaxDecode(col(valueCol + "_enc").cast("double"), lo, hi))
      .drop(valueCol + "_enc")

  /** Hadoop `Configuration` is not `Serializable`; this wrapper ships
    * the DRIVER's session configuration (including `spark.hadoop.*`
    * overrides — s3a credentials, endpoints) into the partition
    * closure via Hadoop's own wire format. A bare
    * `new Configuration()` on the executor would see only classpath
    * XML and silently drop those session settings. */
  private final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** HDF5-format compatibility sink: one `.h5` file per `fileKey`
    * value, each holding dataset `datasetName` = the key's frames as a
    * (T, h, w) uint16 array, chunked per t-slice by [[Hdf5]],
    * deflate-compressed. Readers of the reference's submission files
    * (weather4cast/datasets.py:455-459, dataset name `array`) open
    * these interchangeably — reader-level compatibility; exact bytes
    * differ from h5py, which picks its own chunking.
    *
    * Distribution shape: ONE hash repartition on the file key
    * co-locates each file's rows, a within-partition sort orders them,
    * and each task streams its keys one file at a time — peak executor
    * memory is a single file's array (T·h·w·2 bytes, the same
    * per-file working set the reference holds), regardless of how many
    * files or rows the job writes. Files go through the Hadoop
    * FileSystem API with the DRIVER's configuration (so `outDir` may
    * be any scheme the session is configured for: file://, hdfs://,
    * s3a://), and each file is written to a task-attempt temp path
    * then renamed into place — a retried or speculative task can never
    * leave a half-written `.h5` at the destination (the losing
    * attempt's rename merely overwrites with identical content).
    *
    * T = max(`tCol`)+1 per key; cells (or whole slices) absent from
    * `df` become 0, the dataset's fill. Values outside 0..65535 or
    * coordinates outside (h, w) throw rather than write a
    * silently-wrong file.
    */
  def writeHdf5Frames(df: DataFrame, outDir: String, fileKey: String,
                      tCol: String, yCol: String, xCol: String, valueCol: String,
                      h: Int, w: Int, datasetName: String = "array",
                      gzipLevel: Int = 9): Unit =
    writeKeyedFiles(df, outDir, fileKey, tCol, yCol, xCol, valueCol, ".h5") {
      (out, tDim, cells) =>
        val arr = new Array[Short](tDim * h * w)
        cells.foreach { case (t, y, x, v) =>
          require(y >= 0 && y < h && x >= 0 && x < w,
            s"coordinate ($t,$y,$x) outside (*, $h, $w)")
          require(v >= 0 && v <= 0xFFFF && v == v.toInt.toDouble,
            s"value $v outside uint16")
          arr(t * h * w + y * w + x) = v.toInt.toShort
        }
        Hdf5.writeUint16(out, datasetName, tDim, h, w, arr, gzipLevel)
    }

  /** Shared per-key file-writing machinery behind [[writeHdf5Frames]]
    * and [[Netcdf.writeFrames]]: hash-repartition on the file key,
    * sort within partitions, stream each key's cells into `writeOne`
    * (receiving T = max t + 1 and the (t, y, x, value) cells), with
    * the driver's Hadoop configuration and temp-path + rename
    * atomicity. Peak memory per task = one file's cells. */
  private[sources] def writeKeyedFiles(
      df: DataFrame, outDir: String, fileKey: String,
      tCol: String, yCol: String, xCol: String, valueCol: String, ext: String)(
      writeOne: (java.io.OutputStream, Int, Seq[(Int, Int, Int, Double)]) => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val confSer = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(fileKey).cast("string").as("_k"), col(tCol).cast("int").as("_t"),
        col(yCol).cast("int").as("_y"), col(xCol).cast("int").as("_x"),
        col(valueCol).cast("double").as("_v"))
      .repartition(col("_k"))
      .sortWithinPartitions("_k", "_t", "_y", "_x")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val conf = confSer.value
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(tc => s"${tc.stageId()}-${tc.taskAttemptId()}").getOrElse("local")
        var key: String = null
        var buf = Vector.empty[(Int, Int, Int, Double)]
        def flush(): Unit = if (key != null && buf.nonEmpty) {
          val tDim = buf.iterator.map(_._1).max + 1
          require(buf.forall(_._1 >= 0), s"negative t index for key $key")
          val dest = new Path(outDir, s"$key$ext")
          val tmp = new Path(outDir, s"_tmp-$attempt-$key$ext")
          val fs = dest.getFileSystem(conf)
          val out = fs.create(tmp, true)
          var ok = false
          try {
            writeOne(out, tDim, buf)
            ok = true
          } finally {
            out.close()
            if (ok) {
              fs.delete(dest, false)
              if (!fs.rename(tmp, dest))
                throw new java.io.IOException(s"rename $tmp -> $dest failed")
            } else fs.delete(tmp, false)
          }
          buf = Vector.empty
        }
        rows.foreach { r =>
          val k = r.getString(0)
          require(k != null,
            s"null $fileKey value: every row must carry a non-null file key " +
              "(a null key has no destination file; filter or fill upstream)")
          if (k != key) { flush(); key = k }
          buf :+= ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
        }
        flush()
      }
  }
}
