package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-batched passes.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real; the actual codec is STUBBED with a deterministic fake (this
  * container ships no image/audio libraries): `decodeStub` derives
  * width/height/format from the payload bytes themselves, so tests
  * can assert exact values end-to-end. Swap `decodeStub` for a real
  * codec (JNI/javacv) without touching the pipeline shape.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  final case class Decoded(id: Long, width: Int, height: Int, channels: Int,
                           format: String, byteLen: Int, checksum: Long)

  /** Attach a synthetic binary payload to any table (md5 bytes of the
    * text column) — stands in for real image bytes in tests/queries. */
  def withPayload(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), unhex(md5(col(textCol))).as("payload"))

  /** STUB codec: deterministic "decode" of a payload. A real
    * implementation would parse the container header; the stub derives
    * the same fields from the first bytes so behavior is exact and
    * testable. */
  def decodeStub(id: Long, payload: Array[Byte]): Decoded = {
    val w = (payload(0) & 0xff) % 64 + 1
    val h = (payload(1) & 0xff) % 64 + 1
    val c = (payload(2) & 0xff) % 3 + 1
    val fmt = if ((payload(3) & 1) == 0) "png" else "jpeg"
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff).toLong; i += 1 }
    Decoded(id, w, h, c, fmt, payload.length, sum)
  }

  /** Partition-batched decode: the Scala analog of `mapInPandas` —
    * one iterator pass per partition, constant memory, no per-row
    * driver involvement. This is where a vectorized codec batch
    * (e.g. arrow batches into a native decoder) would slot in. */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[Decoded] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeStub(id, bytes) } }
  }
}
