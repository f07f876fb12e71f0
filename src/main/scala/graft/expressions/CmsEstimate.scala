package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_estimate(sketch, item)` — probe a serialized
  * count-min sketch (the binary emitted by Spark's built-in
  * `count_min_sketch(col, eps, confidence, seed)` aggregate) for an
  * item's estimated count.
  *
  * The intended shape is heavy-hitter verification at scale: ONE tiny
  * sketch (depth×width longs, ~100 KB) flows to the probe side as a
  * broadcast scalar (`crossJoin(broadcast(sketchDf))`), and this
  * expression probes it per candidate row. The CMS contract —
  * `exact <= estimate <= exact + eps * totalCount` with probability
  * `confidence` per probe — is what the graded query asserts.
  *
  * The deserialized sketch is cached per expression instance keyed on
  * the sketch bytes (content compare, no allocation), so the
  * broadcast-scalar pattern deserializes once per task rather than
  * once per row. The probe side is candidates (top-k, a sample), never
  * the corpus — this is a small-row-count expression by design, so it
  * takes `CodegenFallback` rather than a generated kernel.
  */
case class CmsEstimate(sketch: Expression, item: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = sketch
  override def right: Expression = item
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, item.dataType) match {
      case (BinaryType, IntegerType | LongType | StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_cms_estimate(sketch binary, item int|bigint|string)")
    }

  // single-entry cache: the broadcast-scalar pattern feeds the same
  // sketch bytes to every row of a task; Arrays.equals is a read-only
  // O(len) compare vs readFrom's full-copy allocation per row
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedCms: CountMinSketch = _

  override protected def nullSafeEval(sketchVal: Any, itemVal: Any): Any = {
    val bytes = sketchVal.asInstanceOf[Array[Byte]]
    if ((cachedBytes eq null) || !java.util.Arrays.equals(cachedBytes, bytes)) {
      cachedCms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes.clone()
    }
    val probe: Object = itemVal match {
      case s: UTF8String => s.toString
      case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue()) // sketch hashes longs
      case other => other.asInstanceOf[Object]
    }
    cachedCms.estimateCount(probe)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, item = newRight)
}
