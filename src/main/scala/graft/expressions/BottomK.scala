package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Bounded top-k aggregate: the k SMALLEST values of `child` per
  * group, returned as an array sorted ascending. `child` is typically
  * a struct whose leading fields are the sort keys (negate a numeric
  * to get descending) and whose remaining fields are carried payload —
  * struct ordering is field-by-field, so the array order is the
  * ORDER BY the caller encoded.
  *
  * This is the operator the window form of top-N-per-group cannot
  * give you at scale: `row_number().over(partitionBy(g).orderBy(v))`
  * shuffles and SORTS every input row, clustering by group alone
  * (few/skewed groups -> a handful of tasks sort everything). As a
  * TypedImperativeAggregate the partial state is AT MOST k rows per
  * (group, input partition) — Spark's standard partial/final
  * aggregation then makes the shuffle |groups| x |partitions| x k
  * tiny rows and no full sort ever happens, the same bounded-heap
  * shape every native engine uses for ORDER BY ... LIMIT k per key.
  * (Tie handling: a value equal to the current in-buffer worst is not
  * admitted, so which of several order-identical rows survives is
  * arbitrary — callers wanting deterministic output make the struct a
  * total order, exactly as the window form requires for a stable
  * row_number.)
  *
  * Registered as `graft_bottom_k(expr, k)` by [[GraftExtensions]];
  * see [[graft.ops.TopN.topNPerGroupAgg]] for the DataFrame-level
  * wrapper (reference analog: per-region best-member selection,
  * weather4cast/ensemble.py's per-variable model ranking).
  */
case class BottomK(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_bottom_k: ${child.dataType.simpleString} is not orderable")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_bottom_k: k must be a literal int")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"graft_bottom_k: k must be >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottom_k"

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  /** O(k) bounded insert — k is small by contract (top-N queries);
    * no heap needed below k ~ hundreds. */
  private def insert(buf: ArrayBuffer[Any], v: Any): ArrayBuffer[Any] = {
    if (buf.length < k) buf += InternalRow.copyValue(v)
    else {
      var worst = 0
      var i = 1
      while (i < buf.length) {
        if (ord.gt(buf(i), buf(worst))) worst = i
        i += 1
      }
      if (ord.lt(v, buf(worst))) buf(worst) = InternalRow.copyValue(v)
      buf
    }
  }

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    if (v == null) buf else insert(buf, v)
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.sorted(ord).toArray)

  // partial<->final wire format: the buffer as one unsafe array cell
  // (the same scheme Spark's Collect aggregates use)
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val out = new ArrayBuffer[Any](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      out += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
