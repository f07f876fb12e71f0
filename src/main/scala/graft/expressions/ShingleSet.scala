package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document DISTINCT k-shingle set as one expression:
  * `graft_shingle_set(tokens, k)` returns the document's distinct
  * space-joined k-gram strings (empty array when the doc has fewer
  * than k tokens). Set semantics only — element order is unspecified
  * and consumers (`array_intersect` + `size` in the exact-Jaccard
  * rescore) are order-insensitive, so results match the composed
  * explode -> collect_set(doc) pipeline exactly.
  *
  * The composed form shuffles EVERY distinct shingle row into the
  * per-doc set build; this finishes inside whatever stage already
  * holds the document row (for the rescore: the candidate semi-join
  * stage, already partitioned by doc_id), deleting that shuffle. One
  * interpreted call per document (CodegenFallback); the in-loop
  * hashing dominates. */
case class ShingleSet(tokens: Expression, kExpr: Expression)
  extends Expression with CodegenFallback {

  private lazy val shingleK: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) if kExpr.foldable && kExpr.dataType == IntegerType =>
      if (shingleK >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_shingle_set: k must be >= 1")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingle_set(tokens array<string>, k int literal)")
  }

  override def children: Seq[Expression] = Seq(tokens, kExpr)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_set"

  override def eval(input: InternalRow): Any = {
    val arr = tokens.eval(input)
    if (arr == null) return null
    val toks = arr.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < shingleK) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((n - shingleK + 1) * 2)
    var start = 0
    while (start <= n - shingleK) {
      var s = toks.getUTF8String(start)
      var j = 1
      while (j < shingleK) {
        s = UTF8String.concat(s, ShingleSet.Space, toks.getUTF8String(start + j))
        j += 1
      }
      seen.add(s)
      start += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), kExpr = newChildren(1))
}

object ShingleSet {
  private[expressions] val Space: UTF8String = UTF8String.fromString(" ")
}
