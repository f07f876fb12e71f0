package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term-frequency map as one expression:
  * `graft_word_counts(tokens)` returns `map<term, count>` (empty map
  * for an empty array, NULL for a NULL array).
  *
  * The composed form — explode tokens, groupBy(doc, term) count —
  * shuffles every distinct (doc, term) pair (the per-doc vocabulary
  * x corpus size; map-side combine cannot reduce it because the doc
  * id makes the keys partition-unique). This computes each document's
  * counts where the document row already is, so the TF stage of
  * TF-IDF costs ZERO shuffles; only the corpus-level document-
  * frequency aggregate and the score join still exchange rows.
  * Consumers explode the map to (term, tf) rows — map entry order is
  * unspecified and everything downstream aggregates, so the
  * (doc, term, tf) multiset is the contract (test-asserted equal to
  * the composed form in DotExprSpec). */
case class WordCounts(tokens: Expression)
  extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_word_counts expects array<string>, got ${other.simpleString}")
  }

  override def children: Seq[Expression] = Seq(tokens)
  override def dataType: DataType = MapType(StringType, IntegerType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_word_counts"

  override def eval(input: InternalRow): Any = {
    val arr = tokens.eval(input)
    if (arr == null) return null
    val toks = arr.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Int](n * 2)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) counts.merge(t, 1, (a, b) => a + b)
      i += 1
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0))
}
