package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string in ONE traversal:
  * `graft_char_ngrams(s, n)` returns the (numChars - n + 1) codepoint
  * n-gram substrings, or an empty array when the string is shorter
  * than n. Identical output to the composed
  * `transform(sequence(0, length(s) - n), i -> substring(s, i + 1, n))`
  * — but that form re-seeks the UTF-8 codepoint boundary from byte 0
  * on EVERY call (substring(s, i, n) is O(i)), making the per-document
  * cost quadratic in length; the LM-score trigram explode spends most
  * of its time there. Here codepoint boundaries are collected once
  * (O(len)) and each gram is a zero-copy byte-range view over one
  * shared byte array, so the whole gram list is O(len).
  *
  * Same disease and same cure as [[NormalizeText]]; the composed twin
  * stays what the DuckDB oracle runs, and ScalarsSpec pins the two
  * equal on real documents. One interpreted call per document
  * (CodegenFallback) — the in-loop boundary walk dominates. */
case class CharNgrams(str: Expression, nExpr: Expression)
  extends Expression with CodegenFallback {

  private lazy val n: Int = nExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType == StringType && nExpr.foldable && nExpr.dataType == IntegerType) {
      // eval() before the Number cast: a NULL integer literal is
      // foldable+IntegerType and would NPE during analysis otherwise
      nExpr.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(
          "graft_char_ngrams: n must be a non-null literal >= 1")
        case v if v.asInstanceOf[Number].intValue() >= 1 => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure("graft_char_ngrams: n must be >= 1")
      }
    } else TypeCheckResult.TypeCheckFailure(
      "graft_char_ngrams(s string, n int literal)")

  override def children: Seq[Expression] = Seq(str, nExpr)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_char_ngrams"

  override def eval(input: InternalRow): Any = {
    val v = str.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String]
    val bytes = s.getBytes // one copy; every gram is a view into it
    val len = bytes.length
    // codepoint boundary byte-offsets in one pass (UTF-8: continuation
    // bytes are 10xxxxxx); offs(numChars) = len sentinel
    val offs = new Array[Int](len + 1)
    var numChars = 0
    var i = 0
    while (i < len) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(numChars) = i; numChars += 1 }
      i += 1
    }
    offs(numChars) = len
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](numChars - n + 1)
    var g = 0
    while (g <= numChars - n) {
      out(g) = UTF8String.fromBytes(bytes, offs(g), offs(g + n) - offs(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(str = newChildren(0), nExpr = newChildren(1))
}
