package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE per-row expression:
  * `graft_minhash_slices(tokens, shingleK, seeds)` returns the
  * `seeds`-component signature (array<string>, each component an
  * 8-hex-char 32-bit md5 slice), or NULL when the document has fewer
  * than `shingleK` tokens.
  *
  * Semantically identical to the composed pipeline the DuckDB oracle
  * runs — explode k-shingles, `substring(md5(shingle), 8*(s%4)+1, 8)`
  * per component (group g > 0 salts the shingle with "mh<g>:"), `min`
  * per doc — but evaluated as a tight per-document loop: no shingle
  * row fan-out and, crucially, NO groupBy(doc) shuffle. At corpus
  * scale that deletes a full shuffle of the exploded corpus from
  * every MinHash consumer (signatures, LSH banding, the d_* graded
  * queries); the signature is finished inside the scan stage.
  * [[graft.ops.Dedup.minhashSignatureExploded]] keeps the composed
  * plan as the cross-check, test-asserted equal.
  *
  * Hex comparison note: both engines compare lowercase-hex strings
  * byte-wise (ASCII), so `min` over UTF8String here and VARCHAR there
  * agree. CodegenFallback costs one interpreted call per DOCUMENT
  * (the md5 loop inside dominates); the surrounding stage stays
  * whole-stage-codegen'd.
  */
case class MinHashSlices(tokens: Expression, kExpr: Expression, seedsExpr: Expression)
  extends Expression with CodegenFallback {

  private lazy val shingleK: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val seeds: Int = seedsExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = tokens.dataType match {
    case ArrayType(StringType, _)
      if kExpr.foldable && kExpr.dataType == IntegerType &&
         seedsExpr.foldable && seedsExpr.dataType == IntegerType =>
      if (shingleK >= 1 && seeds >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_minhash_slices: k and seeds must be >= 1")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash_slices(tokens array<string>, k int literal, seeds int literal)")
  }

  override def children: Seq[Expression] = Seq(tokens, kExpr, seedsExpr)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_slices"

  override def eval(input: InternalRow): Any = {
    val arr = tokens.eval(input)
    if (arr == null) return null
    val toks = arr.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < shingleK) return null
    val groups = (seeds + 3) / 4
    val md = MinHashSlices.md5.get()
    // mins(s) = current minimum 8-hex-char slice for component s
    val mins = new Array[String](seeds)
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      // a null token renders as the empty string, matching
      // concat_ws(" ", ...)'s null-skipping only when absent — the
      // tokenizers here (split) never produce null elements
      val t = toks.getUTF8String(i)
      tokBytes(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    var start = 0
    while (start <= n - shingleK) {
      // shingle bytes: tokens joined by 0x20 — identical to
      // concat_ws(" ", t1..tk)
      var len = shingleK - 1
      var j = 0
      while (j < shingleK) { len += tokBytes(start + j).length; j += 1 }
      val shingle = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < shingleK) {
        val tb = tokBytes(start + j)
        System.arraycopy(tb, 0, shingle, off, tb.length)
        off += tb.length
        if (j < shingleK - 1) { shingle(off) = ' '; off += 1 }
        j += 1
      }
      var g = 0
      while (g < groups) {
        md.reset()
        if (g > 0) md.update(s"mh$g:".getBytes("UTF-8"))
        md.update(shingle)
        val hx = MinHashSlices.toHex(md.digest())
        var s = g * 4
        val sEnd = math.min(seeds, s + 4)
        while (s < sEnd) {
          val slice = hx.substring(8 * (s % 4), 8 * (s % 4) + 8)
          if (mins(s) == null || slice.compareTo(mins(s)) < 0) mins(s) = slice
          s += 1
        }
        g += 1
      }
      start += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), kExpr = newChildren(1), seedsExpr = newChildren(2))
}

object MinHashSlices {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** One digest per executor thread, reused across rows (`reset()` per
    * use) — `MessageDigest.getInstance` does a provider lookup + object
    * allocation, measurable when called once per document on the hot
    * signature path. Standard JDK pattern for per-row hashing. */
  private[expressions] val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Lowercase hex of an md5 digest — byte-identical to Spark's and
    * DuckDB's `md5()` rendering. */
  def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
