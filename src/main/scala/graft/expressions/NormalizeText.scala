package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text canonicalization `graft_normalize(s)`: lowercase,
  * strip non-[a-z0-9 ], collapse space runs, trim — exactly
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""),
  * " +", " "))` (the fingerprint normalization the DuckDB oracle
  * mirrors; equality is property-tested in ScalarsSpec), but as ONE
  * char scan instead of two Java-regex passes over every document.
  * Measured at the 10× corpus (50k docs): the regex pair costs 2.6s
  * of t_exact_dedup's 5s; this kernel removes it from the profile —
  * per-doc cost drops under the md5 that follows it.
  *
  * Codegen'd (doGenCode → static kernel call), so it rides inside
  * WholeStageCodegen in the scan stage — the fingerprint groupBy above
  * it was never the bottleneck (0.17s for the same corpus).
  *
  * Equivalence notes, each matching the regex pipeline exactly:
  *  - lowercase via `UTF8String.toLowerCase` — the same code path
  *    Spark's `lower` takes (ASCII fast path, locale-independent
  *    full mappings), so no default-locale divergence;
  *  - the keep-class test runs per UTF-16 code unit; a supplementary
  *    character's two surrogates each fail [a-z0-9 ] just as the
  *    regex's code-point match removes the whole character;
  *  - leading/duplicate/trailing spaces are skipped in the same pass
  *    (" +" collapse + trim only ever touch 0x20, same as here). */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects a string argument, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormalizeText.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** The kernel; public static for generated code. Lowercasing goes
    * through `UTF8String.toLowerCase` — the exact code path Spark's
    * `lower` uses (ASCII fast path, then locale-independent full
    * mapping) — rather than `String.toLowerCase()`, whose
    * default-locale behavior diverges on a tr/az JVM ('I' → 'ı'). */
  def normalize(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val n = lowered.length
    val buf = new Array[Char](n)
    var o = 0
    var i = 0
    while (i < n) {
      val c = lowered.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) { buf(o) = c; o += 1 }
      else if (c == ' ' && o > 0 && buf(o - 1) != ' ') { buf(o) = ' '; o += 1 }
      i += 1
    }
    if (o > 0 && buf(o - 1) == ' ') o -= 1
    UTF8String.fromString(new String(buf, 0, o))
  }
}
