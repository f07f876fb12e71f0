package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine similarity over two `array<double>` columns: ONE array
  * traversal accumulates a.b, a.a and b.b together, where the
  * composable form — `graft_dot(a,b) / nullif(sqrt(graft_dot(a,a)) *
  * sqrt(graft_dot(b,b)), 0)` — walks the arrays three times (and
  * re-evaluates the array children). On the similarity hot path
  * (brute-force top-k, bucketed ANN rescoring) that is a 3x memory-
  * bandwidth saving per candidate pair.
  *
  * Bit-identical to the composed form: each accumulator sums in the
  * same left-to-right order, sqrt/division are correctly rounded, so
  * the same doubles come out and the DuckDB oracle is unchanged.
  * NULL semantics also mirror it exactly: NULL on length mismatch or
  * any NULL element (null poisons graft_dot), and NULL — not a
  * division error — when either vector has zero norm (the nullif). */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (NumericArray.ok(left.dataType) && NumericArray.ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires two numeric-array arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  @transient private lazy val readX = NumericArray.reader(left.dataType)
  @transient private lazy val readY = NumericArray.reader(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = readX(x, i)
      val yv = readY(y, i)
      ab += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) null else ab / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = ${NumericArray.getter(left.dataType, a, i)};
         |    final double $yv = ${NumericArray.getter(right.dataType, b, i)};
         |    $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = Math.sqrt($aa) * Math.sqrt($bb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $ab / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
