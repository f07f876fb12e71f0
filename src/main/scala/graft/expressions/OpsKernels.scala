package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for two operator hot paths whose higher-order-
  * function forms are structurally slow, not just interpreted-slow:
  *
  *  - dense mat-vec ([[MatVecExpr]]): the HOF double fold interprets
  *    dim² expression nodes per row — at dim 64 that is 4096 node
  *    evals per corpus row per scan (measured: the OPQ refinement
  *    spent ~50 s of its 54 s there at sf0.1);
  *  - best-fit-decreasing bin packing ([[BfdAssignExpr]]): the
  *    `aggregate` fold must COPY its growing accumulator array once
  *    per element (Catalyst accumulators are immutable), turning the
  *    per-shard assignment into O(n²) copies — measured slope 27 at
  *    x10 where the algorithm itself is O(n·bins).
  *
  * Both run the identical arithmetic/tie-break spec as their HOF
  * twins (spec-asserted), as one tight JVM loop per row. The loops
  * live here as static kernels so the generated code (doGenCode —
  * full whole-stage-codegen participation, no interpreted-call
  * wrapper per row) and the interpreted path (eval) share one body. */
object OpsKernels {

  /** y_i = Σ_j rflat[i·n + j] · x_j, n = len(x); requires
    * len(rflat) == n² — a mis-dimensioned rotation throws (a silent
    * NULL here yields empty search results downstream, contrary to
    * the fail-loudly convention for half-built stores). */
  def matvec(r: ArrayData, v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (r.numElements() != n.toLong * n)
      throw new IllegalArgumentException(
        s"graft_matvec: len(rflat)=${r.numElements()} != len(x)^2 for len(x)=$n")
    val xs = v.toDoubleArray()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      val base = i * n
      var j = 0
      while (j < n) { acc += r.getDouble(base + j) * xs(j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Best-fit-decreasing assignment over PRE-SORTED (negn, doc_id,
    * n_tokens) triples — see [[BfdAssignExpr]] for the spec. */
  def bfdAssign(da: ArrayData, bud: Long): ArrayData = {
    val n = da.numElements()
    val bins = new java.util.ArrayList[Long]()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = da.getStruct(i, 3)
      val docId = row.getLong(1)
      val need = row.getLong(2)
      // best fit: least remaining capacity that fits, lowest index tie
      var best = -1
      var bestRem = Long.MaxValue
      var k = 0
      val nb = bins.size()
      while (k < nb) {
        val rem = bins.get(k)
        if (rem >= need && rem < bestRem) { best = k; bestRem = rem }
        k += 1
      }
      val pack =
        if (best >= 0) { bins.set(best, bestRem - need); best }
        else { bins.add(math.max(bud - need, 0L)); nb }
      out(i) = InternalRow(docId, pack.toLong)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_matvec(rflat, x)` → array<double>: y_i = Σ_j
  * rflat[i*n + j] · x_j for n = len(x); requires len(rflat) == n²
  * (throws otherwise — null only for null INPUTS). The flattened
  * matrix usually arrives as a plan literal (a broadcast-with-the-
  * plan model artifact — the OPQ rotation). */
case class MatVecExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_matvec(rflat, x) needs two array<double> arguments")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_matvec"

  override def nullSafeEval(r: Any, v: Any): Any =
    OpsKernels.matvec(r.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.OpsKernels.matvec($a, $b);")
}

/** `graft_bfd_assign(ds, budget)` →
  * array<struct<doc_id: bigint, pack_id: bigint>> — best-fit-
  * decreasing bin assignment over a PRE-SORTED
  * array<struct<negn, doc_id, n_tokens>> (the caller sorts by
  * (-n_tokens, doc_id), i.e. count DESC / doc ASC): each doc goes to
  * the open bin with the LEAST remaining capacity that still fits
  * (lowest bin index on ties); no fit opens a new bin with capacity
  * max(budget - n, 0) — an over-budget doc takes a bin alone and
  * closes it. One JVM loop, O(docs × bins) with mutable bin state —
  * the shape the immutable Catalyst fold cannot express without
  * quadratic accumulator copies. */
case class BfdAssignExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(st: StructType, _) if st.length == 3 &&
        st.fields.forall(_.dataType == LongType) && right.foldable &&
        right.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_bfd_assign(ds, budget) needs array<struct<negn:bigint,doc_id:bigint," +
        "n_tokens:bigint>> and a literal bigint budget")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType), StructField("pack_id", LongType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bfd_assign"

  override def nullSafeEval(d: Any, b: Any): Any =
    OpsKernels.bfdAssign(d.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.OpsKernels.bfdAssign($a, $b);")
}
