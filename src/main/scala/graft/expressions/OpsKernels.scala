package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * twins (spec-asserted), as one tight JVM loop per row.
  */
object OpsKernels

/** `graft_matvec(rflat, x)` → array<double>: y_i = Σ_j
  * rflat[i*n + j] · x_j for n = len(x); requires len(rflat) == n².
  * The flattened matrix usually arrives as a plan literal (a
  * broadcast-with-the-plan model artifact — the OPQ rotation). */
case class MatVecExpr(rflat: Expression, x: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(rflat, x)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(rflat = c(0), x = c(1))

  override def checkInputDataTypes(): TypeCheckResult =
    (rflat.dataType, x.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_matvec(rflat, x) needs two array<double> arguments")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_matvec"

  override def eval(input: InternalRow): Any = {
    val r = rflat.eval(input)
    val v = x.eval(input)
    if (r == null || v == null) return null
    val ra = r.asInstanceOf[ArrayData]
    val va = v.asInstanceOf[ArrayData]
    val n = va.numElements()
    // fail LOUDLY on a mis-dimensioned rotation (e.g. a query vector
    // of the wrong dim through searchRotated): a silent NULL here
    // yields empty search results instead of an error, contrary to
    // the repo's fail-loudly convention for half-built stores
    if (ra.numElements() != n.toLong * n)
      throw new IllegalArgumentException(
        s"graft_matvec: len(rflat)=${ra.numElements()} != len(x)^2 for len(x)=$n")
    val xs = va.toDoubleArray()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0.0
      val base = i * n
      var j = 0
      while (j < n) { acc += ra.getDouble(base + j) * xs(j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
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
case class BfdAssignExpr(ds: Expression, budget: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(ds, budget)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(ds = c(0), budget = c(1))

  override def checkInputDataTypes(): TypeCheckResult = ds.dataType match {
    case ArrayType(st: StructType, _) if st.length == 3 &&
        st.fields.forall(_.dataType == LongType) && budget.foldable &&
        budget.dataType == LongType =>
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

  override def eval(input: InternalRow): Any = {
    val d = ds.eval(input)
    val b = budget.eval(input)
    if (d == null || b == null) return null
    val da = d.asInstanceOf[ArrayData]
    val bud = b.asInstanceOf[Long]
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
