package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernels for the PQ/IVF hot path.
  *
  * The composable higher-order-function forms ([[graft.ops.Pq]]'s
  * `transform`/`array_min`/`aggregate` trees) interpret one Catalyst
  * expression node per element — for the PQ encode that is m*ks
  * struct allocations and m*ks*sub interpreted arithmetic nodes per
  * corpus row. These kernels run the identical arithmetic as ONE
  * tight JVM loop per row (CodegenFallback: the per-row cost is the
  * ~m*ks*sub fused multiply-adds inside eval, not the call overhead).
  *
  * BIT-IDENTICAL by construction to the HOF forms, which is what
  * keeps every DuckDB oracle unchanged (asserted row-for-row on real
  * data in `PqExprSpec`):
  *  - squared L2 accumulates strictly left-to-right;
  *  - quantization replicates Spark's floor-based qround exactly,
  *    including the double→long→double hop
  *    (`floor(x*1e6+0.5).toLong.toDouble / 1e6`);
  *  - the argmin orders by (quantized d2, id) exactly like the
  *    struct-ordered `array_min`.
  */
object PqKernel {
  /** Spark-exact qround(x, 6): Floor on DoubleType yields LONG, the
    * cast back to double and the division are then exact/correctly
    * rounded — replicate the hop, not just the math. */
  @inline final def q6(x: Double): Double =
    math.floor(x * 1e6 + 0.5).toLong.toDouble / 1e6

  /** Left-to-right Σ (a_i - b_i)² over `len` elements starting at
    * offsets `ao`/`bo` — the fold order both engines run. */
  @inline final def d2(a: ArrayData, ao: Int, b: ArrayData, bo: Int, len: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < len) {
      val d = a.getDouble(ao + i) - b.getDouble(bo + i)
      acc = acc + d * d
      i += 1
    }
    acc
  }

  /** [[d2]] over flat decoded arrays with an early exit: stops
    * accumulating once the partial sum exceeds `bound` (the returned
    * value is then SOME prefix sum > bound, not the full distance).
    * Exact-safe for argmin-by-(q6(d2), id) when bound = bestD +
    * 1.5e-6: the partial is a lower bound on the final raw d2, and
    * raw > bestD + 1.5e-6 forces q6(raw) >= bestD + 1e-6 > bestD even
    * across the floor's FP wobble (|err| ~ 1e-10 at these magnitudes
    * vs the 0.5e-6 slack), so a skipped candidate can neither win nor
    * tie — and a candidate that COULD win never triggers the exit, so
    * winners always carry their full left-to-right fold-order sum
    * (bit-identical to [[d2]] on the same prefix). Turns the
    * K-centroid scan from O(K·dim) to ~O(K + dim·survivors) per row —
    * the term that dominates K ∝ N coarse assignment
    * (e_semdedup_kscaled). The ONE home of the bound/margin contract;
    * [[IvfCellExpr.eval]] is its caller. */
  @inline final def d2Bounded(a: Array[Double], b: Array[Double], bo: Int,
                              len: Int, bound: Double): Double = {
    var acc = 0.0
    var i = 0
    while (i < len) {
      val d = a(i) - b(bo + i)
      acc = acc + d * d
      if (acc > bound) return acc
      i += 1
    }
    acc
  }

  @inline final def anyNull(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }
}

/** `graft_pq_score(ve, qv, cbs, m, ks)` →
  * struct<code: string, ad2: double, ed2: double> — the fused PQ
  * encode + ADC of [[graft.ops.Pq.scoredQ]]: per subspace the argmin
  * codeword by (q6(d2), cid), carrying the query-side table entry;
  * `ad2` folds the chosen entries in subspace order then quantizes
  * once; `ed2` is the exact full-vector distance. `qv` may be NULL →
  * encode-only (`ad2`/`ed2` null), the [[graft.ops.Pq.encoded]]
  * index-build half. `cbs` is the (m, cid)-sorted folded codebook
  * row (position m*ks + cid, 1-based), `m`/`ks` literal ints. */
case class PqScoreExpr(ve: Expression, qv: Expression, cbs: Expression,
                       mExpr: Expression, ksExpr: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(ve, qv, cbs, mExpr, ksExpr)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(ve = c(0), qv = c(1), cbs = c(2), mExpr = c(3), ksExpr = c(4))

  override def checkInputDataTypes(): TypeCheckResult = {
    def dblArr(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = cbs.dataType match {
      case ArrayType(st: StructType, _) if st.length == 3 => dblArr(st(2).dataType)
      case _ => false
    }
    if (!dblArr(ve.dataType))
      TypeCheckResult.TypeCheckFailure("graft_pq_score: ve must be array<double>")
    else if (!(qv.dataType == NullType || dblArr(qv.dataType)))
      TypeCheckResult.TypeCheckFailure("graft_pq_score: qv must be array<double> or NULL")
    else if (!cbOk)
      TypeCheckResult.TypeCheckFailure(
        "graft_pq_score: cbs must be array<struct<m,cid,cv:array<double>>>")
    else if (!mExpr.foldable || !ksExpr.foldable)
      TypeCheckResult.TypeCheckFailure("graft_pq_score: m and ks must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val m = mExpr.eval().asInstanceOf[Number].intValue()
  @transient private lazy val ks = ksExpr.eval().asInstanceOf[Number].intValue()

  override def dataType: DataType = StructType(Seq(
    StructField("code", StringType), StructField("ad2", DoubleType),
    StructField("ed2", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_score"

  override def eval(input: InternalRow): Any = {
    val v = ve.eval(input)
    val cb = cbs.eval(input)
    if (v == null || cb == null) return null
    val va = v.asInstanceOf[ArrayData]
    val cba = cb.asInstanceOf[ArrayData]
    val q = qv.eval(input)
    val qa = if (q == null) null else q.asInstanceOf[ArrayData]
    val dim = va.numElements()
    if (m <= 0 || ks <= 0 || dim % m != 0) return null
    val sub = dim / m
    if (cba.numElements() != m * ks) return null
    if (PqKernel.anyNull(va) || (qa != null &&
      (qa.numElements() != dim || PqKernel.anyNull(qa)))) return null

    val code = new java.lang.StringBuilder(3 * m)
    var ad2Acc = 0.0
    var mm = 0
    while (mm < m) {
      var bestD = Double.MaxValue
      var bestCid = Int.MaxValue
      var bestQd = 0.0
      var k = 1
      while (k <= ks) {
        val cw = cba.getStruct(mm * ks + k - 1, 3)
        val cv = cw.getArray(2)
        if (cv.numElements() != sub || PqKernel.anyNull(cv)) return null
        val d = PqKernel.q6(PqKernel.d2(va, mm * sub, cv, 0, sub))
        if (d < bestD || (d == bestD && k < bestCid)) {
          bestD = d
          bestCid = k
          if (qa != null)
            bestQd = PqKernel.q6(PqKernel.d2(qa, mm * sub, cv, 0, sub))
        }
        k += 1
      }
      if (mm > 0) code.append(',')
      code.append(bestCid)
      ad2Acc = ad2Acc + bestQd // fold in subspace order, like aggregate(bests)
      mm += 1
    }
    val codeStr = UTF8String.fromString(code.toString)
    if (qa == null) InternalRow(codeStr, null, null)
    else InternalRow(codeStr,
      PqKernel.q6(ad2Acc),
      PqKernel.q6(PqKernel.d2(va, 0, qa, 0, dim)))
  }
}

/** `graft_ivf_cell(ve, cells)` → struct<d2: double, cell: int,
  * idx: int> — the fused coarse argmin of
  * [[graft.ops.Pq.ivfAssignedWith]]: nearest centroid by
  * (q6(d2), cell) over the one-row folded `cells` array
  * (struct<cell:int, cv:array<double>>). `idx` is the 1-based array
  * position of the winner, so callers can element_at the matched
  * centroid without assuming cell ids are contiguous. */
case class IvfCellExpr(ve: Expression, cells: Expression,
                       stableCache: Boolean = false)
  extends Expression with CodegenFallback {

  // Per-task flat-decode cache for the (broadcast) centroid array:
  // the struct-of-array ArrayData walk costs an object allocation +
  // offset arithmetic per centroid per ROW, which dominates the
  // argmin at large K. Tasks deserialize their own Expression tree,
  // so this mutable state is task-confined (the same pattern Spark's
  // stateful nondeterministic expressions use). The cache keys on
  // the UnsafeArrayData's (baseObject, baseOffset, size) — stable
  // for a broadcast row across a task's iteration — and holds ONE
  // decoded arrays-per-offset map so both usage shapes hit:
  // a constant cells column (one entry) and the hierarchical
  // element_at(subcell_map, cell) shape (one entry per coarse cell,
  // K_total*dim doubles in all — MBs at the 50k-cluster scale).
  // The cache is OPT-IN (`stableCache`, set only by the graft.ops.Pq
  // library layer where `cells` provably comes from its own
  // crossJoin(broadcast(...)) fold): a STREAM-side cells column could
  // legally reuse one codegen output buffer across rows — same
  // (base, offset), new content — and a content-blind cache would go
  // stale. Broadcast relation rows are materialized once and never
  // mutated, which is the contract the flag asserts.
  @transient private var cacheBase: AnyRef = null
  @transient private var cacheByOffset: java.util.HashMap[java.lang.Long, (Array[Int], Array[Double])] = null
  @transient private var veBuf: Array[Double] = null

  /** Decode (cell ids, row-major centroid matrix); null iff any
    * centroid is null/ragged/null-holed (the eval returns null then,
    * matching the undecoded path). */
  private def decode(ca: ArrayData, dim: Int): (Array[Int], Array[Double]) = {
    val n = ca.numElements()
    val ids = new Array[Int](n)
    val flat = new Array[Double](n * dim)
    var i = 0
    while (i < n) {
      if (ca.isNullAt(i)) return null
      val c = ca.getStruct(i, 2)
      if (c.isNullAt(0) || c.isNullAt(1)) return null
      ids(i) = c.getInt(0)
      val cv = c.getArray(1)
      if (cv.numElements() != dim || PqKernel.anyNull(cv)) return null
      var j = 0
      while (j < dim) { flat(i * dim + j) = cv.getDouble(j); j += 1 }
      i += 1
    }
    (ids, flat)
  }

  private def decoded(ca: ArrayData, dim: Int): (Array[Int], Array[Double]) = ca match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      val base = u.getBaseObject
      if (!(base eq cacheBase)) {
        cacheBase = base
        cacheByOffset = new java.util.HashMap[java.lang.Long, (Array[Int], Array[Double])]()
      }
      val key = java.lang.Long.valueOf(u.getBaseOffset)
      var hit = cacheByOffset.get(key)
      if (hit != null && hit._2.length != hit._1.length * dim) hit = null // dim changed: bypass
      if (hit == null) { hit = decode(u, dim); if (hit != null) cacheByOffset.put(key, hit) }
      hit
    case _ => decode(ca, dim)
  }

  override def children: Seq[Expression] = Seq(ve, cells)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(ve = c(0), cells = c(1))

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ve.dataType match {
      case ArrayType(DoubleType, _) => cells.dataType match {
        case ArrayType(st: StructType, _) if st.length == 2 =>
          st(1).dataType.isInstanceOf[ArrayType]
        case _ => false
      }
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_ivf_cell(ve, cells) needs array<double> and array<struct<cell,cv>>")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType), StructField("cell", IntegerType),
    StructField("idx", IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ivf_cell"

  override def eval(input: InternalRow): Any = {
    val v = ve.eval(input)
    val cs = cells.eval(input)
    if (v == null || cs == null) return null
    val va = v.asInstanceOf[ArrayData]
    val ca = cs.asInstanceOf[ArrayData]
    val dim = va.numElements()
    if (PqKernel.anyNull(va)) return null
    val dec = if (stableCache) decoded(ca, dim) else decode(ca, dim)
    if (dec == null) return null
    val (ids, flat) = dec
    if (veBuf == null || veBuf.length != dim) veBuf = new Array[Double](dim)
    var j = 0
    while (j < dim) { veBuf(j) = va.getDouble(j); j += 1 }
    var bestD = Double.MaxValue
    var bestCell = Int.MaxValue
    var bestIdx = -1
    val n = ids.length
    var i = 0
    while (i < n) {
      // exactness of the early exit lives on PqKernel.d2Bounded (the
      // bestD + 1.5e-6 margin): an exited candidate can neither win
      // nor tie, a winner carries its full fold-order sum
      val bound = if (bestIdx < 0) Double.PositiveInfinity else bestD + 1.5e-6
      val acc = PqKernel.d2Bounded(veBuf, flat, i * dim, dim, bound)
      if (acc <= bound) {
        val d = PqKernel.q6(acc)
        if (bestIdx < 0 || d < bestD || (d == bestD && ids(i) < bestCell)) {
          bestD = d; bestCell = ids(i); bestIdx = i
        }
      }
      i += 1
    }
    if (bestIdx < 0) null else InternalRow(bestD, bestCell, bestIdx + 1)
  }
}
