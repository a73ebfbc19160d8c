package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the embedding-similarity hot path.
  *
  * Rationale (same as [[TextKernels]]): Spark's higher-order array
  * functions (`aggregate`, `zip_with`, `transform`) are interpreted per
  * element, so a 64-dim dot product costs ~130 boxed lambda dispatches.
  * Each kernel below does the whole vector in one tight JVM loop and
  * implements `doGenCode` via the StaticInvoke pattern, so projections and
  * join conditions containing them stay inside whole-stage codegen — which
  * is what lets the all-pairs cosine join run as a fully distributed
  * CartesianProduct instead of a driver-collected broadcast kernel.
  *
  * Semantics are BIT-IDENTICAL to the Column-expression formulations in
  * [[graft.sim.Similarity]] (asserted in SimilaritySpec): summation is
  * in array order, exactly like the SQL `aggregate` fold, so DuckDB
  * oracles built on `list_dot_product` + in-order normalization agree to
  * the last bit.
  */
object VectorKernels {

  /** In-order dot product of two equal-length double arrays. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** md5-derived ±1 hyperplane sign for (plane p, dim d): parity of the
    * first md5 hex nibble of "p_d". SINGLE definition — the kernel
    * signature path, the HOF formulation, and the oracle-SQL generator
    * (graft.sim.Similarity.planeSigns) all call this, so the rule cannot
    * fork. */
  def planeSign(p: Int, d: Int): Double =
    if (Integer.parseInt(TextKernels.md5Hex(s"${p}_$d").substring(0, 1), 16) % 2 == 0)
      1.0 else -1.0

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(planes: Int, dims: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((planes, dims), { case (p, d) =>
      Array.tabulate(p)(i => Array.tabulate(d)(j => planeSign(i, j)))
    })

  /** Sign-random-projection signature: bit p = (v · plane_p) > 0, packed
    * into a long. Each projection accumulates in array order — identical
    * to the per-plane HOF fold. One JVM call instead of `planes`
    * interpreted folds per row. A vector/dims mismatch fails LOUDLY:
    * the HOF formulation would null-pad and silently zero every bit,
    * which is never what the caller meant. */
  def srpSignature(v: ArrayData, planes: Int, dims: Int): Long =
    srpSignatureAt(v, 0, planes, dims)

  /** [[srpSignature]] over planes [offset, offset + planes): bit p of
    * the result is the sign of plane (offset + p) — the WORD-w slice of
    * a multi-word signature (wide layouts split bands across several
    * BIGINTs so each word stays inside the engines' signed-64 algebra;
    * see [[graft.sim.AnnParams.forCountWide]]). offset = 0 is the
    * classic single-word signature. */
  def srpSignatureAt(v: ArrayData, offset: Int, planes: Int, dims: Int): Long = {
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"srp_signature: vector has ${v.numElements()} dims, expected $dims")
    val ss = signs(offset + planes, dims)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val plane = ss(offset + p)
      var s = 0.0
      var i = 0
      val n = v.numElements()
      while (i < n) { s += v.getDouble(i) * plane(i); i += 1 }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** In-order squared L2 distance of two long arrays (the fixed-point
    * k-means geometry — see [[graft.sim.KMeans]]). Exact integer
    * arithmetic, so kernel and HOF fold agree bit-for-bit — INCLUDING
    * the null cases, which matters because [[RewriteSqDist]] substitutes
    * this for the fold inside arbitrary user plans: a null element makes
    * the fold's accumulator null, and zip_with null-pads mismatched
    * lengths, so both must yield NULL here too (boxed return). */
  def sqDistLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** ANSI twin of [[sqDistLong]]: same null semantics, but overflow
    * raises ArithmeticException exactly where the ANSI-mode HOF fold
    * would raise ARITHMETIC_OVERFLOW — [[RewriteSqDist]] must not turn
    * a failing query into one that silently returns wrapped values. */
  def sqDistLongExact(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  /** L2-normalize a double array: out(i) = a(i) / sqrt(a·a), with the
    * norm accumulated in array order (identical to the HOF fold). */
  def l2Normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    // Divide (not multiply-by-reciprocal): x/sqrt(s) and x*(1/sqrt(s))
    // differ in the last ulp, and the oracle computes the former.
    val nrm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / nrm; i += 1 }
    new GenericArrayData(out)
  }
}

/** vec_dot(a, b) → double: in-order dot product of two array<double>. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** srp_signature(v, planes, dims[, offset]) → long: packed
  * sign-random-projection LSH signature over md5-derived ±1 hyperplanes
  * [offset, offset + planes) — bit p is plane offset + p. offset > 0 is
  * the word-slice form for multi-word (wide) signatures. */
case class LshSignatureExpr(child: Expression, planes: Int, dims: Int,
    offset: Int = 0)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 64, "planes must fit a long")
  require(offset >= 0, "plane offset must be >= 0")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.srpSignatureAt(
      input.asInstanceOf[ArrayData], offset, planes, dims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.srpSignatureAt($c, $offset, $planes, $dims)")
  override protected def withNewChildInternal(newChild: Expression): LshSignatureExpr =
    copy(child = newChild)
  override def prettyName: String = "srp_signature"
}

/** vec_sqdist_long(a, b) → long: in-order squared L2 distance of two
  * array<bigint>. Usually introduced by [[RewriteSqDist]] rather than
  * written directly. `failOnError` mirrors the evalMode of the arithmetic
  * it replaced: true → ANSI (overflow raises), false → legacy (wraps). */
case class SqDistExpr(left: Expression, right: Expression,
    failOnError: Boolean = false)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  private def kernel: String =
    if (failOnError) "sqDistLongExact" else "sqDistLong"
  override def nullSafeEval(a: Any, b: Any): Any =
    if (failOnError)
      VectorKernels.sqDistLongExact(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      VectorKernels.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.plans.VectorKernels.$kernel($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_sqdist_long"
}

/** vec_l2_normalize(a) → array<double>: a / ||a||₂. */
case class L2NormalizeExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.l2Normalize(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.l2Normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): L2NormalizeExpr =
    copy(child = newChild)
  override def prettyName: String = "vec_l2_normalize"
}
