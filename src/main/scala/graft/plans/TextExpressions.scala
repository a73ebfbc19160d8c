package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-dedup hot path.
  *
  * Rationale (measured, see Dedup scaladoc): Spark's higher-order array
  * functions are interpreted per element — building 3-gram shingles and a
  * k=16 MinHash signature through transform/slice/concat_ws/array_min
  * costs ~8 s at sf0.1 in lambda-interpretation overhead. Each expression
  * below does the whole document in one call of tight JVM code (~10× less
  * per-row overhead), and implements `doGenCode` via the StaticInvoke
  * pattern (the generated Java calls the static kernel), so projections
  * containing them stay inside whole-stage codegen.
  *
  * Semantics are BIT-IDENTICAL to the Column-expression formulations in
  * [[graft.dedup.Dedup]] (asserted in ExtensionsSpec), so the DuckDB
  * oracles are unchanged: tokens = split on single space (trailing empty
  * tokens preserved, like Spark's regex split with limit -1); shingle
  * set is distinct in first-occurrence order; minhash_i = lexicographic
  * min over md5(i || "|" || shingle) hex strings.
  */
object TextKernels {
  /** Tokenize exactly like Spark's split(text, " ") (regex, limit -1). */
  def tokens(text: String): Array[String] = text.split(" ", -1)

  /** Distinct word n-grams in first-occurrence order. */
  def shingles(text: String, n: Int): Array[String] = {
    val toks = tokens(text)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  private val HEX = "0123456789abcdef".toCharArray

  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf); out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def md5Hex(s: String): String = {
    val md = digestTL.get(); md.reset()
    toHex(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Unsigned lexicographic compare of two 16-byte digests — identical
    * order to comparing their lowercase-hex encodings. */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Codegen entry points: static calls emitted by doGenCode (the
    * StaticInvoke pattern) so the expressions stay INSIDE whole-stage
    * codegen instead of falling back to interpreted eval dispatch. */
  def shinglesArrayData(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      shingles(text.toString, n).map(UTF8String.fromString): Array[Any])

  def minhashArrayData(shingleArr: ArrayData, k: Int): ArrayData = {
    val arr = new Array[String](shingleArr.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = shingleArr.getUTF8String(i).toString; i += 1 }
    new GenericArrayData(
      minhash(arr, k).map(s => if (s == null) null else UTF8String.fromString(s))
        : Array[Any])
  }

  /** 64-bit SimHash over distinct tokens. 64 bits (vs the round-2 32) is
    * the scale requirement: pigeonhole banding at maxHamming=3 gives 4
    * bands of 16 bits = 65,536 buckets per band, so candidate generation
    * stays proportional to true-duplicate density instead of degrading to
    * ~n²/256 as a 32-bit/8-bit-band scheme does at corpus scale. Token
    * hash = first 16 md5 hex chars parsed as an unsigned 64-bit int (bit
    * 63 lands in the long's sign bit — harmless, all downstream ops are
    * bitwise). */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text.toString)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = java.lang.Long.parseUnsignedLong(md5Hex(toks(i)).substring(0, 16), 16)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** k-hash MinHash signature over a shingle set: sig(i) = min md5 hex of
    * s"$i|$shingle"; null entries when the set is empty (mirrors
    * array_min of an empty transform). Hot path: thread-local digest,
    * shingle bytes encoded once, digests compared as raw bytes (same
    * order as hex strings), winners hex-encoded at the end. */
  def minhash(shingleArr: Array[String], k: Int): Array[String] = {
    val sig = new Array[String](k)
    if (shingleArr.isEmpty) return sig
    val md = digestTL.get()
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val shingleBytes = new Array[Array[Byte]](shingleArr.length)
    var s = 0
    while (s < shingleArr.length) {
      shingleBytes(s) = shingleArr(s).getBytes(utf8); s += 1
    }
    var i = 0
    while (i < k) {
      val prefix = (i + "|").getBytes(utf8)
      var best: Array[Byte] = null
      s = 0
      while (s < shingleBytes.length) {
        md.reset()
        md.update(prefix)
        md.update(shingleBytes(s))
        val h = md.digest()
        if (best == null || lessThan(h, best)) best = h
        s += 1
      }
      sig(i) = toHex(best)
      i += 1
    }
    sig
  }
}

/** simhash64(text) → long: 64-bit SimHash over distinct tokens (md5-derived
  * token hashes, ±1 bit votes) — bit-identical to the exploded DataFrame
  * formulation in Dedup.simhashTableHof but one eval per document instead
  * of |tokens|×64 vote rows through two shuffles. */
case class SimHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** shingles(text, n) → array<string>: distinct word n-grams. */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.shinglesArrayData(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.shinglesArrayData($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

/** minhash_sig(shingleArray, k) → array<string>: k md5-minima hex. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "signature size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashArrayData(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.minhashArrayData($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}
