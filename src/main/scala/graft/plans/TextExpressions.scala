package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
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

  /** Adjacent-token bigram structs in ONE pass: (w1, w2) per adjacent
    * pair, or (p, w1, w2) with p = the 1-based token position of w2
    * when `withPos` — bit-identical to the HOF forms
    * `transform(slice(s, 1, size(s)-1), (w,i) -> struct(w, s[i+1]))`
    * and `transform(sequence(1, size(t)-1), i -> struct(i, t[i-1], t[i]))`
    * (asserted in ExtensionsSpec), but evaluated as tight JVM code
    * instead of an interpreted per-element lambda. Empty for < 2
    * tokens (explode then drops the row, matching the HOF forms). */
  def bigramsArrayData(text: UTF8String, withPos: Boolean): ArrayData = {
    val toks = tokens(text.toString)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      val w1 = UTF8String.fromString(toks(i))
      val w2 = UTF8String.fromString(toks(i + 1))
      out(i) =
        if (withPos) new GenericInternalRow(Array[Any](i + 1, w1, w2))
        else new GenericInternalRow(Array[Any](w1, w2))
      i += 1
    }
    new GenericArrayData(out)
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

  /** Single-pass token statistics — one tokenize + one distinct-set build
    * per document, replacing FOUR independent Column trees that each
    * re-split the text (`t_tokens` split the document ~6× per row through
    * the HOF forms). Field semantics mirror the Column formulations in
    * [[graft.text.Text]] exactly: n_tokens = size(split(text," ",-1)),
    * n_distinct over exact string equality, ttr = n_distinct/n_tokens as
    * double division, avg_tok_len = (numChars − (n_tokens−1))/n_tokens —
    * Spark's `length` counts characters, hence numChars not byte length. */
  def textStatsRow(text: UTF8String): InternalRow = {
    val toks = tokens(text.toString)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { distinct.add(toks(i)); i += 1 }
    val n = toks.length
    new GenericInternalRow(Array[Any](
      n,
      distinct.size,
      distinct.size.toDouble / n,
      (text.numChars() - (n - 1)).toDouble / n))
  }

  /** Single-pass quality statistics against a stopword vocab: hit count,
    * stopword ratio, type-token ratio, and the composite quality score
    * (ttr·0.5 + swRatio·0.25 + lenGate·0.25) — the HOF formulation
    * re-evaluated the interpreted filter/array_contains tree once per
    * OUTPUT column. Hits count every token occurrence (duplicates
    * included), matching filter+array_contains; the 7-word vocab is a
    * linear scan, same order of compares as array_contains. */
  def qualityStatsRow(text: UTF8String, vocab: Array[String]): InternalRow = {
    val toks = tokens(text.toString)
    val distinct = new java.util.HashSet[String]()
    var hits = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      distinct.add(t)
      var v = 0
      var found = false
      while (v < vocab.length && !found) { found = vocab(v) == t; v += 1 }
      if (found) hits += 1
      i += 1
    }
    val n = toks.length
    val ttr = distinct.size.toDouble / n
    val swRatio = hits.toDouble / n
    val lenOk = if (n >= 10 && n <= 1000) 1.0 else 0.5
    new GenericInternalRow(Array[Any](
      hits, swRatio, ttr, ttr * 0.5 + swRatio * 0.25 + lenOk * 0.25))
  }

  /** Language-ID argmax in one pass: counts each language's stopword hits
    * ONCE (the Column form built the interpreted `stopwordHits` tree into
    * both `greatest(...)` and every `when(h === max)` arm — ~2× per
    * language per row). Ties break to the earliest language in `langs`;
    * "und" when no list matches at all. */
  def langId(text: UTF8String, langs: Array[UTF8String],
             sets: Array[Array[String]]): UTF8String = {
    val toks = tokens(text.toString)
    val hits = new Array[Int](sets.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var l = 0
      while (l < sets.length) {
        val set = sets(l)
        var v = 0
        var found = false
        while (v < set.length && !found) { found = set(v) == t; v += 1 }
        if (found) hits(l) += 1
        l += 1
      }
      i += 1
    }
    var best = -1
    var max = 0
    var l = sets.length - 1
    while (l >= 0) { // backwards so earlier languages win ties
      if (hits(l) >= max && hits(l) > 0) { max = hits(l); best = l }
      l -= 1
    }
    if (best < 0) UTF8String.fromString("und") else langs(best)
  }

  /** md5 hash bucket of an (already string-cast) key: the first 4 digest
    * bytes as an unsigned big-endian 32-bit value, mod `buckets` —
    * BIT-IDENTICAL to the Column form
    * `pmod(conv(substring(md5(key), 1, 8), 16, 10), buckets)` (the first
    * 8 lowercase-hex chars ARE the first 4 bytes; the value is in
    * [0, 2³²) so pmod ≡ %), but with zero string churn: the Column form
    * allocates the 32-char hex string, an 8-char substring, and conv's
    * decimal string per row — this is one digest and integer ops. Every
    * md5-bucket op (corpus split, mixing, k-means training sample) sits
    * on a full-corpus scan at 100 TB, so per-row allocation is the cost
    * that matters. */
  def md5Bucket(key: UTF8String, buckets: Long): Long = {
    val md = digestTL.get(); md.reset()
    val d = md.digest(key.getBytes)
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v % buckets
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
      val prefix = s"$i|".getBytes(utf8)
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

/** md5_bucket(key, buckets) → long: deterministic hash bucket in
  * [0, buckets) — see [[TextKernels.md5Bucket]] for the bit-parity
  * contract with the conv/substring/pmod Column form (asserted in
  * ExtensionsSpec) and the oracle-side DuckDB twin. */
case class Md5BucketExpr(child: Expression, buckets: Long)
    extends UnaryExpression {
  require(buckets >= 1, "buckets must be >= 1")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.md5Bucket(input.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.md5Bucket($c, ${buckets}L)")
  override protected def withNewChildInternal(newChild: Expression): Md5BucketExpr =
    copy(child = newChild)
  override def prettyName: String = "md5_bucket"
}

/** bigrams_arr(text[, withPos]) → array<struct<[p,]w1,w2>>: adjacent-token
  * pairs in one codegen'd pass (see [[TextKernels.bigramsArrayData]] for the
  * bit-parity contract with the interpreted HOF forms). The array feeds
  * Spark's own `explode`, which GenerateExec keeps inside WholeStageCodegen,
  * so the whole scan → bigrams → explode pipeline is generated code — the
  * lambda `transform` it replaces never enters codegen and measured as the
  * dominant cost of the lmScore chain at sf1. */
case class BigramsExpr(child: Expression, withPos: Boolean = false)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    if (withPos) StructType(Seq(
      StructField("p", IntegerType, nullable = false),
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false)))
    else StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.bigramsArrayData(input.asInstanceOf[UTF8String], withPos)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.bigramsArrayData($c, $withPos)")
  override protected def withNewChildInternal(newChild: Expression): BigramsExpr =
    copy(child = newChild)
  override def prettyName: String = "bigrams_arr"
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

/** text_stats(text) → struct<n_tokens,n_distinct,ttr,avg_tok_len>: all four
  * token statistics from ONE tokenize pass (see TextKernels.textStatsRow). */
case class TextStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("ttr", DoubleType, nullable = false),
    StructField("avg_tok_len", DoubleType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextKernels.textStatsRow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.textStatsRow($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}

/** quality_stats(text, vocab) → struct<stop_hits,stop_ratio,ttr,quality>:
  * the pretraining-filter quality signals from one tokenize pass. The
  * vocab ships with the generated code via addReferenceObj, so the kernel
  * works on executors (a static registry would only exist on the driver). */
case class QualityStatsExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  @transient private lazy val vocabArr: Array[String] = vocab.toArray
  override def dataType: DataType = StructType(Seq(
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("ttr", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextKernels.qualityStatsRow(input.asInstanceOf[UTF8String], vocabArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qsVocab", vocabArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextKernels.qualityStatsRow($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "quality_stats"
}

/** lang_id(text) → string: stopword-hit argmax over the configured language
  * lists, earliest list wins ties, "und" on zero hits — one pass per
  * document instead of ~2 interpreted HOF trees per language. */
case class LangIdExpr(child: Expression, langWords: Seq[(String, Seq[String])])
    extends UnaryExpression {
  @transient private lazy val langsArr: Array[UTF8String] =
    langWords.map { case (l, _) => UTF8String.fromString(l) }.toArray
  @transient private lazy val setsArr: Array[Array[String]] =
    langWords.map(_._2.toArray).toArray
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String], langsArr, setsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val langsRef = ctx.addReferenceObj("lidLangs", langsArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val setsRef = ctx.addReferenceObj("lidSets", setsArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextKernels.langId($c, $langsRef, $setsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}
