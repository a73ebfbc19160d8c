package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, document
  * fingerprinting. (Extension surface beyond the reference repo — the
  * BASELINE.json north star.)
  *
  * Everything is built from Spark SQL higher-order functions (`split`,
  * `transform`, `filter`, `aggregate`) — codegen'd column expressions, NO
  * UDFs — so the whole stage fuses into the scan at 100 TB and nothing
  * crosses a JVM/interpreter boundary per row.
  */
object Text {

  /** Whitespace tokenization (single-space corpora) — `split` on the
    * literal separator is cheaper than a regex at scale. */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex whitespace tokenization for messy text. */
  def tokensWs(text: Column): Column = split(text, "\\s+")

  /** BPE-ish subword-boundary tokenizer: splits on whitespace AND
    * letter/digit boundaries (approximates byte-pair pre-tokenization). */
  def tokensBpeish(text: Column): Column =
    split(text, "\\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])")

  /** Adjacent-token bigram array straight from the text column
    * ([[graft.plans.BigramsExpr]]): array<struct<w1,w2>>, or
    * array<struct<p,w1,w2>> with the 1-based position of w2 when
    * `withPos` — one codegen'd JVM pass, bit-identical to the
    * interpreted `transform` HOF forms it replaces (ExtensionsSpec). */
  def bigramsArr(text: Column, withPos: Boolean = false): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.BigramsExpr(
        org.apache.spark.sql.GraftBridge.expression(text), withPos))

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Type-token ratio — lexical-diversity quality signal. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text)

  /** Mean token length, derived from char count minus separators so it
    * needs no second pass over the token array. */
  def avgTokenLen(text: Column): Column =
    (length(text) - (tokenCount(text) - lit(1))).cast("double") / tokenCount(text)

  /** Number of tokens that appear in `vocab` (stopword hit counting). */
  def stopwordHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(array(vocab.map(lit): _*), t)))

  def stopwordRatio(text: Column, vocab: Seq[String]): Column =
    stopwordHits(text, vocab).cast("double") / tokenCount(text)

  /** Composite quality score in [0,1]: favors docs with diverse vocabulary,
    * mid-length tokens, and a sane stopword rate. Deterministic double
    * arithmetic (single expression tree). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val ttr = typeTokenRatio(text)
    val sw = stopwordRatio(text, stopwords)
    val lenOk = when(tokenCount(text).between(10, 1000), lit(1.0)).otherwise(lit(0.5))
    (ttr * lit(0.5) + sw * lit(0.25) + lenOk * lit(0.25))
  }

  /** Per-language stopword lists for the n-gram-free language-ID
    * heuristic. Deliberately tiny: language ID at corpus scale is a
    * hit-count argmax, not a model. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "y", "en", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"))

  /** Language-ID: argmax of stopword hits with a fixed priority order for
    * ties; 'und' when nothing matches. One pass per language list over the
    * token array — still a single projection, no shuffle. */
  def langId(text: Column): Column = {
    val hits = langStopwords.map { case (l, words) => l -> stopwordHits(text, words) }
    val maxHits = greatest(hits.map(_._2): _*)
    val first = hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(h === maxHits && maxHits > 0, lit(l)).otherwise(acc)
    }
    // foldRight so earlier languages in the list win ties (en priority)
    first
  }

  /** Single-pass kernel twin of the four token statistics — a codegen'd
    * struct<n_tokens,n_distinct,ttr,avg_tok_len> ([[graft.plans.TextStatsExpr]]),
    * bit-identical to the HOF forms above (ExtensionsSpec-asserted) but one
    * tokenize per document instead of one per output column. */
  def textStatsFast(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.TextStatsExpr(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Single-pass kernel twin of (stopwordHits, stopwordRatio,
    * typeTokenRatio, qualityScore) — struct<stop_hits,stop_ratio,ttr,quality>
    * ([[graft.plans.QualityStatsExpr]]). */
  def qualityStatsFast(text: Column, stopwords: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.QualityStatsExpr(
        org.apache.spark.sql.GraftBridge.expression(text), stopwords))

  /** Kernel twin of [[langId]]: each language's hits counted ONCE per
    * document ([[graft.plans.LangIdExpr]]). */
  def langIdFast(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.LangIdExpr(
        org.apache.spark.sql.GraftBridge.expression(text), langStopwords))

  /** Order-insensitive bag-of-words fingerprint: md5 of the sorted distinct
    * token set. Near-free to compute, catches reordered/duplicated-content
    * docs exactly, and is the exact-dedup key at 100 TB (hash-groupBy).
    * md5 is also available in DuckDB → oracle-checkable. */
  def bagOfWordsFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Polynomial rolling hash over characters (mod 1e9+7, base 31) — the
    * classic Rabin-Karp document fingerprint. Sequential-fold semantics via
    * `aggregate`; order-sensitive by design (unlike the bag fingerprint).
    */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + coalesce(ascii(ch).cast("long"), lit(0L)),
        lit(1000000007L)))
}
