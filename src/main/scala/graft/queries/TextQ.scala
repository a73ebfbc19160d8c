package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Text

/** Text-analysis coverage over the `documents` table (LLM-data-pipeline
  * extension surface): token stats, quality scoring, language ID,
  * fingerprinting — all through [[graft.text.Text]] so the oracle checks
  * the library code.
  */
object TextQ extends QueryPack {

  /** Token counting: whitespace tokens, distinct tokens, type-token ratio,
    * mean token length. Pure projection — fuses into the scan; all four
    * stats come off ONE kernel struct (one tokenize per document) and the
    * shared subtree is eliminated inside whole-stage codegen. */
  private def tTokens(spark: SparkSession, d: String): DataFrame = {
    val st = Text.textStatsFast(col("text"))
    Tables.documents(spark, d)
      .select(
        col("doc_id"),
        st.getField("n_tokens").as("n_tokens"),
        st.getField("n_distinct").as("n_distinct"),
        st.getField("ttr").as("ttr"),
        st.getField("avg_tok_len").as("avg_tok_len"),
        length(col("text")).as("n_chars_computed"),
        col("n_chars"))
      .orderBy("doc_id")
  }

  private val tTokensSql =
    """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         / len(string_split(text, ' ')) AS ttr,
       CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_tok_len,
       CAST(length(text) AS INT) AS n_chars_computed,
       n_chars
       FROM documents ORDER BY doc_id"""

  private val enStop = Text.langStopwords.toMap.apply("en")

  /** Quality scoring: stopword ratio + lexical diversity + length gate →
    * composite score (the stack every pretraining filter runs). */
  private def tQuality(spark: SparkSession, d: String): DataFrame = {
    val qs = Text.qualityStatsFast(col("text"), enStop)
    Tables.documents(spark, d)
      .select(
        col("doc_id"),
        qs.getField("stop_hits").as("stop_hits"),
        qs.getField("stop_ratio").as("stop_ratio"),
        qs.getField("ttr").as("ttr"),
        qs.getField("quality").as("quality"))
      .orderBy("doc_id")
  }

  private val tQualitySql = {
    val stopList = enStop.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
         SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       SELECT doc_id,
         CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS INT) AS stop_hits,
         CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
           / len(toks) AS stop_ratio,
         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
           + (CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
              / len(toks)) * 0.25
           + (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.5 END) * 0.25
           AS quality
       FROM t ORDER BY doc_id"""
  }

  /** Language ID: stopword-hit argmax with fixed tie priority. The `lang`
    * column rides along so downstream evaluation can compare. */
  private def tLangid(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        Text.langIdFast(col("text")).as("lang_guess"))
      .orderBy("doc_id")

  private val tLangidSql = {
    val lists = Text.langStopwords.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
    val hitCols = lists.map { case (l, arr) =>
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS h_$l"
    }.mkString(", ")
    val langs = lists.map(_._1)
    val g = s"greatest(${langs.map("h_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN h_$l = g AND g > 0 THEN '$l'").mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
       h AS (SELECT doc_id, lang, $hitCols FROM t),
       m AS (SELECT *, $g AS g FROM h)
       SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_guess
       FROM m ORDER BY doc_id"""
  }

  /** Document fingerprinting: order-insensitive bag-of-words md5 + dup
    * group size via a window over the fingerprint (446 distinct groups in
    * the 500-doc sf0.01 corpus — the planted near-dups share bags). */
  private def tFingerprint(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, d)
      .select(col("doc_id"),
        Text.bagOfWordsFingerprint(col("text")).as("fingerprint"))
      .withColumn("group_size",
        count(lit(1)).over(Window.partitionBy("fingerprint")))
      .orderBy("doc_id")
  }

  private val tFingerprintSql =
    """SELECT doc_id,
       md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
           'string_agg', ' ')) AS fingerprint,
       COUNT(*) OVER (PARTITION BY md5(list_aggregate(list_sort(list_distinct(
           string_split(text, ' '))), 'string_agg', ' '))) AS group_size
       FROM documents ORDER BY doc_id"""

  /** The composed training-data filter pipeline: quality gate → exact
    * dedup (min-id survivor per bag fingerprint) → language tag — the
    * standard pretraining corpus-prep chain, as ONE declarative plan
    * (filters push into the scan; dedup is one hash shuffle). */
  private def tFilterPipeline(spark: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(spark, d)
      .withColumn("quality",
        Text.qualityStatsFast(col("text"), enStop).getField("quality"))
      .withColumn("fingerprint", Text.bagOfWordsFingerprint(col("text")))
      .filter(col("quality") >= 0.5)
    graft.dedup.Dedup.exactDedup(scored, col("fingerprint"), "doc_id")
      .select(col("doc_id"),
        Text.langIdFast(col("text")).as("lang_guess"),
        col("quality"))
      .orderBy("doc_id")
  }

  private val tFilterSql = {
    val stopList = enStop.map(w => s"'$w'").mkString("[", ", ", "]")
    val lists = Text.langStopwords.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
    val hitCols = lists.map { case (l, arr) =>
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS h_$l"
    }.mkString(", ")
    val langs = lists.map(_._1)
    val g = s"greatest(${langs.map("h_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN h_$l = g AND g > 0 THEN '$l'").mkString(" ")
    s"""WITH t AS (
         SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
       scored AS (
         SELECT doc_id, text, toks,
           (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
             + (CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE)
                / len(toks)) * 0.25
             + (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.5 END) * 0.25
             AS quality,
           md5(list_aggregate(list_sort(list_distinct(toks)), 'string_agg', ' '))
             AS fingerprint
         FROM t),
       gated AS (SELECT * FROM scored WHERE quality >= 0.5),
       surv AS (SELECT * FROM (
           SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS m FROM gated) s
         WHERE doc_id = m),
       h AS (SELECT doc_id, quality, $hitCols FROM surv),
       mx AS (SELECT *, $g AS g FROM h)
       SELECT doc_id, CASE $cases ELSE 'und' END AS lang_guess, quality
       FROM mx ORDER BY doc_id"""
  }

  /** Benchmark decontamination: flag corpus docs sharing ANY word 3-gram
    * with a held-out benchmark slice (here every 25th doc id), reporting
    * the distinct-overlap count per flagged doc. At 100 TB the benchmark
    * n-gram set is tiny relative to the corpus, so it BROADCASTS — the
    * corpus side streams through a map-side semi-join with no shuffle of
    * corpus shingles. */
  private def tDecontam(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val benchSh = docs.filter(col("doc_id") % 25 === 0)
      .select(explode(graft.dedup.Dedup.shinglesFast(col("text"), 3)).as("sh"))
      .distinct()
    docs.filter(col("doc_id") % 25 =!= 0)
      .select(col("doc_id"),
        explode(graft.dedup.Dedup.shinglesFast(col("text"), 3)).as("sh"))
      .join(broadcast(benchSh), Seq("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  private val tDecontamSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
              FROM toks WHERE len(t) >= 3),
       bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 25 = 0)
       SELECT doc_id, COUNT(*) AS n_overlap
       FROM sh JOIN bench USING (sh)
       WHERE doc_id % 25 <> 0
       GROUP BY 1 ORDER BY 1"""

  /** Intra-document repetition signal (the Gopher/C4-style quality rule):
    * fraction of word 3-grams that are repeats of an earlier 3-gram in
    * the SAME document. Pure per-row expressions (total vs distinct
    * shingle counts) — fuses into the scan, no shuffle. */
  private def tRepetition(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        greatest(Text.tokenCount(col("text")) - 2, lit(0)).as("n_grams"),
        size(graft.dedup.Dedup.shinglesFast(col("text"), 3)).as("n_distinct"))
      .withColumn("dup_frac",
        when(col("n_grams") > 0,
          (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")

  private val tRepetitionSql =
    """WITH g AS (
         SELECT doc_id,
                GREATEST(len(string_split(text, ' ')) - 2, 0) AS n_grams,
                len(list_distinct(list_transform(
                  range(1, GREATEST(len(string_split(text, ' ')) - 1, 1)),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1] || ' ' ||
                       string_split(text, ' ')[i+2]))) AS n_distinct
         FROM documents)
       SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
              CAST(n_distinct AS INT) AS n_distinct,
              CASE WHEN n_grams > 0
                   THEN CAST(n_grams - n_distinct AS DOUBLE) / n_grams
                   ELSE 0.0 END AS dup_frac
       FROM g ORDER BY doc_id"""

  /** Corpus vocabulary: global term frequency + document frequency,
    * top-100 by tf with a total-order tiebreak. One explode + one
    * hash-aggregate shuffle on the token (df via count-distinct over
    * doc_id), then TakeOrderedAndProject — the plan shape survives any
    * corpus size because only |vocab| rows reach the top-k. */
  private def tVocab(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(100)

  private val tVocabSql =
    """SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
       FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
             FROM documents)
       GROUP BY tok ORDER BY tf DESC, tok LIMIT 100"""

  /** PII scrubbing: mask emails and URLs with typed placeholder tokens.
    * The synthetic corpus carries no PII, so a contact line derives
    * deterministically from doc_id first (same replayed-derivation
    * contract as the TPC-H partsupp family) and the scrub must erase
    * exactly it. The patterns stay inside the RE2 ∩ java.util.regex
    * common subset (character classes only — no lookaround/backrefs), so
    * both engines compile them identically; scan-fused projection, no
    * shuffle. */
  private def tScrub(spark: SparkSession, d: String): DataFrame = {
    val withPii = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or http://host/p/"),
      col("doc_id"))
    Tables.documents(spark, d)
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(withPii,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "https?://[^ ]+", "<URL>").as("clean"))
      .withColumn("still_has_pii",
        col("clean").rlike("@example|http://").cast("int"))
      .orderBy("doc_id")
  }

  private val tScrubSql =
    """SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or http://host/p/' || CAST(doc_id AS VARCHAR),
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                'https?://[^ ]+', '<URL>', 'g') AS clean,
              CASE WHEN regexp_matches(
                     regexp_replace(
                       regexp_replace(
                         text || ' contact user' || CAST(doc_id AS VARCHAR)
                              || '@example.com or http://host/p/' || CAST(doc_id AS VARCHAR),
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       'https?://[^ ]+', '<URL>', 'g'), '@example|http://')
                   THEN 1 ELSE 0 END AS still_has_pii
       FROM documents ORDER BY doc_id"""

  /** Per-document salient term — the TF-IDF shape with a RATIONAL
    * inverse-document-frequency (tf · N/df instead of tf · ln(N/df)):
    * libm log differs in the last ulp across engines, while N/df is one
    * IEEE divide both sides compute identically, and the ARGMAX per
    * document is what the operator is for. Two shuffles (corpus df on
    * token, per-doc tf on doc) + a broadcast of the |vocab| df table. */
  private def tTfidf(spark: SparkSession, d: String): DataFrame = {
    // Both frequency aggregations re-run the token explosion from the
    // scan. Deliberate: a repartition boundary here would let
    // ReusedExchange tokenize once, but materializing the exploded
    // stream (larger than the input text) costs more than the second
    // columnar scan + map-side partials — measured 0.8 s vs 1.0-1.2 s
    // at sf0.1, and the same asymmetry holds at scale.
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val nDocs = Tables.documents(spark, d).agg(count(lit(1)).as("n_docs"))
    val df = toks.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    tf.join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("tok").as("top_term"), col("score"))
      .orderBy("doc_id")
  }

  private val tTfidfSql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
        df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        scored AS (SELECT tf.doc_id, tf.tok,
                          tf.tf * (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                                   / CAST(df.df AS DOUBLE)) AS score
                   FROM tf JOIN df ON tf.tok = df.tok)
       SELECT doc_id, tok AS top_term, score
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, tok) AS rk
             FROM scored)
       WHERE rk = 1 ORDER BY doc_id"""

  /** BM25 retrieval scoring (k1 = 1.2, b = 0.75) for a fixed 3-term
    * query — the standard lexical-retrieval op a training-data pipeline
    * uses for quality-targeted selection and decontamination lookups.
    *
    * Exactness discipline (the house float rules): IDF is the RATIONAL
    * (N − df + 0.5)/(df + 0.5) — no ln(), whose last ulp differs across
    * engines (same trade documented at [[tTfidf]]); every arithmetic
    * step is one fixed IEEE expression tree both engines evaluate
    * identically; and the per-term contributions are rounded to 6dp and
    * summed as DECIMAL(18,6), so the cross-term sum is order-independent
    * (float += is not associative; a plain double sum would be
    * partitioning-dependent).
    *
    * Scale shape: term filter BEFORE the tf aggregation (the scan emits
    * only query-term hits), df and corpus stats broadcast, the only
    * big shuffles are the per-doc length and tf groupBys; top-10 is
    * TakeOrderedAndProject, never a global sort. */
  private def tBm25(spark: SparkSession, d: String): DataFrame =
    graft.text.Bm25.scoreFromIndex(
      graft.text.Bm25.buildIndex(Tables.documents(spark, d)),
      Seq("vector", "hash", "merge"), k = 10)

  private val tBm25Sql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS tot FROM dl),
       dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
               WHERE tok IN ('vector', 'hash', 'merge') GROUP BY 1),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tfreq FROM toks
              WHERE tok IN ('vector', 'hash', 'merge') GROUP BY 1, 2),
       scored AS (SELECT doc_id,
             CAST(round(
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tfreq AS DOUBLE) * 2.2)
                  / (CAST(tfreq AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dlen AS DOUBLE)
                         / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
               6) AS DECIMAL(18,6)) AS contrib
           FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id)
           CROSS JOIN stats)
       SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS score
       FROM scored GROUP BY doc_id
       ORDER BY score DESC, doc_id LIMIT 10"""

  /** Corpus-trained bigram-LM quality score (the CCNet-style perplexity
    * filter, re-expressed exactly): per document, the MEAN transition
    * probability of its bigrams under the corpus's own bigram model —
    * P(w2|w1) = count(w1 w2) / count(w1 ·). Fluent/common word order
    * scores high; shuffled or boilerplate-injected text scores low.
    *
    * Exactness: no log-perplexity (libm ln ulps differ across engines) —
    * the mean of 6dp-rounded rational probabilities, summed as
    * DECIMAL(18,6), one final double divide. Bigram extraction is
    * SHUFFLE-FREE: an array transform over the split tokens (no
    * self-join, no per-doc window sort); the model tables are two
    * groupBys bounded by |vocab| and |vocab|², broadcast back. At an
    * open-vocab 100 TB corpus the broadcast side is the trimmed model
    * (top-k bigrams), the standard CCNet construction. */
  private def tLmScore(spark: SparkSession, d: String): DataFrame = {
    val bigrams = Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("s"))
      .select(col("doc_id"), explode(expr(
        "transform(slice(s, 1, size(s) - 1), (w, i) -> struct(w AS w1, s[i + 1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    bigrams
      .join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .withColumn("p", expr(
        "CAST(round(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE), 6) AS DECIMAL(18,6))"))
      .groupBy("doc_id")
      .agg(sum(col("p")).as("sp"), count(lit(1)).as("nb"))
      .select(col("doc_id"),
        expr("CAST(sp AS DOUBLE) / CAST(nb AS DOUBLE)").as("lm_score"))
      .orderBy("doc_id")
  }

  private val tLmScoreSql =
    """WITH b AS (SELECT doc_id, u.w1, u.w2
              FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
                   UNNEST(list_transform(s[1:len(s) - 1],
                     (w, i) -> {'w1': w, 'w2': s[i + 1]})) AS r(u)),
       c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
       c1 AS (SELECT w1, COUNT(*) AS c1 FROM b GROUP BY 1),
       p AS (SELECT b.doc_id,
               CAST(round(CAST(c2.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS p
             FROM b JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
       SELECT doc_id,
              CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lm_score
       FROM p GROUP BY doc_id ORDER BY doc_id"""

  override def queries: Seq[Q] = Seq(
    Q("t_tokens", tTokens, Some(tTokensSql)),
    Q("t_bm25", tBm25, Some(tBm25Sql)),
    Q("t_lm_score", tLmScore, Some(tLmScoreSql)),
    Q("t_vocab", tVocab, Some(tVocabSql)),
    Q("t_scrub", tScrub, Some(tScrubSql)),
    Q("t_tfidf", tTfidf, Some(tTfidfSql)),
    Q("t_rep", tRepetition, Some(tRepetitionSql)),
    Q("t_quality", tQuality, Some(tQualitySql)),
    Q("t_langid", tLangid, Some(tLangidSql)),
    Q("t_fingerprint", tFingerprint, Some(tFingerprintSql)),
    Q("t_filter_pipeline", tFilterPipeline, Some(tFilterSql)),
    Q("t_decontam", tDecontam, Some(tDecontamSql)))
}
