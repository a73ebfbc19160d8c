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

  /** Per-document salient term — the TF-IDF argmax through
    * [[graft.text.Lm.salientTerm]] (rational IDF, no libm; see there).
    * Registered UN-capped: the df-side join strategy is AQE's size-based
    * choice (broadcast at this SF because the vocab is genuinely small),
    * never a forced hint — `vocabTopK` bounds the df broadcast when a
    * corpus-independent cap is wanted (ExtensionsSpec covers the capped
    * path). Both frequency aggregations re-run the token explosion from
    * the scan. Deliberate: a repartition boundary here would let
    * ReusedExchange tokenize once, but materializing the exploded
    * stream (larger than the input text) costs more than the second
    * columnar scan + map-side partials — measured 0.8 s vs 1.0-1.2 s
    * at sf0.1, and the same asymmetry holds at scale. */
  private def tTfidf(spark: SparkSession, d: String): DataFrame =
    graft.text.Lm.salientTerm(Tables.documents(spark, d))
      .orderBy("doc_id")

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
    graft.text.Bm25.score(Tables.documents(spark, d),
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

  /** Batch-of-queries BM25 against the postings index: 3 query rows
    * scored in ONE pass over the postings
    * ([[graft.text.Bm25.scoreBatchFromIndex]] — the `ivfSearchIndex`
    * shape on the lexical side), per-query top-5 by (score desc,
    * doc_id). Query 1 is `t_bm25`'s exact term set, so the per-query
    * equivalence is also oracle-visible, not just spec-asserted. */
  private def tBm25Batch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val queries = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "merge"),
      (2L, "join"), (2L, "scan"),
      (3L, "stream"), (3L, "window"), (3L, "sort"))
      .toDF("query_id", "term")
    graft.text.Bm25.scoreBatch(Tables.documents(spark, d), queries, k = 5)
      .orderBy("query_id", "rank")
  }

  private val tBm25BatchSql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS tot FROM dl),
       q(query_id, tok) AS (VALUES
         (CAST(1 AS BIGINT), 'vector'), (1, 'hash'), (1, 'merge'),
         (2, 'join'), (2, 'scan'),
         (3, 'stream'), (3, 'window'), (3, 'sort')),
       dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
               WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tfreq FROM toks
              WHERE tok IN (SELECT tok FROM q) GROUP BY 1, 2),
       scored AS (SELECT q.query_id, tf.doc_id,
             CAST(round(
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tfreq AS DOUBLE) * 2.2)
                  / (CAST(tfreq AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dlen AS DOUBLE)
                         / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
               6) AS DECIMAL(18,6)) AS contrib
           FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id)
                JOIN q USING (tok)
           CROSS JOIN stats),
       agg AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS DOUBLE) AS score
               FROM scored GROUP BY 1, 2)
       SELECT query_id, rank, doc_id, score FROM (
         SELECT query_id, doc_id, score,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS INT) AS rank
         FROM agg)
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Corpus-trained bigram-LM quality score (the CCNet-style perplexity
    * filter): per document, the MEAN transition probability of its
    * IN-MODEL bigrams under the corpus's own TRIMMED bigram model —
    * P(w2|w1) = count(w1 w2) / count(w1 ·), model = the top-500 bigrams
    * by (count desc, w1, w2). Fluent/common word order scores high;
    * shuffled or boilerplate-injected text scores low; a document with
    * no in-model bigram scores 0.0.
    *
    * The trim is the 100 TB contract, not a tuning knob: the broadcast
    * side is ≤ modelTopK rows BY PARAMETER (corpus-independent), where
    * the untrimmed |vocab|² table grows with the corpus — see
    * [[graft.text.Lm.lmScore]] for the full scale + exactness story.
    * 500 of the ~916 (sf0.01) / ~931 (sf0.1) distinct bigrams means the
    * oracle genuinely replays the trim at both verify scales. */
  private def tLmScore(spark: SparkSession, d: String): DataFrame =
    graft.text.Lm.lmScore(Tables.documents(spark, d), modelTopK = 500)
      .orderBy("doc_id")

  private[queries] val tLmScoreSql =
    """WITH b AS (SELECT doc_id, u.w1, u.w2
              FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
                   UNNEST(list_transform(s[1:len(s) - 1],
                     (w, i) -> {'w1': w, 'w2': s[i + 1]})) AS r(u)),
       c2f AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
       m AS (SELECT * FROM c2f ORDER BY c2 DESC, w1, w2 LIMIT 500),
       c1 AS (SELECT w1, COUNT(*) AS c1 FROM b GROUP BY 1),
       p AS (SELECT b.doc_id,
               CAST(round(CAST(m.c2 AS DOUBLE) / CAST(c1.c1 AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS p
             FROM b JOIN m USING (w1, w2) JOIN c1 USING (w1)),
       agg AS (SELECT doc_id,
                 CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lm_score
               FROM p GROUP BY doc_id)
       SELECT d.doc_id, COALESCE(agg.lm_score, 0.0) AS lm_score
       FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""

  override def queries: Seq[Q] = Seq(
    Q("t_tokens", tTokens, Some(tTokensSql)),
    Q("t_bm25", tBm25, Some(tBm25Sql)),
    Q("t_bm25_batch", tBm25Batch, Some(tBm25BatchSql)),
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
