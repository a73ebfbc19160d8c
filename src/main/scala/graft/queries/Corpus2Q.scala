package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Corpus

/** Corpus-mixing extensions: temperature-weighted source resampling
  * (the multilingual/multi-source α-rebalancing step) and a tokenizer
  * OOV-rate audit of a hash-split against the train-slice vocabulary.
  */
object Corpus2Q extends QueryPack {

  /** Temperature resampling at α = 1/2: per-source sampling weight
    * w = ⌊√n⌋ (exact integer sqrt — the float sqrt is corrected ±1 with
    * integer comparisons, so both engines agree bit-for-bit at any n),
    * normalized against the largest source into a basis-point keep-rate,
    * applied as the deterministic md5-bucket fractional slice
    * ([[Corpus.hashBucket]] — no RNG, reproducible across engines and
    * reruns). Down-weights head sources ∝ √, the standard α=0.5
    * rebalance. Scale shape: ONE count aggregate (source-dim-sized), a
    * ONE-row max broadcast into the rate projection, and one
    * broadcast-dim join + scan-fused filter over the corpus — the
    * source registry is genuinely small (a config-sized dimension, not
    * corpus-dependent cardinality), so the broadcast is safe at any
    * corpus size. Output is the per-source accounting row. */
  private[graft] def mixTempAccounting(docs: DataFrame): DataFrame = {
    val c = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val s0 = floor(sqrt(col("n").cast("double"))).cast("long")
    val weights = c.withColumn("w",
      when((s0 + 1) * (s0 + 1) <= col("n"), s0 + 1)
        .when(s0 * s0 > col("n"), s0 - 1)
        .otherwise(s0))
    val mx = weights.agg(max("w").as("mx"))
    val rates = weights.crossJoin(broadcast(mx))
      .withColumn("rate_bp", expr("(w * 10000) div mx"))
    val sel = docs
      .join(broadcast(rates.select("source", "rate_bp")), Seq("source"))
      .filter(Corpus.hashBucket(col("doc_id"), 10000) < col("rate_bp"))
      .groupBy("source").agg(count(lit(1)).as("n_selected"))
    rates.join(sel, Seq("source"), "left")
      .withColumn("n_selected", coalesce(col("n_selected"), lit(0L)))
      .select(col("source"), col("n").as("n_docs"), col("w"),
        col("rate_bp"), col("n_selected"))
      .orderBy("source")
  }

  private def cMixTemp(spark: SparkSession, d: String): DataFrame =
    mixTempAccounting(Tables.documents(spark, d))

  private val cMixTempSql =
    """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1),
       w0 AS (SELECT source, n,
                CAST(FLOOR(SQRT(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM c),
       w1 AS (SELECT source, n,
                CASE WHEN (s0 + 1) * (s0 + 1) <= n THEN s0 + 1
                     WHEN s0 * s0 > n THEN s0 - 1
                     ELSE s0 END AS w
              FROM w0),
       m AS (SELECT MAX(w) AS mx FROM w1),
       r AS (SELECT source, n, w, (w * 10000) // mx AS rate_bp FROM w1, m),
       sel AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_selected
               FROM documents d JOIN r USING (source)
               WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 10000 < rate_bp
               GROUP BY 1)
       SELECT source, n AS n_docs, w, rate_bp,
              COALESCE(n_selected, 0) AS n_selected
       FROM r LEFT JOIN sel USING (source) ORDER BY source"""

  /** Bigram OOV rate of the validation slice against the train-slice
    * vocabulary: docs split 20/80 by [[Corpus.hashBucket]] (train =
    * buckets 0-1), vocabulary = distinct train bigrams, and every val
    * bigram OCCURRENCE that never occurs in train counts as
    * out-of-vocabulary — the coverage audit run before freezing a
    * tokenizer or n-gram LM. Per-language integer basis points. Scale
    * shape: bigram extraction is scan-fused (no shuffle); the vocab
    * anti-flag is ONE equi-join whose build side is the distinct train
    * vocabulary — corpus-dependent cardinality, so NO broadcast hint
    * (the t_lm_score lesson): AQE picks the strategy, and at open-vocab
    * scale it degrades gracefully to a shuffle join. */
  private[graft] def oovByLang(docs: DataFrame): DataFrame = {
    val toks = docs
      .withColumn("b", Corpus.hashBucket(col("doc_id"), 10))
      .select(col("lang"), col("b"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("lang"), col("b"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", slice(col("t"), i, lit(2))))).as("g"))
    val vocab = toks.filter(col("b") < 2).select("g").distinct()
      .withColumn("seen", lit(1))
    toks.filter(col("b") >= 2)
      .join(vocab, Seq("g"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp", expr("(n_oov * 10000) div n_bigrams"))
      .orderBy("lang")
  }

  private def tOovRate(spark: SparkSession, d: String): DataFrame =
    oovByLang(Tables.documents(spark, d))

  private val tOovRateSql =
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t,
                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS b
              FROM documents),
       bg AS (SELECT lang, b,
                unnest(list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i+1])) AS g
              FROM d WHERE len(t) >= 2),
       vocab AS (SELECT DISTINCT g FROM bg WHERE b < 2)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              CAST(SUM(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
              (CAST(SUM(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000)
                // CAST(COUNT(*) AS BIGINT) AS oov_bp
       FROM bg LEFT JOIN vocab v ON bg.g = v.g
       WHERE b >= 2 GROUP BY lang ORDER BY lang"""

  def queries: Seq[Q] = Seq(
    Q("c_mix_temp", cMixTemp, Some(cMixTempSql)),
    Q("t_oov_rate", tOovRate, Some(tOovRateSql)))
}
