package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact.idiv

/** Round-9 mixture-reweighting pack: one DoReMi-style
  * multiplicative-weights step over the per-source loss proxy — the
  * domain-mixture optimization loop's inner update (Xie et al. 2023),
  * re-expressed as exact integer relational algebra. Where
  * `c_mix_temp` SETS a mixture from a temperature prior, this op
  * LEARNS one step of it from measured loss.
  */
object Curate4Q extends QueryPack {

  /** Learning rate η in basis points (η = 1.0). */
  private val EtaBp = 10000L

  /** One multiplicative-weights step over domain (source) weights:
    * per-doc loss proxy = 10⁴ − round(lm_score·10⁴) (the bounded
    * bigram-LM fluency from `t_lm_score`, inverted — low fluency =
    * high loss), per-source integer mean, excess vs the unweighted
    * across-source mean (DoReMi reweights DOMAINS, so the reference
    * point is the domain mean, not the doc mean), then the Hedge
    * update linearized for integer exactness: mult = 1 + η·excess
    * (the (1+ηx) MW variant — no exp, no libm), floor-normalized to
    * Σ new_w_bp ≤ 10⁴. High-loss (hard) domains gain weight — exactly
    * DoReMi's "upweight what the proxy finds hard".
    *
    * Shape: the LM scoring plan (broadcast ≤500-row model), ONE
    * partial-agg shuffle onto the |sources| key, then dim-sized
    * arithmetic with two 1-row cross joins (PlanAuditSpec-listed).
    * Every division is a sign-safe integer floor — bit-identical on
    * both engines. */
  private def cDoremiStep(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val loss = graft.text.Lm.lmScore(docs, modelTopK = 500)
      .join(docs.select("doc_id", "source"), "doc_id")
      .select(col("source"),
        (lit(10000L) - expr("CAST(round(lm_score * 10000) AS BIGINT)"))
          .as("loss_bp"))
    val perSrc = loss.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("loss_bp")).cast("long").as("sum_loss"))
      .select(col("source"), col("n_docs"),
        idiv(col("sum_loss"), col("n_docs")).as("mean_loss_bp"))
    val totals = perSrc.agg(
      count(lit(1)).cast("long").as("n_src"),
      sum(col("mean_loss_bp")).cast("long").as("sum_means"))
    val stepped = perSrc.crossJoin(totals)
      .select(col("source"), col("n_docs"), col("mean_loss_bp"),
        (col("mean_loss_bp") - idiv(col("sum_means"), col("n_src")))
          .as("excess_bp"),
        idiv(lit(10000L), col("n_src")).as("old_w_bp"))
      .select(col("source"), col("n_docs"), col("mean_loss_bp"),
        col("excess_bp"), col("old_w_bp"),
        (lit(10000L) + when(col("excess_bp") < 0,
            -idiv(lit(EtaBp) * -col("excess_bp"), lit(10000L)))
          .otherwise(idiv(lit(EtaBp) * col("excess_bp"), lit(10000L))))
          .as("mult_bp"))
      .withColumn("raw", col("old_w_bp") * col("mult_bp"))
    val denom = stepped.agg(sum(col("raw")).cast("long").as("sum_raw"))
    stepped.crossJoin(denom)
      .select(col("source"), col("n_docs"), col("mean_loss_bp"),
        col("excess_bp"), col("mult_bp"),
        idiv(col("raw") * 10000L, col("sum_raw")).as("new_w_bp"))
      .orderBy("source")
  }

  private val cDoremiStepSql =
    s"""WITH lm AS (${TextQ.tLmScoreSql}),
       loss AS (SELECT d.source,
                CAST(10000 - CAST(round(lm_score * 10000) AS BIGINT)
                     AS BIGINT) AS loss_bp
              FROM lm JOIN documents d USING (doc_id)),
       per_src AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(loss_bp) // COUNT(*) AS BIGINT)
                       AS mean_loss_bp
                   FROM loss GROUP BY 1),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_src,
                      CAST(SUM(mean_loss_bp) AS BIGINT) AS sum_means
               FROM per_src),
       st AS (SELECT source, n_docs, mean_loss_bp,
                     mean_loss_bp - (sum_means // n_src) AS excess_bp,
                     10000 // n_src AS old_w_bp
              FROM per_src, tot),
       mu AS (SELECT source, n_docs, mean_loss_bp, excess_bp, old_w_bp,
                     10000 + (CASE WHEN excess_bp < 0
                              THEN -(($EtaBp * (-excess_bp)) // 10000)
                              ELSE ($EtaBp * excess_bp) // 10000 END)
                       AS mult_bp
              FROM st),
       rw AS (SELECT *, old_w_bp * mult_bp AS raw FROM mu),
       dn AS (SELECT CAST(SUM(raw) AS BIGINT) AS sum_raw FROM rw)
       SELECT source, n_docs, mean_loss_bp,
              CAST(excess_bp AS BIGINT) AS excess_bp,
              CAST(mult_bp AS BIGINT) AS mult_bp,
              CAST((raw * 10000) // sum_raw AS BIGINT) AS new_w_bp
       FROM rw, dn ORDER BY source"""

  /** CCNet-style per-language quality terciles (Wenzek et al. 2020):
    * within each language, documents ranked fluent-first by the
    * bounded bigram-LM score land in head / middle / tail thirds —
    * the bucket assignment CCNet feeds its keep/drop policy. NO
    * global sort (the ml_lift_deciles decomposition, per language):
    * rank = (docs of this language with a strictly better score_bp,
    * from a cumulative window over the BOUNDED per-language bp
    * histogram — ≤ |langs|·10⁴ rows at any corpus size) +
    * (row_number within (lang, score_bp) by doc_id — a per-key
    * window). bucket = (rank−1)·3 div n_lang. Output is the
    * |langs|×3 summary: doc count and the exact bp score range each
    * bucket spans. */
  private def cCcnetBuckets(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, d)
    // Materialized once: `sb` feeds both the histogram side (hist →
    // cum) and the per-row ranking join — without the checkpoint the
    // whole lmScore chain (bigram explode + model build ×3 consumers)
    // evaluates TWICE. O(docs) rows × 3 columns.
    val sb = graft.text.Lm.lmScore(docs, modelTopK = 500)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"),
        expr("CAST(round(lm_score * 10000) AS BIGINT)").as("bp"))
      .localCheckpoint()
    val hist = sb.groupBy("lang", "bp").agg(count(lit(1)).as("n"))
    val wDesc = Window.partitionBy("lang").orderBy(col("bp").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLang = Window.partitionBy("lang").orderBy(col("bp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("above", coalesce(sum(col("n")).over(wDesc), lit(0L)))
      .withColumn("n_lang", sum(col("n")).over(wLang))
      .select("lang", "bp", "above", "n_lang")
    val ranked = sb.join(broadcast(cum), Seq("lang", "bp"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang", "bp").orderBy("doc_id")))
      .withColumn("bidx", expr("(above + rn - 1) * 3 div n_lang"))
    ranked.groupBy("lang", "bidx")
      .agg(count(lit(1)).as("n_docs"),
        max(col("bp")).as("hi_bp"), min(col("bp")).as("lo_bp"))
      .withColumn("bucket",
        when(col("bidx") === 0, "head")
          .when(col("bidx") === 1, "middle").otherwise("tail"))
      .select(col("lang"), col("bidx").cast("long").as("bidx"),
        col("bucket"), col("n_docs"), col("hi_bp"), col("lo_bp"))
      .orderBy("lang", "bidx")
  }

  private val cCcnetBucketsSql =
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
                 CAST(SUM(p) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS lm_score
               FROM p GROUP BY doc_id),
       sb AS (SELECT d.doc_id, d.lang,
                CAST(round(COALESCE(agg.lm_score, 0.0) * 10000) AS BIGINT)
                  AS bp
              FROM documents d LEFT JOIN agg USING (doc_id)),
       hist AS (SELECT lang, bp, CAST(COUNT(*) AS BIGINT) AS n
                FROM sb GROUP BY 1, 2),
       cum AS (SELECT lang, bp,
                 COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY bp DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS above,
                 SUM(n) OVER (PARTITION BY lang) AS n_lang
               FROM hist),
       ranked AS (SELECT s.lang, s.bp,
                    (above + ROW_NUMBER() OVER (PARTITION BY s.lang, s.bp
                       ORDER BY doc_id) - 1) * 3 // n_lang AS bidx
                  FROM sb s JOIN cum ON s.lang = cum.lang AND s.bp = cum.bp)
       SELECT lang, CAST(bidx AS BIGINT) AS bidx,
              CASE WHEN bidx = 0 THEN 'head'
                   WHEN bidx = 1 THEN 'middle' ELSE 'tail' END AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              MAX(bp) AS hi_bp, MIN(bp) AS lo_bp
       FROM ranked GROUP BY lang, bidx ORDER BY lang, bidx"""

  def queries: Seq[Q] = Seq(
    Q("c_doremi_step", cDoremiStep, Some(cDoremiStepSql)),
    Q("c_ccnet_buckets", cCcnetBuckets, Some(cCcnetBucketsSql)))
}
