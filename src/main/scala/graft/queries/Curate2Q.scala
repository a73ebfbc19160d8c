package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Corpus

/** Round-9 curation pack (part 2): length-bucketed batching waste
  * accounting, token-budget allocation across sources, curriculum phase
  * scheduling, and a Gopher-style per-rule quality audit — registered as
  * its own trailing bench group (the r7 discipline).
  */
object Curate2Q extends QueryPack {

  /** Padding-waste accounting for length-bucketed batching
    * ([[Corpus.lengthBuckets]], width 64 chars): per bucket, the pad
    * overhead within the bucket and the saving vs padding the same rows
    * to the global max — the report that justifies (or kills) a
    * length-bucketing stage before anyone writes it. */
  private def cLengthBuckets(spark: SparkSession, d: String): DataFrame =
    Corpus.lengthBuckets(Tables.documents(spark, d), "n_chars", 64)
      .orderBy("bucket")

  private val cLengthBucketsSql =
    """WITH b AS (SELECT CAST(n_chars AS BIGINT) // 64 AS bucket,
                       CAST(n_chars AS BIGINT) AS l
                FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
       per AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(l) AS BIGINT) AS sum_len,
                      MAX(l) AS bucket_max
               FROM b GROUP BY 1),
       g AS (SELECT MAX(bucket_max) AS gmax FROM per)
       SELECT bucket, n_docs, sum_len, bucket_max,
              n_docs * bucket_max AS padded,
              CAST(((n_docs * bucket_max - sum_len) * 10000)
                   // (n_docs * bucket_max) AS BIGINT) AS waste_bp,
              CAST(((n_docs * gmax - n_docs * bucket_max) * 10000)
                   // (n_docs * gmax) AS BIGINT) AS save_bp
       FROM per CROSS JOIN g ORDER BY bucket"""

  /** Token-budget waterfall across the 20 sources
    * ([[Corpus.tokenBudget]], budget 120k tokens ~ the sf0.01 corpus
    * mass): equal fair shares, small sources capped at what they have,
    * leftover redistributed once. `fill_bp` = 10000 marks a fully-
    * consumed source — the "go collect more of this" signal. */
  private def cTokenBudget(spark: SparkSession, d: String): DataFrame =
    Corpus.tokenBudget(Tables.documents(spark, d), "source", "n_chars",
        budget = 120000L)
      .orderBy("source")

  private val cTokenBudgetSql =
    """WITH per AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS avail_tok
                  FROM documents GROUP BY 1),
       n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM per),
       r1 AS (SELECT source, avail_tok,
                     CAST(120000 // nn AS BIGINT) AS want_tok,
                     LEAST(avail_tok, CAST(120000 // nn AS BIGINT)) AS a1
              FROM per CROSS JOIN n),
       lf AS (SELECT CAST(120000 - SUM(a1) AS BIGINT) AS leftover,
                     CAST(SUM(CASE WHEN avail_tok > a1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_open
              FROM r1),
       r2 AS (SELECT source, avail_tok, want_tok,
                     CASE WHEN avail_tok > a1 AND n_open > 0
                          THEN LEAST(avail_tok, a1 + leftover // n_open)
                          ELSE a1 END AS alloc_tok
              FROM r1 CROSS JOIN lf)
       SELECT source, avail_tok, want_tok, alloc_tok,
              CAST(CASE WHEN avail_tok = 0 THEN 0
                        ELSE (alloc_tok * 10000) // avail_tok
                   END AS BIGINT) AS fill_bp
       FROM r2 ORDER BY source"""

  /** Curriculum schedule by stopword-density score
    * ([[Corpus.curriculumPhase]], 3 equal-width bands between the
    * observed global min/max — a 1-row agg broadcast, never a global
    * sort/percentile pass): per phase, doc/token mass, the cumulative
    * token schedule, and each phase's share. The cumulative window runs
    * over exactly `phases` rows — bounded by construction. */
  private def cCurriculum(spark: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(spark, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("wc"),
        size(filter(split(col("text"), " "),
          t => t === "the" || t === "a")).cast("long").as("sw"))
      .withColumn("sw_bp", expr("(sw * 10000) div wc"))
    val per = Corpus.curriculumPhase(scored, "sw_bp", 3)
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"), sum(col("wc")).as("n_tok"))
    per.crossJoin(broadcast(per.agg(sum(col("n_tok")).as("__tot"))))
      .withColumn("cum_tok", sum(col("n_tok")).over(Window.orderBy("phase")))
      .select(col("phase"), col("n_docs"), col("n_tok"), col("cum_tok"),
        expr("(n_tok * 10000) div __tot").as("share_bp"))
      .orderBy("phase")
  }

  private val cCurriculumSql =
    """WITH s AS (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS wc,
                CAST(len(list_filter(string_split(text, ' '),
                  t -> t = 'the' OR t = 'a')) AS BIGINT) AS sw
              FROM documents),
       sb AS (SELECT doc_id, wc, (sw * 10000) // wc AS sw_bp FROM s),
       b AS (SELECT MIN(sw_bp) AS mn, MAX(sw_bp) AS mx FROM sb),
       p AS (SELECT doc_id, wc,
                    CAST(LEAST(2, ((sw_bp - mn) * 3) // (mx - mn + 1))
                         AS INT) AS phase
             FROM sb CROSS JOIN b),
       per AS (SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(wc) AS BIGINT) AS n_tok
               FROM p GROUP BY 1),
       tot AS (SELECT SUM(n_tok) AS tt FROM per)
       SELECT phase, n_docs, n_tok,
              CAST(SUM(n_tok) OVER (ORDER BY phase) AS BIGINT) AS cum_tok,
              CAST((n_tok * 10000) // tt AS BIGINT) AS share_bp
       FROM per CROSS JOIN tot ORDER BY phase"""

  /** Gopher-style composite quality audit (Rae et al. 2021 §A1.1
    * re-expressed for this corpus): five rules — word count in [20, 90],
    * mean word length in [3, 8], top-token share ≤ 20 % (repetition),
    * type-token ratio ≥ 30 %, and a stopword-presence check — each
    * counted SEPARATELY so the report says which rule is doing the
    * rejecting (the number a curation team actually argues about), plus
    * the kept count under all five. All ratio thresholds are integer
    * cross-multiplications — no float, engine-identical.
    *
    * Scale shape: one (doc, token) partial-agg cascade (tf → per-doc
    * stats), one narrow per-doc projection joined back on doc_id, and a
    * 1-row conditional-sum audit. */
  private def tGopherAudit(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val st = tf.groupBy("doc_id").agg(
      sum(col("c")).as("wc"), count(lit(1)).as("ndist"),
      max(col("c")).as("maxtf"))
    val pr = docs.select(col("doc_id"),
      (length(col("text")) - (size(split(col("text"), " ")) - 1))
        .cast("long").as("nonspace"),
      (array_contains(split(col("text"), " "), "the") ||
        array_contains(split(col("text"), " "), "a")).as("has_stop"))
    st.join(pr, Seq("doc_id"))
      .select(
        (col("wc") < 20 || col("wc") > 90).as("f_wc"),
        (!(col("nonspace") >= col("wc") * 3 &&
          col("nonspace") <= col("wc") * 8)).as("f_mwl"),
        (col("maxtf") * 5 > col("wc")).as("f_rep"),
        (col("ndist") * 10 < col("wc") * 3).as("f_ttr"),
        (!col("has_stop")).as("f_stop"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("f_wc"), 1L).otherwise(0L)).as("fail_wc"),
        sum(when(col("f_mwl"), 1L).otherwise(0L)).as("fail_mwl"),
        sum(when(col("f_rep"), 1L).otherwise(0L)).as("fail_rep"),
        sum(when(col("f_ttr"), 1L).otherwise(0L)).as("fail_ttr"),
        sum(when(col("f_stop"), 1L).otherwise(0L)).as("fail_stop"),
        sum(when(!col("f_wc") && !col("f_mwl") && !col("f_rep") &&
          !col("f_ttr") && !col("f_stop"), 1L).otherwise(0L)).as("kept"))
  }

  private val tGopherAuditSql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       st AS (SELECT doc_id, SUM(c) AS wc, COUNT(*) AS ndist,
                     MAX(c) AS maxtf
              FROM tf GROUP BY 1),
       pr AS (SELECT doc_id,
                     CAST(length(text) - (len(string_split(text, ' ')) - 1)
                          AS BIGINT) AS nonspace,
                     (list_contains(string_split(text, ' '), 'the') OR
                      list_contains(string_split(text, ' '), 'a')) AS has_stop
              FROM documents),
       f AS (SELECT (wc < 20 OR wc > 90) AS f_wc,
                    NOT (nonspace >= wc * 3 AND nonspace <= wc * 8) AS f_mwl,
                    (maxtf * 5 > wc) AS f_rep,
                    (ndist * 10 < wc * 3) AS f_ttr,
                    NOT has_stop AS f_stop
             FROM st JOIN pr USING (doc_id))
       SELECT CAST(COUNT(*) AS BIGINT) AS total,
              CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_wc,
              CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_mwl,
              CAST(SUM(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_rep,
              CAST(SUM(CASE WHEN f_ttr THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_ttr,
              CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT)
                AS fail_stop,
              CAST(SUM(CASE WHEN NOT f_wc AND NOT f_mwl AND NOT f_rep
                             AND NOT f_ttr AND NOT f_stop
                        THEN 1 ELSE 0 END) AS BIGINT) AS kept
       FROM f"""

  /** Per-source curation league table — the dashboard a curation team
    * reviews before renegotiating a data source: per source, doc/token
    * mass, mean stopword-density score (integer bp, floored per doc
    * BEFORE averaging — both engines pure-integer), and the
    * [[tGopherAudit]] five-rule rejection rate. A source whose
    * reject_bp is an outlier is the one to resample or drop. Shuffle
    * shape: the same (doc, token) partial-agg cascade as the audit,
    * then ONE |sources|-bounded group. */
  private def tSourceQuality(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val st = tf.groupBy("doc_id").agg(
      sum(col("c")).as("wc"), count(lit(1)).as("ndist"),
      max(col("c")).as("maxtf"))
    val pr = docs.select(col("doc_id"), col("source"),
      (length(col("text")) - (size(split(col("text"), " ")) - 1))
        .cast("long").as("nonspace"),
      (array_contains(split(col("text"), " "), "the") ||
        array_contains(split(col("text"), " "), "a")).as("has_stop"),
      size(filter(split(col("text"), " "),
        t => t === "the" || t === "a")).cast("long").as("sw"))
    st.join(pr, Seq("doc_id"))
      .withColumn("sw_bp", expr("(sw * 10000) div wc"))
      .withColumn("rejected",
        col("wc") < 20 || col("wc") > 90 ||
          !(col("nonspace") >= col("wc") * 3 &&
            col("nonspace") <= col("wc") * 8) ||
          col("maxtf") * 5 > col("wc") ||
          col("ndist") * 10 < col("wc") * 3 ||
          !col("has_stop"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("wc")).as("n_tok"),
        sum(col("sw_bp")).as("ssw"),
        sum(when(col("rejected"), 1L).otherwise(0L)).as("n_rejected"))
      .select(col("source"), col("n_docs"), col("n_tok"),
        expr("ssw div n_docs").as("mean_sw_bp"),
        col("n_rejected"),
        expr("(n_rejected * 10000) div n_docs").as("reject_bp"))
      .orderBy("source")
  }

  private val tSourceQualitySql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       st AS (SELECT doc_id, SUM(c) AS wc, COUNT(*) AS ndist,
                     MAX(c) AS maxtf
              FROM tf GROUP BY 1),
       pr AS (SELECT doc_id, source,
                     CAST(length(text) - (len(string_split(text, ' ')) - 1)
                          AS BIGINT) AS nonspace,
                     (list_contains(string_split(text, ' '), 'the') OR
                      list_contains(string_split(text, ' '), 'a')) AS has_stop,
                     CAST(len(list_filter(string_split(text, ' '),
                       t -> t = 'the' OR t = 'a')) AS BIGINT) AS sw
              FROM documents),
       f AS (SELECT source, wc, (sw * 10000) // wc AS sw_bp,
                    (wc < 20 OR wc > 90
                     OR NOT (nonspace >= wc * 3 AND nonspace <= wc * 8)
                     OR maxtf * 5 > wc
                     OR ndist * 10 < wc * 3
                     OR NOT has_stop) AS rejected
             FROM st JOIN pr USING (doc_id))
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(wc) AS BIGINT) AS n_tok,
              CAST(SUM(sw_bp) // COUNT(*) AS BIGINT) AS mean_sw_bp,
              CAST(SUM(CASE WHEN rejected THEN 1 ELSE 0 END) AS BIGINT)
                AS n_rejected,
              CAST((SUM(CASE WHEN rejected THEN 1 ELSE 0 END) * 10000)
                   // COUNT(*) AS BIGINT) AS reject_bp
       FROM f GROUP BY source ORDER BY source"""

  /** Deterministic round-robin source interleave — the training ORDER a
    * mixed corpus ships in: within each source docs are shuffled by
    * their md5 (RNG-free, partitioning-independent), and the global
    * order is (within-source rank, source), so consecutive positions
    * rotate through the sources — the "no long single-source runs"
    * guarantee data-order-sensitive training wants, without a global
    * RNG pass. First 40 positions shown; the pick is
    * TakeOrderedAndProject (per-partition top-k), never a global sort,
    * and the within-source window partitions BY source — no global
    * window at any size. */
  private def cInterleave(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("h").asc, col("doc_id").asc)
    val ranked = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w))
      .orderBy(col("rk").asc, col("source").asc)
      .limit(40)
    ranked
      .withColumn("pos", row_number().over(
        Window.orderBy(col("rk").asc, col("source").asc)))
      .select(col("pos").cast("int").as("pos"), col("doc_id"),
        col("source"), col("rk").cast("long").as("rk"))
  }

  private val cInterleaveSql =
    """SELECT CAST(ROW_NUMBER() OVER (ORDER BY rk, source) AS INT) AS pos,
              doc_id, source, CAST(rk AS BIGINT) AS rk
       FROM (SELECT doc_id, source,
                    ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             FROM documents)
       ORDER BY rk, source LIMIT 40"""

  def queries: Seq[Q] = Seq(
    Q("c_interleave", cInterleave, Some(cInterleaveSql)),
    Q("c_length_buckets", cLengthBuckets, Some(cLengthBucketsSql)),
    Q("c_token_budget", cTokenBudget, Some(cTokenBudgetSql)),
    Q("c_curriculum", cCurriculum, Some(cCurriculumSql)),
    Q("t_gopher_audit", tGopherAudit, Some(tGopherAuditSql)),
    Q("t_source_quality", tSourceQuality, Some(tSourceQualitySql)))
}
