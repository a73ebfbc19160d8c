package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.link.Link
import graft.text.{Importance, Privacy}

/** Round-8 curation extensions (own trailing bench group — established
  * groups' round-over-round rows stay apples-to-apples):
  *
  *  - PII pseudonymization + masking over the customer table (the
  *    release-prep projection: keyed-hash pseudonym, regex-masked direct
  *    identifier, banded continuous attribute);
  *  - k-anonymity audit of the released quasi-identifier tuple;
  *  - DSIR-style importance selection of the documents raw pool against
  *    a target-domain slice (log-free integer weights — see
  *    [[graft.text.Importance]]).
  */
object CurateQ extends QueryPack {

  /** Pseudonymized customer release: the direct identifier c_name is
    * (a) replaced by a salted-md5 pseudonym (stable → still joinable)
    * and (b) masked in place (first 6 of the 9-digit tail starred);
    * c_acctbal generalizes to a 2000-wide band. Scan-fused projection —
    * redaction costs one pass at any scale. */
  private def tPiiMask(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d).select(
      Privacy.pseudonymize(col("c_name"), "graft").as("pseudonym"),
      regexp_replace(col("c_name"), lit("#[0-9]{6}"), lit("#******"))
        .as("name_masked"),
      col("c_nationkey"), col("c_mktsegment"),
      Privacy.band(col("c_acctbal"), 2000L).as("acctbal_band"))
      .orderBy("pseudonym")

  private val tPiiMaskSql =
    """SELECT md5('graft|' || c_name) AS pseudonym,
         regexp_replace(c_name, '#[0-9]{6}', '#******', 'g') AS name_masked,
         c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 2000) * 2000 AS BIGINT) AS acctbal_band
       FROM customer ORDER BY pseudonym"""

  /** k-anonymity audit of the released tuple (nation, segment, acctbal
    * band): one partial-agg shuffle on the quasi tuple, output
    * |equivalence classes| rows — classes with meets_k = 0 need more
    * generalization before release. */
  private def tKanonAudit(spark: SparkSession, d: String): DataFrame = {
    val released = Tables.customer(spark, d).select(
      col("c_nationkey"), col("c_mktsegment"),
      Privacy.band(col("c_acctbal"), 2000L).as("acctbal_band"))
    Privacy.kAnonymityAudit(released,
        Seq("c_nationkey", "c_mktsegment", "acctbal_band"), k = 5L)
      .orderBy("c_nationkey", "c_mktsegment", "acctbal_band")
  }

  private val tKanonAuditSql =
    """SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 2000) * 2000 AS BIGINT) AS acctbal_band,
         CAST(count(*) AS BIGINT) AS group_size,
         CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS meets_k
       FROM customer
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** DSIR selection: sources src0-src3 are the trusted target domain;
    * the rest of documents is the raw pool, scored by summed log-free
    * token weights and cut to its top 10% (rn·10 ≤ n, ties → doc_id). */
  private val targetSources = Seq("src0", "src1", "src2", "src3")

  private def cAffinitySelect(spark: SparkSession, d: String): DataFrame =
    Importance.selectTopAffinity(Tables.documents(spark, d),
        col("source").isin(targetSources: _*), keepDenom = 10L)
      .orderBy("doc_id")

  private val cAffinitySelectSql = {
    val tgt = targetSources.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (SELECT doc_id, (source IN ($tgt)) AS tgt,
              unnest(string_split(text, ' ')) AS tok FROM documents),
       t2 AS (SELECT * FROM toks WHERE tok <> ''),
       tc AS (SELECT tok,
                CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
                CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
              FROM t2 GROUP BY tok),
       tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                      CAST(sum(cr) AS BIGINT) AS nr FROM tc),
       w AS (SELECT tok, ct * nr - cr * nt AS w FROM tc, tot),
       ds AS (SELECT t2.doc_id, CAST(sum(w.w) AS BIGINT) AS affinity
              FROM t2 JOIN w ON t2.tok = w.tok
              WHERE NOT t2.tgt GROUP BY t2.doc_id),
       r AS (SELECT doc_id, affinity,
               CAST(ROW_NUMBER() OVER (ORDER BY affinity DESC, doc_id)
                 AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
             FROM ds)
       SELECT doc_id, affinity, rn FROM r WHERE rn * 10 <= n
       ORDER BY doc_id"""
  }

  /** Entity-resolution fuzzy match over customer names: all pairs
    * within Levenshtein distance 1, found by deletion-neighborhood
    * blocking + exact verify ([[graft.link.Link.fuzzyPairs]] — never
    * an all-pairs join), first 5000 pairs by (custkey_a, custkey_b)
    * via TakeOrderedAndProject. The oracle replays the same variant
    * generation, block join, and levenshtein verify. */
  private def erFuzzyPairs(spark: SparkSession, d: String): DataFrame =
    Link.fuzzyPairs(Tables.customer(spark, d), "c_custkey", "c_name")
      .select(col("id_a").as("custkey_a"), col("id_b").as("custkey_b"),
        col("key_a").as("name_a"), col("key_b").as("name_b"), col("dist"))
      .orderBy("custkey_a", "custkey_b")
      .limit(5000)

  private val erFuzzyPairsSql =
    """WITH v AS (SELECT c_custkey, c_name,
              CASE WHEN i = 0 THEN c_name
                   ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1)
              END AS variant
            FROM customer CROSS JOIN range(0, 64) t(i)
            WHERE i <= length(c_name)),
       cand AS (SELECT DISTINCT a.c_custkey AS custkey_a,
                       b.c_custkey AS custkey_b,
                       a.c_name AS name_a, b.c_name AS name_b
                FROM v a JOIN v b ON a.variant = b.variant
                                 AND a.c_custkey < b.c_custkey)
       SELECT custkey_a, custkey_b, name_a, name_b,
              CAST(levenshtein(name_a, name_b) AS INT) AS dist
       FROM cand
       WHERE levenshtein(name_a, name_b) <= 1
       ORDER BY custkey_a, custkey_b LIMIT 5000"""

  /** Trained quality classifier: 3 batch-perceptron rounds
    * ([[graft.ml.Perceptron]] — all-BIGINT training, one scan + one
    * partial-agg aggregate per round, driver holds only the 5 weights)
    * separating the DSIR target sources from the raw pool on 5 integer
    * document features (bias, token count, chars, 'the' occurrences,
    * distinct tokens). Output = the training log (round, errors,
    * weights after update); the oracle unrolls all 3 rounds. */
  private def tPercepTrain(spark: SparkSession, d: String): DataFrame = {
    val features = Tables.documents(spark, d).select(
      when(col("source").isin(targetSources: _*), 1L).otherwise(-1L).as("y"),
      lit(1L).as("x0"),
      size(split(col("text"), " ")).cast("long").as("x1"),
      col("n_chars").as("x2"),
      expr("CAST((length(text) - length(replace(text, 'the', ''))) div 3" +
        " AS BIGINT)").as("x3"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("x4"))
    graft.ml.Perceptron.trainBatch(
      features, Seq("x0", "x1", "x2", "x3", "x4"), "y", rounds = 3)
      .orderBy("round")
  }

  private val tPercepTrainSql = {
    val tgt = targetSources.map(s => s"'$s'").mkString(", ")
    // one unrolled round: gradient sums over the rows the incoming
    // weights misclassify, then weights += gradient
    def grad(cur: String, from: String, margin: String) =
      s"""g$cur AS (SELECT CAST(COUNT(*) AS BIGINT) AS errors,
             CAST(COALESCE(SUM(f.y * f.x0), 0) AS BIGINT) AS s0,
             CAST(COALESCE(SUM(f.y * f.x1), 0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(f.y * f.x2), 0) AS BIGINT) AS s2,
             CAST(COALESCE(SUM(f.y * f.x3), 0) AS BIGINT) AS s3,
             CAST(COALESCE(SUM(f.y * f.x4), 0) AS BIGINT) AS s4
           FROM $from WHERE f.y * ($margin) <= 0)"""
    val m = (p: String) => s"$p.w0*f.x0 + $p.w1*f.x1 + $p.w2*f.x2" +
      s" + $p.w3*f.x3 + $p.w4*f.x4"
    s"""WITH f AS (SELECT CASE WHEN source IN ($tgt) THEN CAST(1 AS BIGINT)
                        ELSE CAST(-1 AS BIGINT) END AS y,
             CAST(1 AS BIGINT) AS x0,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
             n_chars AS x2,
             CAST((length(text) - length(replace(text, 'the', ''))) // 3
                  AS BIGINT) AS x3,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x4
           FROM documents),
       ${grad("1", "f f", "0")},
       r1 AS (SELECT errors, s0 AS w0, s1 AS w1, s2 AS w2, s3 AS w3,
                     s4 AS w4 FROM g1),
       ${grad("2", "f f, r1", m("r1"))},
       r2 AS (SELECT g2.errors, r1.w0 + g2.s0 AS w0, r1.w1 + g2.s1 AS w1,
                     r1.w2 + g2.s2 AS w2, r1.w3 + g2.s3 AS w3,
                     r1.w4 + g2.s4 AS w4 FROM g2, r1),
       ${grad("3", "f f, r2", m("r2"))},
       r3 AS (SELECT g3.errors, r2.w0 + g3.s0 AS w0, r2.w1 + g3.s1 AS w1,
                     r2.w2 + g3.s2 AS w2, r2.w3 + g3.s3 AS w3,
                     r2.w4 + g3.s4 AS w4 FROM g3, r2)
       SELECT CAST(1 AS BIGINT) AS round, errors, w0 AS w_x0, w1 AS w_x1,
              w2 AS w_x2, w3 AS w_x3, w4 AS w_x4 FROM r1
       UNION ALL
       SELECT 2, errors, w0, w1, w2, w3, w4 FROM r2
       UNION ALL
       SELECT 3, errors, w0, w1, w2, w3, w4 FROM r3
       ORDER BY round"""
  }

  /** Deterministic uniform 100-doc sample of the corpus
    * ([[graft.text.Corpus.sampleUniform]] — the no-RNG reservoir
    * equivalent: smallest (md5(doc_id), doc_id) wins, executed as
    * TakeOrderedAndProject with per-partition partial top-k, no global
    * sort). Re-ordered by doc_id for output; the oracle replays the
    * same md5 order. */
  private def cSampleUniform(spark: SparkSession, d: String): DataFrame =
    graft.text.Corpus.sampleUniform(
        Tables.documents(spark, d).select(col("doc_id"), col("source"),
          col("n_chars")),
        "doc_id", k = 100)
      .orderBy("doc_id")

  private val cSampleUniformSql =
    """SELECT doc_id, source, n_chars FROM (
         SELECT doc_id, source, n_chars FROM documents
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100)
       ORDER BY doc_id"""

  override def queries: Seq[Q] = Seq(
    Q("t_pii_mask", tPiiMask, Some(tPiiMaskSql)),
    Q("t_kanon_audit", tKanonAudit, Some(tKanonAuditSql)),
    Q("c_affinity_select", cAffinitySelect, Some(cAffinitySelectSql)),
    Q("er_fuzzy_pairs", erFuzzyPairs, Some(erFuzzyPairsSql)),
    Q("t_percep_train", tPercepTrain, Some(tPercepTrainSql)),
    Q("c_sample_uniform", cSampleUniform, Some(cSampleUniformSql)))
}
