package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity
import graft.text.Bm25

/** Round-9 ranking/eval pack (part 2): MAP + precision/recall@k over the
  * BM25 batch ranking, ColBERT-style MaxSim late-interaction retrieval,
  * and int8 scalar-quantized ANN graded against the exact top-k —
  * registered as its own trailing bench group (the r7 discipline:
  * established groups keep apples-to-apples rows round over round).
  */
object RankQ extends QueryPack {

  /** Graded retrieval eval beyond `t_mrr`'s first-hit metric: per query,
    * average precision (the area-under-PR summary ranking people tune
    * on), precision@10 and recall@10 — all integer basis points (each
    * precision floors to bp BEFORE averaging, so both engines do pure
    * integer arithmetic; no float drift). Relevance = the
    * all-query-terms-present oracle derived from the index postings
    * (the `t_mrr` discipline: the metric is measured, not asserted).
    * Query 4 matches nothing → the n_rel=0 / all-zero row is covered.
    *
    * Scale shape: one postings pass for the batch ranking (audited in
    * `t_bm25_batch`), a |queries|-bounded relevance join, and per-query
    * windows over only the RELEVANT retrieved rows (≤ n_rel each) —
    * the full ranking is never globally sorted. */
  private def tRankEval(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val queries = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "merge"),
      (2L, "join"), (2L, "scan"),
      (3L, "stream"), (3L, "window"), (3L, "sort"),
      (4L, "zzz_unseen_term")) // matches nothing: the all-zero row
      .toDF("query_id", "term")
    val docs = Tables.documents(spark, d)
    val index = Bm25.buildIndex(docs)
    val ranked = Bm25.scoreBatchFromIndex(index, queries, k = Int.MaxValue,
      docLengths = Some(Bm25.docLengths(docs)))
    val dtoks = index.select("doc_id", "tok")
    val q = queries.select(col("query_id"), col("term").as("tok")).distinct()
    val qn = q.groupBy("query_id").agg(count(lit(1)).as("nt"))
    val rel = dtoks.join(q, Seq("tok"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("m"))
      .join(qn, Seq("query_id"))
      .filter(col("m") === col("nt"))
      .select("query_id", "doc_id")
    val nr = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy("query_id").orderBy("rank")
    val perq = ranked.join(rel, Seq("query_id", "doc_id"))
      .withColumn("i", row_number().over(w))
      .withColumn("prec_bp", expr("(cast(i as bigint) * 10000) div rank"))
      .groupBy("query_id")
      .agg(sum(col("prec_bp")).as("sp"),
        sum(when(col("rank") <= 10, 1L).otherwise(0L)).as("h10"))
    q.select("query_id").distinct()
      .join(nr, Seq("query_id"), "left")
      .join(perq, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        expr("CASE WHEN coalesce(n_rel, cast(0 as bigint)) = 0 " +
          "THEN cast(0 as bigint) ELSE sp div n_rel END").as("ap_bp"),
        (coalesce(col("h10"), lit(0L)) * 1000L).as("p10_bp"),
        expr("CASE WHEN coalesce(n_rel, cast(0 as bigint)) = 0 " +
          "THEN cast(0 as bigint) " +
          "ELSE (coalesce(h10, cast(0 as bigint)) * 10000) div n_rel END")
          .as("r10_bp"))
      .orderBy("query_id")
  }

  private val tRankEvalSql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS tot FROM dl),
       q(query_id, tok) AS (VALUES
         (CAST(1 AS BIGINT), 'vector'), (1, 'hash'), (1, 'merge'),
         (2, 'join'), (2, 'scan'),
         (3, 'stream'), (3, 'window'), (3, 'sort'),
         (4, 'zzz_unseen_term')),
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
               FROM scored GROUP BY 1, 2),
       rk AS (SELECT query_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS rnk
              FROM agg),
       dtoks AS (SELECT DISTINCT doc_id, tok FROM toks),
       qn AS (SELECT query_id, COUNT(DISTINCT tok) AS nt FROM q GROUP BY 1),
       rel AS (SELECT q.query_id, d.doc_id
               FROM dtoks d JOIN q ON d.tok = q.tok
               JOIN qn ON qn.query_id = q.query_id
               GROUP BY q.query_id, d.doc_id, qn.nt
               HAVING COUNT(*) = qn.nt),
       nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
              FROM rel GROUP BY 1),
       rr AS (SELECT query_id, rnk,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY rnk) AS i
              FROM rk JOIN rel USING (query_id, doc_id)),
       perq AS (SELECT query_id,
                       SUM((CAST(i AS BIGINT) * 10000) // rnk) AS sp,
                       SUM(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END) AS h10
                FROM rr GROUP BY 1)
       SELECT query_id,
              COALESCE(n_rel, 0) AS n_rel,
              CAST(CASE WHEN COALESCE(n_rel, 0) = 0 THEN 0
                        ELSE sp // n_rel END AS BIGINT) AS ap_bp,
              CAST(COALESCE(h10, 0) * 1000 AS BIGINT) AS p10_bp,
              CAST(CASE WHEN COALESCE(n_rel, 0) = 0 THEN 0
                        ELSE (COALESCE(h10, 0) * 10000) // n_rel
                   END AS BIGINT) AS r10_bp
       FROM (SELECT DISTINCT query_id FROM q) qq
       LEFT JOIN nr USING (query_id) LEFT JOIN perq USING (query_id)
       ORDER BY query_id"""

  /** MaxSim late-interaction top-5 ([[Similarity.maxSimTopK]]): vectors
    * grouped into 10-vector "documents" by `vec_id div 10`, group 0 as
    * the multi-vector query. Integer ten-thousandth scores → BIGINT-
    * exact sums on both engines. */
  private def simMaxsim(spark: SparkSession, d: String): DataFrame =
    Similarity.maxSimTopK(Tables.embeddings(spark, d),
      queryGroup = 0L, groupSize = 10, k = 5)

  private val simMaxsimSql =
    """WITH v AS (SELECT vec_id, vec_id // 10 AS gid,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[]))) AS nv
              FROM embeddings),
       q AS (SELECT vec_id AS q_id, nv AS qv FROM v WHERE gid = 0),
       c AS (SELECT gid, nv AS cv FROM v WHERE gid <> 0),
       d AS (SELECT gid, q_id,
                    CAST(round(list_dot_product(qv, cv) * 10000, 0)
                         AS BIGINT) AS dot_tt
             FROM c CROSS JOIN q),
       m AS (SELECT gid, q_id, MAX(dot_tt) AS m_tt FROM d GROUP BY 1, 2),
       s AS (SELECT gid, CAST(COUNT(*) AS BIGINT) AS n_q,
                    CAST(SUM(m_tt) AS BIGINT) AS maxsim_tt
             FROM m GROUP BY 1)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY maxsim_tt DESC, gid) AS INT)
                AS rank,
              gid AS group_id, n_q, maxsim_tt
       FROM s ORDER BY maxsim_tt DESC, gid LIMIT 5"""

  /** Recall@5 of the int8 scalar-quantized ranking ([[Similarity.sq8TopK]])
    * against the exact brute-force top-5 — the SQ8 accuracy dial measured
    * in the result, the `sim_recall_lsh` discipline. */
  private def simSq8(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    val q = e.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopKAgg(q, e, k = 5)
      .select("query_id", "neighbor_id")
    val approx = Similarity.sq8TopK(q, e, k = 5)
      .select("query_id", "neighbor_id")
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("(coalesce(hits, CAST(0 AS BIGINT)) * 10000) div 5")
          .as("recall_bp"))
      .orderBy("query_id")
  }

  private val simSq8Sql =
    s"""WITH exact AS (${SimQ.simTopkSql}),
       vv AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[]))) AS nv
              FROM embeddings),
       qz AS (SELECT vec_id,
                     list_transform(nv, x -> CAST(round(x * 127, 0) AS INT))
                       AS qv
              FROM vv),
       qs AS (SELECT vec_id AS query_id, qv AS qq FROM qz
              WHERE vec_id % 25 = 0),
       ap AS (SELECT query_id, vec_id AS neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY CAST(list_dot_product(qq::DOUBLE[],
                                                      qv::DOUBLE[]) AS BIGINT)
                                  DESC, vec_id) AS rnk
              FROM qz CROSS JOIN qs WHERE vec_id <> query_id),
       a5 AS (SELECT query_id, neighbor_id FROM ap WHERE rnk <= 5),
       h AS (SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS hits
             FROM exact e JOIN a5
               ON e.query_id = a5.query_id AND e.neighbor_id = a5.neighbor_id
             GROUP BY 1)
       SELECT qq.query_id,
              CAST(COALESCE(hits, 0) AS BIGINT) AS hits,
              CAST((COALESCE(hits, 0) * 10000) // 5 AS BIGINT) AS recall_bp
       FROM (SELECT DISTINCT query_id FROM qs) qq
       LEFT JOIN h USING (query_id) ORDER BY query_id"""

  /** Pseudo-relevance-feedback query expansion (RM3-lite): score the
    * seed terms, take the top-10 feedback docs, promote the 3 heaviest
    * non-seed/non-stopword terms from THEIR postings (tf-desc, term-asc
    * tie-break), and re-score with the expanded term set — the classic
    * two-pass recall booster a retrieval stack layers on BM25. Fully
    * relational end to end: the expansion terms never touch the driver
    * (they stay a 3-row relation unioned into the second pass's query
    * TABLE), so the same plan runs at any corpus size. Both passes ride
    * the audited one-postings-scan batch scorer; the feedback-doc join
    * is 10 rows, the expansion pick a TakeOrderedAndProject. */
  private def tPrfExpand(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val seeds = Seq("vector", "hash")
    val stop = Seq("the", "a")
    val docs = Tables.documents(spark, d)
    // Four consumers read the index (feedback scoring, expansion pick,
    // df/stats, final scoring) — materialize the tokenize+tf build ONCE
    // instead of letting Catalyst inline it into every consumer.
    val index = Bm25.buildIndex(docs).localCheckpoint()
    val q1 = seeds.map(t => (1L, t)).toDF("query_id", "term")
    val fb = Bm25.scoreBatchFromIndex(index, q1, k = 10)
      .select("doc_id")
    val exp = index
      .join(fb, Seq("doc_id"), "left_semi")
      .filter(!col("tok").isin(seeds ++ stop: _*))
      .groupBy("tok").agg(sum(col("tfreq")).as("w"))
      .orderBy(col("w").desc, col("tok").asc)
      .limit(3)
      .select(lit(1L).as("query_id"), col("tok").as("term"))
    val q2 = q1.unionByName(exp)
    // (Measured non-fixes, sf1: checkpointing q2 and a (doc, dlen)
    // sidecar ADDED ~1 s — the second pass's broadcast re-evaluations
    // all read the checkpointed index, so they were already cheap and
    // the extra materialization jobs were pure overhead.)
    Bm25.scoreBatchFromIndex(index, q2, k = 10)
      .select("doc_id", "rank", "score")
      .orderBy("rank")
  }

  private val tPrfExpandSql = {
    // One BM25 batch pass over a term-set CTE (the t_bm25_batch chain
    // with the term set as a relation instead of literals).
    def pass(termsCte: String, out: String) =
      s"""dft_$out AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
               WHERE tok IN (SELECT term FROM $termsCte) GROUP BY 1),
       tf_$out AS (SELECT doc_id, tok, COUNT(*) AS tfreq FROM toks
              WHERE tok IN (SELECT term FROM $termsCte) GROUP BY 1, 2),
       sc_$out AS (SELECT doc_id,
             CAST(round(
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tfreq AS DOUBLE) * 2.2)
                  / (CAST(tfreq AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dlen AS DOUBLE)
                         / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
               6) AS DECIMAL(18,6)) AS contrib
           FROM tf_$out JOIN dft_$out USING (tok) JOIN dl USING (doc_id)
           CROSS JOIN stats),
       rk_$out AS (SELECT doc_id, CAST(SUM(contrib) AS DOUBLE) AS score,
                     ROW_NUMBER() OVER (
                       ORDER BY CAST(SUM(contrib) AS DOUBLE) DESC, doc_id)
                       AS rnk
              FROM sc_$out GROUP BY doc_id)"""
    s"""WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS tot FROM dl),
       seeds(term) AS (VALUES ('vector'), ('hash')),
       ${pass("seeds", "p1")},
       fb AS (SELECT doc_id FROM rk_p1 WHERE rnk <= 10),
       exp AS (SELECT tok AS term
               FROM (SELECT tok, SUM(c) AS w FROM (
                       SELECT t.tok, COUNT(*) AS c FROM toks t
                       JOIN fb ON t.doc_id = fb.doc_id
                       WHERE t.tok NOT IN ('vector', 'hash', 'the', 'a')
                       GROUP BY t.doc_id, t.tok) GROUP BY tok)
               ORDER BY w DESC, term LIMIT 3),
       q2(term) AS (SELECT term FROM seeds UNION ALL SELECT term FROM exp),
       ${pass("q2", "p2")}
       SELECT doc_id, CAST(rnk AS INT) AS rank, score
       FROM rk_p2 WHERE rnk <= 10 ORDER BY rank"""
  }

  def queries: Seq[Q] = Seq(
    Q("t_rank_eval", tRankEval, Some(tRankEvalSql)),
    Q("t_prf_expand", tPrfExpand, Some(tPrfExpandSql)),
    Q("sim_maxsim", simMaxsim, Some(simMaxsimSql)),
    Q("sim_sq8", simSq8, Some(simSq8Sql)))
}
