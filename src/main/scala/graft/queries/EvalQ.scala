package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity
import graft.sketch.Sketch
import graft.text.{Bm25, Corpus}

/** Round-9 curation/eval pack: shard planning with balance accounting,
  * deterministic weighted sampling, MMR-diversified retrieval, an MRR
  * retrieval-quality harness over BM25, and KMV sketch-algebra Jaccard
  * between corpus slices — registered as its own trailing bench group
  * (the r7 discipline: established groups keep apples-to-apples rows).
  */
object EvalQ extends QueryPack {

  /** Pre-flight shard plan for an 8-shard corpus write
    * ([[Corpus.shardPlan]]): per-shard doc/token mass and the
    * share/skew balance dials. ≤ 8 output rows from one partial-agg
    * shuffle — the report that catches the straggler shard BEFORE the
    * multi-hour write. */
  private def cShardPlan(spark: SparkSession, d: String): DataFrame =
    Corpus.shardPlan(Tables.documents(spark, d), "doc_id", "n_chars", 8)
      .orderBy("shard")

  private val cShardPlanSql =
    """WITH b AS (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    % 8 AS shard,
                  n_chars AS w
            FROM documents),
       per AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(w) AS BIGINT) AS n_tok
               FROM b GROUP BY 1),
       tot AS (SELECT SUM(n_tok) AS tot FROM per)
       SELECT shard, n_docs, n_tok,
              CAST((n_tok * 10000) // tot AS BIGINT) AS share_bp,
              CAST((n_tok * 10000 * 8) // tot AS BIGINT) AS skew_bp
       FROM per CROSS JOIN tot ORDER BY shard"""

  /** Length-weighted deterministic 50-doc sample
    * ([[Corpus.sampleWeighted]]): priority = 60-bit md5(doc_id) div
    * n_chars, keep the 50 smallest — longer documents are
    * proportionally likelier, yet the pick is RNG-free and identical
    * on any engine/partitioning. */
  private def cSampleWeighted(spark: SparkSession, d: String): DataFrame =
    Corpus.sampleWeighted(Tables.documents(spark, d), "doc_id", "n_chars", 50)
      .orderBy("prio", "doc_id")

  private val cSampleWeightedSql =
    """SELECT doc_id, text, lang, source, n_chars,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                // n_chars AS BIGINT) AS prio
       FROM documents
       WHERE n_chars IS NOT NULL AND n_chars >= 1
       ORDER BY prio, doc_id LIMIT 50"""

  /** MMR-diversified top-5 for query vector 0 at λ = 0.7
    * ([[Similarity.mmrSelect]]): greedy k passes, each a corpus scan +
    * 1-row argmax; the oracle replays the 5 unrolled rounds. */
  private def simMmr(spark: SparkSession, d: String): DataFrame =
    Similarity.mmrSelect(Tables.embeddings(spark, d),
      queryId = 0L, k = 5, lambdaBp = 7000)

  private val simMmrSql =
    """WITH v AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[]))) AS nv
              FROM embeddings),
       q AS (SELECT nv AS qv FROM v WHERE vec_id = 0),
       c AS (SELECT vec_id, nv,
                    round(list_dot_product(nv, qv), 4) AS rel
             FROM v CROSS JOIN q WHERE vec_id <> 0),
       s1 AS (SELECT vec_id, nv, rel,
                     (7000 * rel - 3000 * 0.0) / 10000.0 AS mmr
              FROM c ORDER BY (7000 * rel - 3000 * 0.0) / 10000.0 DESC,
                       vec_id LIMIT 1),
       sel1 AS (SELECT vec_id, nv FROM s1),
       p2 AS (SELECT cc.vec_id, cc.nv, cc.rel,
                     MAX(round(list_dot_product(cc.nv, s.nv), 4)) AS pen
              FROM c cc CROSS JOIN sel1 s
              WHERE cc.vec_id NOT IN (SELECT vec_id FROM sel1)
              GROUP BY cc.vec_id, cc.nv, cc.rel),
       s2 AS (SELECT vec_id, nv, rel,
                     (7000 * rel - 3000 * pen) / 10000.0 AS mmr
              FROM p2 ORDER BY (7000 * rel - 3000 * pen) / 10000.0 DESC,
                       vec_id LIMIT 1),
       sel2 AS (SELECT * FROM sel1 UNION ALL SELECT vec_id, nv FROM s2),
       p3 AS (SELECT cc.vec_id, cc.nv, cc.rel,
                     MAX(round(list_dot_product(cc.nv, s.nv), 4)) AS pen
              FROM c cc CROSS JOIN sel2 s
              WHERE cc.vec_id NOT IN (SELECT vec_id FROM sel2)
              GROUP BY cc.vec_id, cc.nv, cc.rel),
       s3 AS (SELECT vec_id, nv, rel,
                     (7000 * rel - 3000 * pen) / 10000.0 AS mmr
              FROM p3 ORDER BY (7000 * rel - 3000 * pen) / 10000.0 DESC,
                       vec_id LIMIT 1),
       sel3 AS (SELECT * FROM sel2 UNION ALL SELECT vec_id, nv FROM s3),
       p4 AS (SELECT cc.vec_id, cc.nv, cc.rel,
                     MAX(round(list_dot_product(cc.nv, s.nv), 4)) AS pen
              FROM c cc CROSS JOIN sel3 s
              WHERE cc.vec_id NOT IN (SELECT vec_id FROM sel3)
              GROUP BY cc.vec_id, cc.nv, cc.rel),
       s4 AS (SELECT vec_id, nv, rel,
                     (7000 * rel - 3000 * pen) / 10000.0 AS mmr
              FROM p4 ORDER BY (7000 * rel - 3000 * pen) / 10000.0 DESC,
                       vec_id LIMIT 1),
       sel4 AS (SELECT * FROM sel3 UNION ALL SELECT vec_id, nv FROM s4),
       p5 AS (SELECT cc.vec_id, cc.nv, cc.rel,
                     MAX(round(list_dot_product(cc.nv, s.nv), 4)) AS pen
              FROM c cc CROSS JOIN sel4 s
              WHERE cc.vec_id NOT IN (SELECT vec_id FROM sel4)
              GROUP BY cc.vec_id, cc.nv, cc.rel),
       s5 AS (SELECT vec_id, nv, rel,
                     (7000 * rel - 3000 * pen) / 10000.0 AS mmr
              FROM p5 ORDER BY (7000 * rel - 3000 * pen) / 10000.0 DESC,
                       vec_id LIMIT 1)
       SELECT CAST(1 AS INT) AS rank, vec_id, rel, mmr FROM s1
       UNION ALL SELECT 2, vec_id, rel, mmr FROM s2
       UNION ALL SELECT 3, vec_id, rel, mmr FROM s3
       UNION ALL SELECT 4, vec_id, rel, mmr FROM s4
       UNION ALL SELECT 5, vec_id, rel, mmr FROM s5
       ORDER BY rank"""

  /** MRR retrieval-quality harness: the `t_bm25_batch` query set scored
    * over the FULL ranking (no top-k cut), graded against an
    * all-terms-present relevance oracle — per query, the rank of the
    * first document containing every query term, and the reciprocal
    * rank in integer basis points. The eval a retrieval stack runs
    * after every index or scorer change; like `sim_recall_lsh`, the
    * metric is measured, not asserted. One postings pass + one
    * |queries|-bounded relevance join — the ranking is never globally
    * sorted, only rank-windowed per query. */
  private def tMrr(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val queries = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "merge"),
      (2L, "join"), (2L, "scan"),
      (3L, "stream"), (3L, "window"), (3L, "sort"),
      (4L, "zzz_unseen_term")) // matches nothing: the rr_bp=0 path
      .toDF("query_id", "term")
    val docs = Tables.documents(spark, d)
    val index = Bm25.buildIndex(docs)
    val ranked = Bm25.scoreBatchFromIndex(index, queries, k = Int.MaxValue,
      docLengths = Some(Bm25.docLengths(docs)))
    // The index's postings ARE the distinct (doc_id, tok) pairs — derive
    // the relevance oracle from them instead of re-tokenizing the corpus
    // (drops a second corpus-sized explode+distinct shuffle).
    val dtoks = index.select("doc_id", "tok")
    val q = queries.select(col("query_id"), col("term").as("tok")).distinct()
    val qn = q.groupBy("query_id").agg(count(lit(1)).as("nt"))
    val rel = dtoks.join(q, Seq("tok"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("m"))
      .join(qn, Seq("query_id"))
      .filter(col("m") === col("nt"))
      .select("query_id", "doc_id")
    val nr = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val fr = ranked.join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id").agg(min(col("rank")).as("fr"))
    q.select("query_id").distinct()
      .join(nr, Seq("query_id"), "left")
      .join(fr, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("fr"), lit(0)).cast("long").as("first_rank"))
      .withColumn("rr_bp", expr(
        "CASE WHEN first_rank = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE 10000 div first_rank END"))
      .orderBy("query_id")
  }

  private val tMrrSql =
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
       fr AS (SELECT query_id, MIN(rnk) AS fr
              FROM rk JOIN rel USING (query_id, doc_id) GROUP BY 1)
       SELECT query_id,
              COALESCE(n_rel, 0) AS n_rel,
              CAST(COALESCE(fr, 0) AS BIGINT) AS first_rank,
              CAST(CASE WHEN fr IS NULL THEN 0
                        ELSE 10000 // fr END AS BIGINT) AS rr_bp
       FROM (SELECT DISTINCT query_id FROM q) qq
       LEFT JOIN nr USING (query_id) LEFT JOIN fr USING (query_id)
       ORDER BY query_id"""

  /** KMV sketch-algebra Jaccard between the even- and odd-doc_id token
    * sets at k = 256 ([[Sketch.kmvJaccard]]) — cross-slice vocabulary
    * overlap from two bottom-k sketches alone, graded against the exact
    * Jaccard the same way `d_minhash_est` grades MinHash: the accuracy
    * dial is measured in the result, not asserted in a spec. */
  private def skKmvJaccard(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val a = toks.filter(pmod(col("doc_id"), lit(2)) === 0).select("tok")
    val b = toks.filter(pmod(col("doc_id"), lit(2)) === 1).select("tok")
    val ad = a.distinct()
    val bd = b.distinct()
    val exactRow = ad.join(bd, Seq("tok"), "left_semi")
      .agg(count(lit(1)).as("n_exact_inter"))
      .crossJoin(ad.union(bd).distinct().agg(count(lit(1)).as("n_exact_union")))
      .withColumn("exact_bp", expr("(n_exact_inter * 10000) div n_exact_union"))
    Sketch.kmvJaccard(a, b, "tok", k = 256)
      .crossJoin(exactRow)
      .select("k_eff", "n_inter", "jacc_bp",
        "n_exact_inter", "n_exact_union", "exact_bp")
  }

  private val skKmvJaccardSql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       ha AS (SELECT DISTINCT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
              FROM toks WHERE doc_id % 2 = 0),
       hb AS (SELECT DISTINCT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
              FROM toks WHERE doc_id % 2 = 1),
       ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
       skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
       merged AS (SELECT h FROM (SELECT h FROM ska UNION SELECT h FROM skb)
                  ORDER BY h LIMIT 256),
       inter AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_inter FROM merged
                 WHERE h IN (SELECT h FROM ska)
                   AND h IN (SELECT h FROM skb)),
       keff AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_eff FROM merged),
       ea AS (SELECT DISTINCT tok FROM toks WHERE doc_id % 2 = 0),
       eb AS (SELECT DISTINCT tok FROM toks WHERE doc_id % 2 = 1),
       ei AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_inter FROM ea
              WHERE tok IN (SELECT tok FROM eb)),
       eu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_union
              FROM (SELECT tok FROM ea UNION SELECT tok FROM eb))
       SELECT k_eff, n_inter,
              CAST((n_inter * 10000) // k_eff AS BIGINT) AS jacc_bp,
              n_exact_inter, n_exact_union,
              CAST((n_exact_inter * 10000) // n_exact_union AS BIGINT) AS exact_bp
       FROM keff CROSS JOIN inter CROSS JOIN ei CROSS JOIN eu"""

  def queries: Seq[Q] = Seq(
    Q("c_shard_plan", cShardPlan, Some(cShardPlanSql)),
    Q("c_sample_weighted", cSampleWeighted, Some(cSampleWeightedSql)),
    Q("sim_mmr", simMmr, Some(simMmrSql)),
    Q("t_mrr", tMrr, Some(tMrrSql)),
    Q("sk_kmv_jaccard", skKmvJaccard, Some(skKmvJaccardSql)))
}
