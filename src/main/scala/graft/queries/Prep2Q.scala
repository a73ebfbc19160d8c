package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.etl.Drift
import graft.graph.Graph
import graft.text.Corpus

/** Round-9 pipeline-prep pack: n-gram novelty scoring, sliding-window
  * chunking, embedding A/B drift, and deterministic negative-edge
  * sampling — registered as its own trailing bench group (the r7
  * discipline: established groups keep apples-to-apples rows).
  */
object Prep2Q extends QueryPack {

  /** Shingle novelty per document: the share of a doc's distinct
    * 3-gram shingles whose FIRST corpus occurrence (min doc_id) is this
    * doc — a diversity/contamination dial (a corpus of near-copies
    * scores low everywhere past the originals). One shuffle on the
    * shingle for the min-id table; the join back is on the same key, so
    * the exchange is reused; then one per-doc agg. Integer bp. */
  private def tNovelty(spark: SparkSession, d: String): DataFrame = {
    val s = Tables.documents(spark, d)
      .select(col("doc_id").as("id"),
        explode(Dedup.shinglesFast(col("text"), 3)).as("sh"))
      .repartition(col("sh"))
    val first = s.groupBy("sh").agg(min(col("id")).as("first_id"))
    s.join(first, Seq("sh"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novel_bp", expr("(n_novel * 10000) div n_sh"))
      .orderBy("doc_id")
  }

  private val tNoveltySql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
              FROM toks WHERE len(t) >= 3),
       f AS (SELECT sh, MIN(doc_id) AS first_id FROM sh GROUP BY 1)
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
              CAST(SUM(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
              CAST((SUM(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                * 10000) // COUNT(*) AS BIGINT) AS novel_bp
       FROM sh JOIN f USING (sh)
       GROUP BY doc_id ORDER BY doc_id"""

  /** Sliding-window chunking of the documents table
    * ([[Corpus.chunkSliding]]): 32-token windows at 24-token stride
    * (25% overlap). Chunks carried as md5 + offsets, shuffle-free. */
  private def cChunkOverlap(spark: SparkSession, d: String): DataFrame =
    Corpus.chunkSliding(Tables.documents(spark, d), "doc_id", "text",
        window = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")

  private val cChunkOverlapSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       st AS (SELECT doc_id, t,
                unnest(range(0, GREATEST(len(t), 1), 24)) AS start
              FROM toks)
       SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
              CAST(start AS BIGINT) AS start_tok,
              CAST(len(t[start+1:start+32]) AS BIGINT) AS n_tok,
              md5(array_to_string(t[start+1:start+32], ' ')) AS chunk_md5
       FROM st ORDER BY doc_id, chunk_id"""

  /** Embedding drift between the even- and odd-id vector populations
    * ([[Drift.embeddingDrift]]) — the encoder/corpus-change monitor:
    * per-dimension exact integer moments and the sign-safe mean gap.
    * |dims| output rows. */
  private def eEmbDrift(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    Drift.embeddingDrift(
        e.filter(pmod(col("vec_id"), lit(2)) === 0),
        e.filter(pmod(col("vec_id"), lit(2)) === 1),
        "embedding")
      .orderBy("dim")
  }

  private val eEmbDriftSql =
    """WITH ix AS (SELECT vec_id, embedding,
                unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings),
       fx AS (SELECT vec_id, i AS dim,
                CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
                  AS fx
              FROM ix),
       a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_a,
                    CAST(SUM(fx) AS BIGINT) AS sum_a
             FROM fx WHERE vec_id % 2 = 0 GROUP BY 1),
       b AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_b,
                    CAST(SUM(fx) AS BIGINT) AS sum_b
             FROM fx WHERE vec_id % 2 = 1 GROUP BY 1)
       SELECT a.dim, n_a, n_b, sum_a, sum_b,
              CASE WHEN CAST(sum_a AS HUGEINT) * n_b - CAST(sum_b AS HUGEINT) * n_a < 0
                   THEN CAST(-((-(CAST(sum_a AS HUGEINT) * n_b - CAST(sum_b AS HUGEINT) * n_a))
                        // (CAST(n_a AS HUGEINT) * n_b)) AS BIGINT)
                   ELSE CAST((CAST(sum_a AS HUGEINT) * n_b - CAST(sum_b AS HUGEINT) * n_a)
                        // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) END AS mdiff_fx
       FROM a JOIN b USING (dim) ORDER BY dim"""

  /** Deterministic negative sampling on the trade graph
    * ([[Graph.negativeEdgeSample]]): ≤ 3 hash-drawn non-neighbors per
    * node from 8 trials — the training-pair generator for the
    * `gr_linkpred` ranking task. Oracle replays the md5 hash-ring
    * arithmetic. */
  private def grNegsample(spark: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cust_node"),
        (col("l_suppkey") * 2 + 1).as("supp_node"))
    val edges = pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
      .union(pairs.select(col("supp_node").as("src"), col("cust_node").as("dst")))
    Graph.negativeEdgeSample(edges, k = 3, trials = 8)
      .orderBy("src", "neg_dst")
  }

  private val grNegsampleSql =
    """WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs
             UNION
             SELECT supp_node, cust_node FROM pairs),
       nodes AS (SELECT DISTINCT src AS node FROM e),
       nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
       ringb AS (SELECT node,
                ('0x' || substr(md5('n|' || CAST(node AS VARCHAR)), 1, 15))::BIGINT
                  % (SELECT n FROM nc) AS b,
                ('0x' || substr(md5('n|' || CAST(node AS VARCHAR)), 1, 15))::BIGINT
                  AS h
              FROM nodes),
       ring AS (SELECT b, arg_min(node, h) AS cand FROM ringb GROUP BY 1),
       probes AS (SELECT node AS src, i,
                ('0x' || substr(md5('s|' || CAST(node AS VARCHAR) || '|'
                   || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                  % (SELECT n FROM nc) AS b
              FROM nodes CROSS JOIN (SELECT unnest(range(0, 8)) AS i) r),
       hits AS (SELECT p.src, ring.cand, MIN(p.i) AS i
                FROM probes p
                JOIN ring USING (b)
                LEFT JOIN e ON e.src = p.src AND e.dst = ring.cand
                WHERE ring.cand <> p.src AND e.src IS NULL
                GROUP BY 1, 2),
       rk AS (SELECT src, cand,
                ROW_NUMBER() OVER (PARTITION BY src ORDER BY i, cand) AS rk
              FROM hits)
       SELECT src, cand AS neg_dst FROM rk WHERE rk <= 3
       ORDER BY src, neg_dst"""

  def queries: Seq[Q] = Seq(
    Q("t_novelty", tNovelty, Some(tNoveltySql)),
    Q("c_chunk_overlap", cChunkOverlap, Some(cChunkOverlapSql)),
    Q("e_emb_drift", eEmbDrift, Some(eEmbDriftSql)),
    Q("gr_negsample", grNegsample, Some(grNegsampleSql)))
}
