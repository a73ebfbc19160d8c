package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sketch.Sketch
import graft.text.{Bm25, Corpus}

/** Round-9 curation pack (part 3): nDCG retrieval eval, leakage-free
  * (cluster-aware) train/test splitting, the all-pairs source-overlap
  * matrix from KMV sketches, and content-defined chunking — registered
  * as its own trailing bench group (the r7 discipline), so established
  * groups keep their round-over-round rows.
  */
object Curate3Q extends QueryPack {

  // ---------------------------------------------------------------- t_ndcg

  /** Rank discounts for nDCG@10 in basis points: disc(i) =
    * round(10⁴ / log₂(i+1)). Computed ONCE here and embedded as the SAME
    * integer literals in both the Spark plan and the DuckDB oracle — no
    * transcendental function ever runs inside either engine, so the
    * metric is integer-exact by construction (the `d_lsh_scurve`
    * fixed-literal discipline). */
  private val ndcgDisc: Seq[(Long, Long)] = (1 to 10).map(i =>
    i.toLong -> math.round(10000.0 / (math.log(i + 1.0) / math.log(2.0))))

  /** Ideal-DCG prefix sums: idcg(m) = Σ_{i=1..m} disc(i) for
    * m = 0..10 — joined EQUI on m = least(n_rel, 10), so the ideal
    * ranking never needs a non-equi join against the discount table. */
  private val ndcgIdcg: Seq[(Long, Long)] =
    (0 to 10).map(m => m.toLong -> ndcgDisc.take(m).map(_._2).sum)

  /** nDCG@10 of the BM25 batch ranking against the all-terms-present
    * relevance oracle — completes the rank-eval family (`t_mrr` = first
    * hit, `t_rank_eval` = MAP/P@10/R@10, this = graded position
    * discounting). Query 4 matches nothing → the n_rel=0 / ndcg=0 row
    * is oracle-covered.
    *
    * Scale shape: one postings pass for the ranking (k=10 keeps only the
    * per-query top-10 via TakeOrderedAndProject-style windows), a
    * |queries|-bounded relevance join, and two ≤11-row broadcast literal
    * tables (discounts, IDCG prefix sums). The corpus is never globally
    * sorted. */
  private def tNdcg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val queries = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "merge"),
      (2L, "join"), (2L, "scan"),
      (3L, "stream"), (3L, "window"), (3L, "sort"),
      (4L, "zzz_unseen_term")) // matches nothing: the all-zero row
      .toDF("query_id", "term")
    val docs = Tables.documents(spark, d)
    val index = Bm25.buildIndex(docs)
    val ranked = Bm25.scoreBatchFromIndex(index, queries, k = 10)
    val discDf = ndcgDisc.toDF("i", "disc_bp")
    val idcgDf = ndcgIdcg.toDF("m", "idcg_bp")
    val dtoks = index.select("doc_id", "tok")
    val q = queries.select(col("query_id"), col("term").as("tok")).distinct()
    val qn = q.groupBy("query_id").agg(count(lit(1)).as("nt"))
    val rel = dtoks.join(q, Seq("tok"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("m"))
      .join(qn, Seq("query_id"))
      .filter(col("m") === col("nt"))
      .select("query_id", "doc_id")
    val nr = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val dcg = ranked.join(rel, Seq("query_id", "doc_id"))
      .join(broadcast(discDf), col("rank") === col("i"))
      .groupBy("query_id").agg(sum(col("disc_bp")).as("dcg_bp"))
    q.select("query_id").distinct()
      .join(nr, Seq("query_id"), "left")
      .join(dcg, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("dcg_bp", coalesce(col("dcg_bp"), lit(0L)))
      .join(broadcast(idcgDf), least(col("n_rel"), lit(10L)) === col("m"))
      .select(col("query_id"), col("n_rel"), col("dcg_bp"), col("idcg_bp"),
        expr("CASE WHEN idcg_bp = 0 THEN cast(0 as bigint) " +
          "ELSE (dcg_bp * 10000) div idcg_bp END").as("ndcg_bp"))
      .orderBy("query_id")
  }

  private val tNdcgSql = {
    val discVals = ndcgDisc
      .map { case (i, v) => s"(CAST($i AS BIGINT), CAST($v AS BIGINT))" }
      .mkString(", ")
    val idcgVals = ndcgIdcg
      .map { case (m, v) => s"(CAST($m AS BIGINT), CAST($v AS BIGINT))" }
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS tot FROM dl),
       q(query_id, tok) AS (VALUES
         (CAST(1 AS BIGINT), 'vector'), (1, 'hash'), (1, 'merge'),
         (2, 'join'), (2, 'scan'),
         (3, 'stream'), (3, 'window'), (3, 'sort'),
         (4, 'zzz_unseen_term')),
       disc(i, disc_bp) AS (VALUES $discVals),
       idcg(m, idcg_bp) AS (VALUES $idcgVals),
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
       rel AS (SELECT q.query_id, dt.doc_id
               FROM dtoks dt JOIN q ON dt.tok = q.tok
               JOIN qn ON qn.query_id = q.query_id
               GROUP BY q.query_id, dt.doc_id, qn.nt
               HAVING COUNT(*) = qn.nt),
       nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
              FROM rel GROUP BY 1),
       dcg AS (SELECT query_id, CAST(SUM(disc_bp) AS BIGINT) AS dcg_bp
               FROM rk JOIN rel USING (query_id, doc_id)
               JOIN disc ON rk.rnk = disc.i
               WHERE rnk <= 10 GROUP BY 1)
       SELECT query_id,
              COALESCE(n_rel, 0) AS n_rel,
              COALESCE(dcg_bp, 0) AS dcg_bp,
              idcg_bp,
              CAST(CASE WHEN idcg_bp = 0 THEN 0
                        ELSE (COALESCE(dcg_bp, 0) * 10000) // idcg_bp
                   END AS BIGINT) AS ndcg_bp
       FROM (SELECT DISTINCT query_id FROM q) qq
       LEFT JOIN nr USING (query_id)
       LEFT JOIN dcg USING (query_id)
       JOIN idcg ON LEAST(COALESCE(n_rel, 0), 10) = idcg.m
       ORDER BY query_id"""
  }

  // -------------------------------------------------------- c_split_leakfree

  /** Leakage-free train/val/test split: documents in the same near-dup
    * CLUSTER always land in the same split. A plain per-doc hash split
    * ([[Corpus.splitByHash]]) puts ~20% of each near-dup cluster's
    * members in val/test — the eval then grades the model on paraphrases
    * of its own training data, the classic inflated-benchmark failure.
    * Here the split key is the cluster representative (min doc_id label
    * from the MinHash-LSH connected components) for clustered docs and
    * the doc's own id otherwise, so the md5 bucket decides per CLUSTER
    * (DedupSpec asserts zero straddling pairs).
    *
    * Scale shape: the CC label set is |clustered docs| rows (built by the
    * banded-LSH + fixpoint path audited in `d_cc`); the split itself is
    * the same zero-shuffle hash projection as `c_split_hash`, and
    * late-arriving members of a KNOWN cluster still route to the
    * cluster's split — reproducible at any corpus size. */
  private def cSplitLeakfree(spark: SparkSession, d: String): DataFrame = {
    val cc = DedupQ.ccLabels(spark, d)
    Tables.documents(spark, d).select("doc_id")
      .join(cc, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("b", Corpus.hashBucket(col("split_key"), 100))
      .select(col("doc_id"), col("split_key"),
        when(col("b") < 80, "train")
          .when(col("b") < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  private val cSplitLeakfreeSql =
    s"""${DedupQ.dCcCtes},
       cc AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
              FROM reach GROUP BY u),
       s AS (SELECT d.doc_id,
                    COALESCE(cc.cluster_id, d.doc_id) AS split_key
             FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id)
       SELECT doc_id, split_key,
              CASE WHEN b < 80 THEN 'train'
                   WHEN b < 90 THEN 'val'
                   ELSE 'test' END AS split
       FROM (SELECT doc_id, split_key,
                    CAST(('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 AS b
             FROM s) t
       ORDER BY doc_id"""

  // ------------------------------------------------------- sk_source_overlap

  /** All-pairs source-overlap matrix ([[Sketch.kmvJaccardMatrix]], k=128)
    * over the documents table's 20 sources — the cross-source
    * contamination dial (see the kernel's scaladoc for the O(pairs·k)
    * scale argument). The oracle replays the naive per-source bottom-k,
    * which [[Sketch.kmvSketchBy]] is provably bit-identical to. */
  private def skSourceOverlap(spark: SparkSession, d: String): DataFrame =
    Sketch.kmvJaccardMatrix(
        Tables.documents(spark, d)
          .select(col("source").as("g"),
            explode(split(col("text"), " ")).as("tok")),
        k = 128)
      .orderBy("src_a", "src_b")

  private val skSourceOverlapSql =
    """WITH toks AS (SELECT source AS g, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       hs AS (SELECT DISTINCT g,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
              FROM toks),
       sk AS (SELECT g, h FROM (
                SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r
                FROM hs) t
              WHERE r <= 128),
       srcs AS (SELECT DISTINCT g FROM sk),
       p AS (SELECT a.g AS src_a, b.g AS src_b
             FROM srcs a JOIN srcs b ON a.g < b.g),
       u AS (SELECT src_a, src_b, h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
               SELECT p.src_a, p.src_b, s.h, 1 AS ia, 0 AS ib
               FROM p JOIN sk s ON s.g = p.src_a
               UNION ALL
               SELECT p.src_a, p.src_b, s.h, 0 AS ia, 1 AS ib
               FROM p JOIN sk s ON s.g = p.src_b) e
             GROUP BY 1, 2, 3),
       m AS (SELECT * FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b
                         ORDER BY h) AS r
               FROM u) t
             WHERE r <= 128)
       SELECT src_a, src_b,
              CAST(COUNT(*) AS BIGINT) AS k_eff,
              CAST(SUM(ia * ib) AS BIGINT) AS n_inter,
              CAST((SUM(ia * ib) * 10000) // COUNT(*) AS BIGINT) AS jacc_bp
       FROM m GROUP BY 1, 2 ORDER BY 1, 2"""

  // ----------------------------------------------------------- c_chunk_cdc

  /** Content-defined chunking of the documents table
    * ([[Corpus.chunkCdc]], modulus 17 ⇒ ~17-token expected chunks) —
    * boundaries are a function of local CONTENT, so edits above a chunk
    * never invalidate its hash (the kernel's scaladoc carries the LBFS
    * argument and the one-partition scale shape; Curate3Spec asserts
    * the shift-invariance law). */
  private def cChunkCdc(spark: SparkSession, d: String): DataFrame =
    Corpus.chunkCdc(Tables.documents(spark, d), "doc_id", "text",
        modulus = 17)
      .orderBy("doc_id", "chunk_id")

  private val cChunkCdcSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       p AS (SELECT doc_id, t, UNNEST(range(1, len(t) + 1)) AS pos FROM toks),
       tok AS (SELECT doc_id, pos, t[pos] AS tok,
                      CASE WHEN pos > 1 THEN t[pos - 1] ELSE NULL END AS prev
               FROM p),
       b AS (SELECT doc_id, pos, tok,
                    CASE WHEN prev IS NOT NULL AND
                      CAST(('0x' || substr(md5(prev || ' ' || tok), 1, 8))
                        AS BIGINT) % 17 = 0
                    THEN 1 ELSE 0 END AS bnd
             FROM tok),
       c AS (SELECT doc_id, pos, tok,
                    SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos)
                      AS chunk_id
             FROM b)
       SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
              CAST(MIN(pos) - 1 AS BIGINT) AS start_pos,
              CAST(COUNT(*) AS BIGINT) AS n_tok,
              md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
       FROM c GROUP BY doc_id, chunk_id
       ORDER BY doc_id, chunk_id"""

  override def queries: Seq[Q] = Seq(
    Q("t_ndcg", tNdcg, Some(tNdcgSql)),
    Q("c_split_leakfree", cSplitLeakfree, Some(cSplitLeakfreeSql)),
    Q("sk_source_overlap", skSourceOverlap, Some(skSourceOverlapSql)),
    Q("c_chunk_cdc", cChunkCdc, Some(cChunkCdcSql)))
}
