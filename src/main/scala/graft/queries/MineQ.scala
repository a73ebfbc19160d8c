package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.mine.Mine
import graft.sim.Fusion

/** Pattern-mining + hybrid-retrieval coverage (engine extension; own
  * trailing bench group): market-basket association rules, the 2-D
  * skyline, and reciprocal-rank fusion of the BM25 lexical ranker with
  * the exact ANN ranker. All integer/fixed-expression arithmetic —
  * every oracle replays the full computation bit-for-bit.
  */
object MineQ extends QueryPack {

  /** Brand-level association rules over order baskets: basket =
    * l_orderkey, item = the line's part brand (25-value vocabulary —
    * the dim-bounded item space rule mining is for; the part dim rides
    * a broadcast join). Rules with pair support ≥ 3 baskets, stats in
    * integer basis points ([[Mine.associationRules]]). */
  private def mbRules(spark: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(Tables.part(spark, d)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
    Mine.associationRules(baskets, "l_orderkey", "p_brand",
        minPairCount = 3L)
      .orderBy("antecedent", "consequent")
  }

  private val mbRulesSql =
    """WITH bi AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
                FROM lineitem JOIN part ON l_partkey = p_partkey),
       nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n FROM bi),
       itn AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM bi GROUP BY 1),
       pr AS (SELECT a.i AS ia, b2.i AS ib, CAST(COUNT(*) AS BIGINT) AS n_ab
              FROM bi a JOIN bi b2 ON a.b = b2.b AND a.i < b2.i
              GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       dir AS (SELECT ia AS antecedent, ib AS consequent, n_ab FROM pr
               UNION ALL
               SELECT ib, ia, n_ab FROM pr)
       SELECT antecedent, consequent, n_ab, na.n_i AS n_a, nb2.n_i AS n_b,
              (n_ab * 10000) // n AS support_bp,
              (n_ab * 10000) // na.n_i AS conf_bp,
              (n_ab * n * 10000) // (na.n_i * nb2.n_i) AS lift_bp
       FROM dir JOIN itn na ON dir.antecedent = na.i
                JOIN itn nb2 ON dir.consequent = nb2.i
                CROSS JOIN nb
       ORDER BY antecedent, consequent"""

  /** Price/quantity skyline of the line items ([[Mine.skyline2d]]):
    * the Pareto-optimal "cheapest line achieving each quantity tier"
    * set — no other line is both cheaper and larger. Double reduction
    * bounds the frontier at |distinct quantity| (50) rows before the
    * one tiny window; ties on the frontier point all survive. */
  private def skyPareto(spark: SparkSession, d: String): DataFrame =
    Mine.skyline2d(
        Tables.lineitem(spark, d).select(col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"), col("l_quantity")),
        xCol = "l_extendedprice", yCol = "l_quantity")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .orderBy("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")

  private val skyParetoSql =
    """WITH f1 AS (SELECT l_extendedprice AS x, MAX(l_quantity) AS y
                FROM lineitem GROUP BY 1),
       f2 AS (SELECT MIN(x) AS x, y FROM f1 GROUP BY y),
       s AS (SELECT x, y, MAX(y) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             FROM f2),
       sky AS (SELECT x, y FROM s WHERE pm IS NULL OR pm < y)
       SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
       FROM lineitem JOIN sky
         ON l_extendedprice = sky.x AND l_quantity = sky.y
       ORDER BY l_extendedprice, l_quantity, l_orderkey, l_linenumber"""

  /** Hybrid retrieval: BM25 top-10 (3 term-set queries against the
    * postings index, query ids 0/25/50) fused with the exact cosine
    * top-10 for the SAME query ids' embedding vectors, by integer
    * reciprocal-rank fusion ([[Fusion.rrf]], k0 = 60). doc_id and
    * vec_id share the id space, so the two rankers rank the same
    * corpus; the fused list interleaves lexical and semantic evidence
    * without comparing raw scores. The oracle replays both rankers AND
    * the fusion. */
  private def hrRrf(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val lexQueries = Seq(
      (0L, "vector"), (0L, "hash"), (0L, "merge"),
      (25L, "join"), (25L, "scan"),
      (50L, "stream"), (50L, "window"), (50L, "sort"))
      .toDF("query_id", "term")
    val lex = graft.text.Bm25.scoreBatch(Tables.documents(spark, d),
        lexQueries, k = 10)
      .select("query_id", "doc_id", "rank")
    val e = Tables.embeddings(spark, d)
    graft.sim.Similarity.cacheNormalizedCorpus(e, d)
    val sem = graft.sim.Similarity.bruteForceTopK(
        e.filter(col("vec_id").isin(0L, 25L, 50L)), e, k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    Fusion.rrf(Seq(lex, sem), k0 = 60, topK = 10)
      .orderBy("query_id", "rank")
  }

  private val hrRrfSql =
    """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS tot FROM dl),
       q(query_id, tok) AS (VALUES
         (CAST(0 AS BIGINT), 'vector'), (0, 'hash'), (0, 'merge'),
         (25, 'join'), (25, 'scan'),
         (50, 'stream'), (50, 'window'), (50, 'sort')),
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
       lexr AS (SELECT query_id, doc_id, rank FROM (
                  SELECT query_id, doc_id,
                         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS INT) AS rank
                  FROM agg) WHERE rank <= 10),
       v AS (SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                 x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                 AS nv
             FROM embeddings),
       qv AS (SELECT vec_id AS query_id, nv AS qvec FROM v
              WHERE vec_id IN (0, 25, 50)),
       semp AS (SELECT qv.query_id, v.vec_id AS doc_id,
                  round(list_dot_product(qv.qvec, v.nv), 4) AS sim
                FROM qv JOIN v ON v.vec_id != qv.query_id),
       semr AS (SELECT query_id, doc_id, rank FROM (
                  SELECT query_id, doc_id,
                         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, doc_id) AS INT) AS rank
                  FROM semp) WHERE rank <= 10),
       u AS (SELECT query_id, doc_id,
               CAST(1000000 // (60 + rank) AS BIGINT) AS c FROM lexr
             UNION ALL
             SELECT query_id, doc_id,
               CAST(1000000 // (60 + rank) AS BIGINT) FROM semr),
       f AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf
             FROM u GROUP BY 1, 2)
       SELECT query_id, rank, doc_id, rrf FROM (
         SELECT query_id, doc_id, rrf,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rrf DESC, doc_id) AS INT) AS rank
         FROM f) WHERE rank <= 10
       ORDER BY query_id, rank"""

  override def queries: Seq[Q] = Seq(
    Q("mb_rules", mbRules, Some(mbRulesSql)),
    Q("sky_pareto", skyPareto, Some(skyParetoSql)),
    Q("hr_rrf", hrRrf, Some(hrRrfSql)))
}
