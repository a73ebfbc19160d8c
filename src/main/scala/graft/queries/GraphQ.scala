package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.Graph

/** Graph-ranking coverage (engine extension; the reference has no graph
  * ops): exact fixed-point PageRank over the customer↔supplier trade
  * graph derived from orders ⋈ lineitem. Integer arithmetic end-to-end
  * ([[graft.graph.Graph]]), so the DuckDB oracle replays every iteration
  * bit-for-bit by unrolling the loop.
  */
object GraphQ extends QueryPack {

  /** Customer↔supplier PageRank: nodes are custkey·2 / suppkey·2+1 (the
    * parity namespace keeps the bipartite id spaces disjoint), edges are
    * both directions of every distinct (customer, supplier) trade pair,
    * 3 damped rounds, top-20 nodes by (score desc, node). */
  private def grPagerank(spark: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cust_node"),
        (col("l_suppkey") * 2 + 1).as("supp_node"))
    val edges = pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
      .union(pairs.select(col("supp_node").as("src"), col("cust_node").as("dst")))
    Graph.pageRank(edges, iters = 3)
      .orderBy(col("score").desc, col("node").asc)
      .limit(20)
  }

  private val grPagerankSql = {
    // one damped integer round: score_{t+1}(v) = 150000 + (85·Σ_{u→v} score_t(u) div outdeg(u)) div 100
    def round(prev: String, cur: String) =
      s"""i$cur AS (SELECT e.dst AS node,
                SUM($prev.score // deg.outdeg) AS in_sum
              FROM e JOIN deg USING (src)
                     JOIN $prev ON $prev.node = e.src
              GROUP BY 1),
       $cur AS (SELECT n.node,
                CAST(150000 + (85 * COALESCE(i$cur.in_sum, 0)) // 100
                     AS BIGINT) AS score
              FROM nodes n LEFT JOIN i$cur USING (node))"""
    s"""WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs
             UNION
             SELECT supp_node, cust_node FROM pairs),
       nodes AS (SELECT DISTINCT src AS node FROM e
                 UNION
                 SELECT DISTINCT dst FROM e),
       deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
       s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes),
       ${round("s0", "s1")},
       ${round("s1", "s2")},
       ${round("s2", "s3")}
       SELECT node, score FROM s3
       ORDER BY score DESC, node LIMIT 20"""
  }

  /** DIRECTED customer→supplier PageRank with the dangling-mass
    * correction: edges run ONE way (customer → supplier), so every
    * supplier node dangles (no out-edges) and the equal-share
    * redistribution path ([[Graph.pageRank]] `redistributeDangling`)
    * actually carries mass every round — the oracle unrolls the
    * floor-share per round, bit-exact integers. */
  private def grPagerankDirected(spark: SparkSession, d: String): DataFrame = {
    val edges = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    Graph.pageRank(edges, iters = 3, redistributeDangling = true)
      .orderBy(col("score").desc, col("node").asc)
      .limit(20)
  }

  private val grPagerankDirectedSql = {
    // one corrected round: share_t = ⌊Σ_{v dangling} score_t(v) / n⌋;
    // score_{t+1}(v) = 150000 + (85·(Σ_{u→v} score_t(u) div outdeg(u) + share_t)) div 100
    def round(prev: String, cur: String) =
      s"""sh$cur AS (SELECT COALESCE(SUM(score), 0) // (SELECT n FROM nn) AS share
              FROM $prev JOIN dang USING (node)),
       i$cur AS (SELECT e.dst AS node,
                SUM($prev.score // deg.outdeg) AS in_sum
              FROM e JOIN deg USING (src)
                     JOIN $prev ON $prev.node = e.src
              GROUP BY 1),
       $cur AS (SELECT n.node,
                CAST(150000 + (85 * (COALESCE(i$cur.in_sum, 0)
                     + (SELECT share FROM sh$cur))) // 100
                     AS BIGINT) AS score
              FROM nodes n LEFT JOIN i$cur USING (node))"""
    s"""WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs),
       nodes AS (SELECT DISTINCT src AS node FROM e
                 UNION
                 SELECT DISTINCT dst FROM e),
       deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
       dang AS (SELECT node FROM nodes
                WHERE node NOT IN (SELECT src FROM e)),
       nn AS (SELECT COUNT(*) AS n FROM nodes),
       s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes),
       ${round("s0", "s1")},
       ${round("s1", "s2")},
       ${round("s2", "s3")}
       SELECT node, score FROM s3
       ORDER BY score DESC, node LIMIT 20"""
  }

  override def queries: Seq[Q] = Seq(
    Q("gr_pagerank", grPagerank, Some(grPagerankSql)),
    Q("gr_pagerank_directed", grPagerankDirected, Some(grPagerankDirectedSql)))
}
