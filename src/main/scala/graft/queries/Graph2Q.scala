package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Graph

/** Round-9 graph extensions: Katz centrality over the customer↔supplier
  * trade graph ([[GraphQ.tradeEdges]]) — the walk-counting complement to
  * the degree-normalized PageRank family. Same exactness contract as the
  * rest of the graph pack: integer fixed point, per-edge floors before
  * sums, so the DuckDB oracle replays the rounds bit-for-bit unrolled.
  */
object Graph2Q extends QueryPack {

  /** 3 Katz rounds (α = 1/16), top-20 nodes by (score desc, node).
    * Even suppliers with FEW customers rank high when those customers
    * are themselves well-connected — the recursive-prestige semantics
    * PageRank's out-degree split suppresses on hub-heavy graphs. */
  private def grKatz(spark: SparkSession, d: String): DataFrame =
    Graph.katz(GraphQ.tradeEdges(spark, d), rounds = 3)
      .orderBy(col("score").desc, col("node").asc)
      .limit(20)

  private val grKatzSql = {
    // one Katz round: c_{t+1}(v) = Σ_{u→v} (10⁶ + c_t(u)) // 16
    def round(prev: String, cur: String) =
      s"""i$cur AS (SELECT e.dst AS node,
                SUM((1000000 + p.score) // 16) AS in_sum
              FROM e JOIN $prev p ON p.node = e.src
              GROUP BY 1),
       $cur AS (SELECT n.node,
                CAST(COALESCE(in_sum, 0) AS BIGINT) AS score
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
       c0 AS (SELECT node, CAST(0 AS BIGINT) AS score FROM nodes),
       ${round("c0", "c1")},
       ${round("c1", "c2")},
       ${round("c2", "c3")}
       SELECT node, score FROM c3
       ORDER BY score DESC, node LIMIT 20"""
  }

  def queries: Seq[Q] = Seq(
    Q("gr_katz", grKatz, Some(grKatzSql)))
}
