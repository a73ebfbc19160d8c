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
    val (n, _) = statsOf(spark, s"sym|$d", symNodes(spark, d),
      dangling = false)
    Graph.pageRankOn(symNodes(spark, d), symEDeg(spark, d), n, 0L,
        iters = 3, redistributeDangling = false)
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
    val (n, nd) = statsOf(spark, s"dir|$d", dirNodes(spark, d),
      dangling = true)
    Graph.pageRankOn(dirNodes(spark, d), dirEDeg(spark, d), n, nd,
        iters = 3, redistributeDangling = true)
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

  /** Part co-purchase triangle counts: nodes are parts, an edge links
    * two parts that appear on the SAME order within the Q1-1995 slice
    * (the date filter is pushed to the orders scan), per-node triangle
    * counts via degree-ordered orientation ([[Graph.triangleCounts]] —
    * wedge join bounded O(|E|^1.5) regardless of hub skew), top-20 by
    * (triangles desc, node). Pure integers — the oracle replays the
    * orientation and wedge-close bit-for-bit. */
  private def grTriangles(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
    val edges = li.alias("x")
      .join(li.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    Graph.triangleCounts(edges)
      .orderBy(col("triangles").desc, col("node").asc)
      .limit(20)
  }

  private val grTrianglesSql =
    """WITH o AS (SELECT o_orderkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
       li AS (SELECT l_orderkey, l_partkey FROM lineitem
              JOIN o ON l_orderkey = o_orderkey),
       e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                                 AND x.l_partkey < y.l_partkey),
       deg AS (SELECT node, COUNT(*) AS dg
               FROM (SELECT a AS node FROM e0
                     UNION ALL SELECT b FROM e0) GROUP BY 1),
       k AS (SELECT node, dg * 4294967296 + node AS kk FROM deg),
       o2 AS (SELECT CASE WHEN ka.kk < kb.kk THEN e0.a ELSE e0.b END AS src,
                     CASE WHEN ka.kk < kb.kk THEN e0.b ELSE e0.a END AS dst,
                     GREATEST(ka.kk, kb.kk) AS kdst
              FROM e0 JOIN k ka ON e0.a = ka.node
                      JOIN k kb ON e0.b = kb.node),
       w AS (SELECT e1.src AS apex, e1.dst AS v, e2.dst AS w2
             FROM o2 e1 JOIN o2 e2 ON e1.src = e2.src
                                  AND e1.kdst < e2.kdst),
       tri AS (SELECT apex, v, w2 FROM w
               JOIN o2 ON w.v = o2.src AND w.w2 = o2.dst),
       cnt AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
               FROM (SELECT apex AS node FROM tri
                     UNION ALL SELECT v FROM tri
                     UNION ALL SELECT w2 FROM tri) GROUP BY 1)
       SELECT node, triangles FROM cnt
       ORDER BY triangles DESC, node LIMIT 20"""

  /** Community detection on the customer↔supplier trade graph:
    * 2 synchronous label-propagation rounds
    * ([[Graph.labelPropagate]] — deterministic smallest-label
    * tie-break), then community sizes, top-20 by (size desc, label).
    * The oracle unrolls both rounds with the same windowed pick. */
  private def grLabelprop(spark: SparkSession, d: String): DataFrame =
    Graph.labelPropagate(tradeEdges(spark, d), iters = 2)
      .groupBy("label").agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("label").asc)
      .limit(20)

  /** The 2-round LPA CTE chain (edges `e` → labels `s2`), shared with
    * the `gr_modularity` quality dial (QualityQ) so both oracles replay
    * the IDENTICAL community assignment. */
  private[queries] val lpaChainSql: String = {
    // one synchronous round: label_{t+1}(v) = arg max over in-neighbor
    // labels by (count desc, label asc), keep own label if no in-edges
    def round(prev: String, cur: String) =
      s"""f$cur AS (SELECT e.dst AS node, $prev.label, COUNT(*) AS c
              FROM e JOIN $prev ON $prev.node = e.src
              GROUP BY 1, 2),
       p$cur AS (SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (PARTITION BY node
                         ORDER BY c DESC, label) AS rk FROM f$cur)
              WHERE rk = 1),
       $cur AS (SELECT $prev.node,
                       COALESCE(p$cur.label, $prev.label) AS label
              FROM $prev LEFT JOIN p$cur ON $prev.node = p$cur.node)"""
    s"""pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs
             UNION
             SELECT supp_node, cust_node FROM pairs),
       nodes AS (SELECT DISTINCT src AS node FROM e
                 UNION
                 SELECT DISTINCT dst FROM e),
       s0 AS (SELECT node, node AS label FROM nodes),
       ${round("s0", "s1")},
       ${round("s1", "s2")}"""
  }

  private val grLabelpropSql =
    s"""WITH $lpaChainSql
       SELECT label, CAST(COUNT(*) AS BIGINT) AS size
       FROM s2 GROUP BY 1
       ORDER BY size DESC, label LIMIT 20"""

  /** The customer↔supplier trade edge list (both directions; parity
    * namespace keeps the bipartite id spaces disjoint) — shared by the
    * PageRank / label-propagation / BFS queries. */
  private val edgeCache = graft.util.ManagedCaches.register()

  /** The orders⋈lineitem trade-pair relation every gr_* derivation
    * shares — built once per (session, dir) and persisted columnar (the
    * sim_corpus_build discipline; `gr_edges_build` is the named warm
    * row): ~6 M rows at sf1, so re-running the join per family member
    * was the dominant shared base under the whole graph pack. Consumers
    * project src/dst flavors off the cache; parallel-pair dedup stays
    * where it always was (inside [[Graph]]'s prepare). */
  private[queries] def tradePairs(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(edgeCache, spark, s"pairs|$d") {
      Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(spark, d)
            .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("cust_node"),
          (col("l_suppkey") * 2 + 1).as("supp_node"))
    }

  /** The DEDUPED symmetric trade edge set, cached once per session —
    * consumers pass `assumeDistinct = true` into [[Graph]] so the
    * per-query re-distinct of ~12 M rows disappears too. */
  private[queries] def symTradeEdges(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(edgeCache, spark, s"sym|$d") {
      val pairs = tradePairs(spark, d)
      pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
        .union(pairs.select(col("supp_node").as("src"),
          col("cust_node").as("dst")))
        .distinct()
    }

  /** The DEDUPED directed (customer → supplier) edge set, cached. */
  private[queries] def dirTradeEdges(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(edgeCache, spark, s"dir|$d") {
      tradePairs(spark, d)
        .select(col("cust_node").as("src"), col("supp_node").as("dst"))
        .distinct()
    }

  /** Cached loop invariants over the deduped edge sets ([[Graph.nodesOf]]
    * / [[Graph.eDegOf]]) — with these warm, a ranking query pays for its
    * ROUNDS, not a per-query graph rebuild. */
  private[queries] def symNodes(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(edgeCache, spark, s"nodes-sym|$d") {
      Graph.nodesOf(symTradeEdges(spark, d))
    }
  private[queries] def dirNodes(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(edgeCache, spark, s"nodes-dir|$d") {
      Graph.nodesOf(dirTradeEdges(spark, d), withDanglingFlag = true)
    }
  private[queries] def symEDeg(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(edgeCache, spark, s"edeg-sym|$d") {
      Graph.eDegOf(symTradeEdges(spark, d))
    }
  private[queries] def dirEDeg(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(edgeCache, spark, s"edeg-dir|$d") {
      Graph.eDegOf(dirTradeEdges(spark, d))
    }

  /** (node count, dangling count) per cached node table — one aggregate
    * job each per session, against the warm cache. */
  private val graphStats = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Long, Long)]

  private def statsOf(spark: SparkSession, key: String, nodes: DataFrame,
      dangling: Boolean): (Long, Long) = {
    graphStats.keys.filter(_._1.sparkContext.isStopped)
      .foreach(graphStats.remove)
    graphStats.getOrElseUpdate((spark, key), {
      if (!dangling) (nodes.count(), 0L)
      else {
        val r = nodes.agg(count(lit(1)),
          sum(when(col("dang"), lit(1L)).otherwise(lit(0L)))).head()
        (r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
      }
    })
  }

  /** The shared edge + invariant builds as their own timed bench row:
    * the union's count touches EVERY cache entry — pairs, both deduped
    * edge sets, both eDeg relations, and (projected into the same
    * (src, dst, outdeg) shape purely so one count can reach them) both
    * node tables — so member queries measure their rounds against a
    * fully warm graph. */
  override def warms: Seq[Q] = Seq(
    Q("gr_edges_build",
      (s, d) => symEDeg(s, d).union(dirEDeg(s, d))
        .union(symNodes(s, d).select(col("node"), col("node"),
          lit(0L)))
        .union(dirNodes(s, d).select(col("node"), col("node"),
          lit(0L))), None))

  private[queries] def tradeEdges(spark: SparkSession, d: String): DataFrame = {
    val pairs = tradePairs(spark, d)
    pairs.select(col("cust_node").as("src"), col("supp_node").as("dst"))
      .union(pairs.select(col("supp_node").as("src"), col("cust_node").as("dst")))
  }

  /** Multi-source BFS over the trade graph: sources are the nation-0
    * customers, 3 relax rounds ([[Graph.bfsHops]]), output the hop
    * histogram (dist, n_nodes). On the bipartite graph dist alternates
    * customer/supplier layers — dist 2 is "customers sharing a supplier
    * with nation 0", the collaborative-filtering neighborhood. Oracle
    * unrolls the 3 min-relaxations. */
  private def grBfsHops(spark: SparkSession, d: String): DataFrame = {
    val sources = Tables.customer(spark, d)
      .filter(col("c_nationkey") === 0)
      .select((col("c_custkey") * 2).as("node"))
    Graph.bfsHops(tradeEdges(spark, d), sources, rounds = 3)
      .groupBy("dist").agg(count(lit(1)).as("n_nodes"))
      .orderBy("dist")
  }

  private val grBfsHopsSql = {
    def round(prev: String, cur: String) =
      s"""$cur AS (SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM $prev
                UNION ALL
                SELECT e.dst, $prev.dist + 1 FROM e
                JOIN $prev ON $prev.node = e.src) GROUP BY 1)"""
    s"""WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs
             UNION
             SELECT supp_node, cust_node FROM pairs),
       d0 AS (SELECT DISTINCT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
              FROM customer WHERE c_nationkey = 0),
       ${round("d0", "d1")},
       ${round("d1", "d2")},
       ${round("d2", "d3")}
       SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
       FROM d3 GROUP BY 1 ORDER BY dist"""
  }

  /** 10-core of the Q1-1995 part co-purchase graph: 3 fixed peels
    * ([[Graph.kCoreRounds]] — each peel one degree aggregate + two
    * semi-joins, |edges|-bounded), which reaches the true 10-core at
    * both verify scales (spec asserts convergence via [[Graph.kCore]]);
    * output the surviving nodes with their core degrees. Oracle unrolls
    * the 3 peels. */
  private def grKcore(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
    val edges = li.alias("x")
      .join(li.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    val core = Graph.kCoreRounds(edges, k = 10, rounds = 3)
    core.select(col("a").as("node"))
      .union(core.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
      .orderBy(col("dg").desc, col("node").asc)
  }

  private val grKcoreSql = {
    def peelRound(prev: String, cur: String) =
      s"""d$cur AS (SELECT node, COUNT(*) AS dg FROM (
                SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
              GROUP BY 1),
       $cur AS (SELECT a, b FROM $prev
              WHERE a IN (SELECT node FROM d$cur WHERE dg >= 10)
                AND b IN (SELECT node FROM d$cur WHERE dg >= 10))"""
    s"""WITH o AS (SELECT o_orderkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
       li AS (SELECT l_orderkey, l_partkey FROM lineitem
              JOIN o ON l_orderkey = o_orderkey),
       e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                                 AND x.l_partkey < y.l_partkey),
       ${peelRound("e0", "e1")},
       ${peelRound("e1", "e2")},
       ${peelRound("e2", "e3")}
       SELECT node, CAST(COUNT(*) AS BIGINT) AS dg FROM (
         SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3)
       GROUP BY 1 ORDER BY dg DESC, node"""
  }

  /** Weighted shortest paths over the trade graph: edge weight =
    * smallest l_quantity ever traded between the pair (an integer
    * "distance"), sources = nation-0 customers, 3 Bellman–Ford rounds
    * ([[Graph.sssp]] — the weighted [[Graph.bfsHops]]; same per-round
    * join+MIN shape, weights ride the shuffle). Top-20 closest nodes by
    * (dist, node); the oracle unrolls the 3 min-plus relaxations. */
  private def grSssp(spark: SparkSession, d: String): DataFrame = {
    val t = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cust_node"),
        (col("l_suppkey") * 2 + 1).as("supp_node"),
        col("l_quantity").cast("long").as("w"))
    val edges = t.select(col("cust_node").as("src"),
        col("supp_node").as("dst"), col("w"))
      .union(t.select(col("supp_node").as("src"),
        col("cust_node").as("dst"), col("w")))
    val sources = Tables.customer(spark, d)
      .filter(col("c_nationkey") === 0)
      .select((col("c_custkey") * 2).as("node"))
    Graph.sssp(edges, sources, rounds = 3)
      .orderBy(col("dist").asc, col("node").asc)
      .limit(20)
  }

  private val grSsspSql = {
    def round(prev: String, cur: String) =
      s"""$cur AS (SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM $prev
                UNION ALL
                SELECT e.dst, $prev.dist + e.w FROM e
                JOIN $prev ON $prev.node = e.src) GROUP BY 1)"""
    s"""WITH t AS (SELECT o_custkey * 2 AS cust_node,
                      l_suppkey * 2 + 1 AS supp_node,
                      CAST(l_quantity AS BIGINT) AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT src, dst, MIN(w) AS w FROM (
             SELECT cust_node AS src, supp_node AS dst, w FROM t
             UNION ALL
             SELECT supp_node, cust_node, w FROM t) GROUP BY 1, 2),
       d0 AS (SELECT DISTINCT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
              FROM customer WHERE c_nationkey = 0),
       ${round("d0", "d1")},
       ${round("d1", "d2")},
       ${round("d2", "d3")}
       SELECT node, dist FROM d3 ORDER BY dist, node LIMIT 20"""
  }

  /** Personalized PageRank seeded at the nation-0 suppliers
    * ([[Graph.personalizedPageRank]]): teleport mass returns only to
    * the seeds, so the top-20 ranks trade-graph proximity to nation 0
    * — the "related suppliers/customers" ranking — and nodes
    * unreachable from the seeds sit at exactly 0. 3 rounds, integer
    * fixed-point; the oracle unrolls the seeded basis per round. */
  private def grPpr(spark: SparkSession, d: String): DataFrame =
    Graph.personalizedPageRank(
        symTradeEdges(spark, d),
        Tables.supplier(spark, d).filter(col("s_nationkey") === 0)
          .select((col("s_suppkey") * 2 + 1).as("node")),
        iters = 3, assumeDistinct = true)
      .orderBy(col("score").desc, col("node").asc)
      .limit(20)

  private val grPprSql = {
    // one seeded round: score_{t+1}(v) = basis(v) + (85·Σ_{u→v} score_t(u) div outdeg(u)) div 100,
    // basis(v) = 150000 iff v is a seed (in-graph nation-0 supplier node)
    def round(prev: String, cur: String) =
      s"""i$cur AS (SELECT e.dst AS node,
                SUM($prev.score // deg.outdeg) AS in_sum
              FROM e JOIN deg USING (src)
                     JOIN $prev ON $prev.node = e.src
              GROUP BY 1),
       $cur AS (SELECT n.node,
                CAST(CASE WHEN sg.node IS NOT NULL THEN 150000 ELSE 0 END
                     + (85 * COALESCE(i$cur.in_sum, 0)) // 100
                     AS BIGINT) AS score
              FROM nodes n LEFT JOIN i$cur USING (node)
                           LEFT JOIN sg USING (node))"""
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
       srcs AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node
                FROM supplier WHERE s_nationkey = 0),
       sg AS (SELECT n.node FROM nodes n JOIN srcs USING (node)),
       s0 AS (SELECT n.node,
                CAST(CASE WHEN sg.node IS NOT NULL THEN 1000000 ELSE 0 END
                     AS BIGINT) AS score
              FROM nodes n LEFT JOIN sg USING (node)),
       ${round("s0", "s1")},
       ${round("s1", "s2")},
       ${round("s2", "s3")}
       SELECT node, score FROM s3
       ORDER BY score DESC, node LIMIT 20"""
  }

  /** HITS over the DIRECTED customer→supplier trade graph
    * ([[Graph.hits]], 2 rounds): customers are pure hubs (no in-edges
    * → auth 0), suppliers pure authorities, so the top-20 by authority
    * ranks suppliers by hub-weighted customer breadth — the mutual
    * reinforcement PageRank's single score can't express. Integer
    * max-normalization each half-step; the oracle replays every
    * half-step including the scalar max divisions. */
  private def grHits(spark: SparkSession, d: String): DataFrame = {
    val (n, _) = statsOf(spark, s"dir|$d", dirNodes(spark, d),
      dangling = true)
    Graph.hitsOn(dirNodes(spark, d), dirTradeEdges(spark, d), n, rounds = 2)
      .orderBy(col("auth").desc, col("hub").desc, col("node").asc)
      .limit(20)
  }

  private val grHitsSql = {
    // one full round from hub table hp: auth = max-normalized in-sum of
    // hubs, hub = max-normalized out-sum of the new auths
    def round(hp: String, ra: String, a: String, rh: String, h: String) =
      s"""$ra AS (SELECT n.node,
                CAST(COALESCE(SUM($hp.s), 0) AS BIGINT) AS raw
              FROM nodes n LEFT JOIN e ON e.dst = n.node
                           LEFT JOIN $hp ON $hp.node = e.src
              GROUP BY 1),
       $a AS (SELECT node,
                CAST(CASE WHEN mx.m = 0 THEN 0
                     ELSE (raw * 1000000) // mx.m END AS BIGINT) AS s
              FROM $ra CROSS JOIN (SELECT MAX(raw) AS m FROM $ra) mx),
       $rh AS (SELECT n.node,
                CAST(COALESCE(SUM($a.s), 0) AS BIGINT) AS raw
              FROM nodes n LEFT JOIN e ON e.src = n.node
                           LEFT JOIN $a ON $a.node = e.dst
              GROUP BY 1),
       $h AS (SELECT node,
                CAST(CASE WHEN mx.m = 0 THEN 0
                     ELSE (raw * 1000000) // mx.m END AS BIGINT) AS s
              FROM $rh CROSS JOIN (SELECT MAX(raw) AS m FROM $rh) mx)"""
    s"""WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs),
       nodes AS (SELECT DISTINCT src AS node FROM e
                 UNION
                 SELECT DISTINCT dst FROM e),
       h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS s FROM nodes),
       ${round("h0", "ra1", "a1", "rh1", "h1")},
       ${round("h1", "ra2", "a2", "rh2", "h2")}
       SELECT h2.node, h2.s AS hub, a2.s AS auth
       FROM h2 JOIN a2 USING (node)
       ORDER BY auth DESC, hub DESC, node LIMIT 20"""
  }

  /** Link prediction on the Q1-1995 part co-purchase graph
    * ([[Graph.linkPredictRA]], degCap 40): the top-20 NON-adjacent part
    * pairs by resource-allocation score — "parts likely to be bought
    * together next", the recommendation primitive. Wedges fan out only
    * through parts with degree ≤ 40 (hub wedges are both the scale
    * hazard and the near-zero RA contributions); existing edges are
    * anti-joined away. Integer ⌊10⁶/deg⌋ weights — the oracle replays
    * cap, wedge join, and anti-join bit-for-bit. */
  private def grLinkpred(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
    val edges = li.alias("x")
      .join(li.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
    Graph.linkPredictRA(edges, degCap = 40)
      .orderBy(col("score").desc, col("cn").desc, col("a").asc, col("b").asc)
      .limit(20)
  }

  private val grLinkpredSql =
    """WITH o AS (SELECT o_orderkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'),
       li AS (SELECT l_orderkey, l_partkey FROM lineitem
              JOIN o ON l_orderkey = o_orderkey),
       e0 AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                                 AND x.l_partkey < y.l_partkey),
       adj AS (SELECT a AS v, b AS u FROM e0
               UNION ALL SELECT b, a FROM e0),
       deg AS (SELECT v, COUNT(*) AS dg FROM adj GROUP BY 1),
       mid AS (SELECT adj.v, adj.u, deg.dg
               FROM adj JOIN deg USING (v) WHERE dg <= 40),
       w AS (SELECT l.u AS a, r.u AS b, l.dg
             FROM mid l JOIN mid r ON l.v = r.v AND l.u < r.u),
       s AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn,
                    CAST(SUM(1000000 // dg) AS BIGINT) AS score
             FROM w GROUP BY 1, 2)
       SELECT s.a, s.b, s.cn, s.score
       FROM s LEFT JOIN e0 ON s.a = e0.a AND s.b = e0.b
       WHERE e0.a IS NULL
       ORDER BY score DESC, cn DESC, s.a, s.b LIMIT 20"""

  /** Landmark harmonic-closeness centrality over the trade graph
    * ([[Graph.harmonicCloseness]]): 8 landmarks chosen as the md5-bottom
    * nodes (any engine re-derives the identical sample — the
    * deterministic stand-in for Eppstein–Wang random sampling), 4 BFS
    * rounds carried simultaneously for all landmarks in one (node, lm,
    * dist) state. Output per node: landmarks reached and the integer
    * harmonic sum Σ⌊10⁴/d⌋. Oracle unrolls the 4 min-relaxations. */
  private def grCloseness(spark: SparkSession, d: String): DataFrame = {
    val e = tradeEdges(spark, d)
    val landmarks = e.select(col("src").as("node")).distinct()
      .orderBy(md5(concat(lit("lm|"), col("node").cast("string"))))
      .limit(8)
    Graph.harmonicCloseness(e, landmarks, rounds = 4).orderBy("node")
  }

  private val grClosenessSql = {
    def round(prev: String, cur: String) =
      s"""$cur AS (SELECT node, lm, MIN(dist) AS dist FROM (
                SELECT node, lm, dist FROM $prev
                UNION ALL
                SELECT e.dst, $prev.lm, $prev.dist + 1 FROM e
                JOIN $prev ON $prev.node = e.src) GROUP BY 1, 2)"""
    s"""WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs
             UNION
             SELECT supp_node, cust_node FROM pairs),
       lms AS (SELECT src AS node FROM (SELECT DISTINCT src FROM e)
               ORDER BY md5('lm|' || CAST(src AS VARCHAR)) LIMIT 8),
       d0 AS (SELECT node, node AS lm, CAST(0 AS BIGINT) AS dist FROM lms),
       ${round("d0", "d1")},
       ${round("d1", "d2")},
       ${round("d2", "d3")},
       ${round("d3", "d4")}
       SELECT node, CAST(COUNT(*) AS BIGINT) AS n_reached,
              CAST(SUM(10000 // dist) AS BIGINT) AS harm_bp
       FROM d4 WHERE dist > 0 GROUP BY 1 ORDER BY node"""
  }

  override def queries: Seq[Q] = Seq(
    Q("gr_pagerank", grPagerank, Some(grPagerankSql)),
    Q("gr_closeness", grCloseness, Some(grClosenessSql)),
    Q("gr_ppr", grPpr, Some(grPprSql)),
    Q("gr_hits", grHits, Some(grHitsSql)),
    Q("gr_pagerank_directed", grPagerankDirected, Some(grPagerankDirectedSql)),
    Q("gr_triangles", grTriangles, Some(grTrianglesSql)),
    Q("gr_labelprop", grLabelprop, Some(grLabelpropSql)),
    Q("gr_bfs_hops", grBfsHops, Some(grBfsHopsSql)),
    Q("gr_kcore", grKcore, Some(grKcoreSql)),
    Q("gr_sssp", grSssp, Some(grSsspSql)),
    Q("gr_linkpred", grLinkpred, Some(grLinkpredSql)))
}
