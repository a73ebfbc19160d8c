package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.Graph

/** Round-9 quality-dial pack: metrics that GRADE other operators in this
  * engine — Newman modularity for the LPA communities and the MinHash-LSH
  * S-curve tuning table — the measured-not-asserted discipline of
  * `sim_recall_*` applied to community detection and dedup banding.
  * Registered as its own trailing bench group (the r7 discipline).
  */
object QualityQ extends QueryPack {

  /** Newman modularity Q of the 2-round LPA communities over the
    * customer↔supplier trade graph — the quality dial for
    * `gr_labelprop`: Q = Σ_c [e_c/m − (d_c/2m)²], computed EXACTLY as
    * the integer rational (4m·Σe_c − Σd_c²) / 4m² in basis points
    * (sign-safe truncation-toward-zero spelled out identically on both
    * engines). One row: |edges|, |communities|, the two sums, q_bp.
    *
    * Scale shape: LPA's own per-round |edges| join+agg (audited in
    * gr_labelprop), then ONE |edges| label join, two partial-agg
    * cascades (per-community → 1 row), and a 1-row cross. All BIGINT:
    * at sf1 (m ≈ 10⁶) the largest term 10⁴·(2m)² ≈ 4·10¹⁶ ≪ 2⁶³. */
  private def grModularity(spark: SparkSession, d: String): DataFrame = {
    // Materialize the deduped directed edge set ONCE: LPA's internal
    // distinct() is then a no-op re-group on checkpointed rows, and the
    // undirected set derives from the same materialization instead of
    // re-running the orders⨝lineitem join. (Bench note: the saving at
    // sf0.1 is modest — the row's cost is dominated by the ~8 extra
    // scheduler round-trips of the post-LPA join/agg stages, which is
    // local-mode overhead, not data volume.)
    val e = GraphQ.tradeEdges(spark, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
      .localCheckpoint()
    val lab = Graph.labelPropagate(e, iters = 2)
    val und = e.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    val lbl = und
      .join(lab.select(col("node").as("a"), col("label").as("la")), Seq("a"))
      .join(lab.select(col("node").as("b"), col("label").as("lb")), Seq("b"))
    val ec = lbl.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
    val dc = deg.join(lab, Seq("node"))
      .groupBy("label").agg(sum(col("dg")).as("d_c"))
    val parts = dc.join(ec, Seq("label"), "left")
      .agg(count(lit(1)).as("n_comm"),
        sum(coalesce(col("e_in"), lit(0L))).as("s_ein"),
        sum(expr("d_c * d_c")).as("s_d2"))
    parts.crossJoin(broadcast(und.agg(count(lit(1)).as("m"))))
      .select(col("m"), col("n_comm"), col("s_ein"), col("s_d2"),
        expr("CASE WHEN 4 * m * s_ein - s_d2 >= 0 " +
          "THEN (10000 * (4 * m * s_ein - s_d2)) div (4 * m * m) " +
          "ELSE -((10000 * (s_d2 - 4 * m * s_ein)) div (4 * m * m)) END")
          .as("q_bp"))
  }

  private val grModularitySql =
    s"""WITH ${GraphQ.lpaChainSql},
       s2m AS MATERIALIZED (SELECT node, label FROM s2),
       und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
                      GREATEST(src, dst) AS b FROM e),
       mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
       lbl AS (SELECT und.a, und.b, sa.label AS la, sb.label AS lb
               FROM und JOIN s2m sa ON und.a = sa.node
                        JOIN s2m sb ON und.b = sb.node),
       ec AS (SELECT la AS label, CAST(COUNT(*) AS BIGINT) AS e_in
              FROM lbl WHERE la = lb GROUP BY 1),
       deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS dg
               FROM (SELECT a AS node FROM und
                     UNION ALL SELECT b FROM und) GROUP BY 1),
       dc AS (SELECT s2m.label, CAST(SUM(dg) AS BIGINT) AS d_c
              FROM deg JOIN s2m ON deg.node = s2m.node GROUP BY 1),
       parts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_comm,
                        CAST(SUM(COALESCE(e_in, 0)) AS BIGINT) AS s_ein,
                        CAST(SUM(d_c * d_c) AS BIGINT) AS s_d2
                 FROM dc LEFT JOIN ec USING (label))
       SELECT m, n_comm, s_ein, s_d2,
              CAST(CASE WHEN 4 * m * s_ein - s_d2 >= 0
                   THEN (10000 * (4 * m * s_ein - s_d2)) // (4 * m * m)
                   ELSE -((10000 * (s_d2 - 4 * m * s_ein)) // (4 * m * m))
                   END AS BIGINT) AS q_bp
       FROM parts CROSS JOIN mm"""

  /** The MinHash-LSH S-curve at this engine's banding (k = 16 as
    * 4 bands × 4 rows, `d_minhash_lsh`'s parameters): for a Jaccard
    * similarity grid s ∈ {0.05 … 0.95}, the candidate probability
    * P = 1 − (1 − s⁴)⁴ — the table that justifies (or retunes) the
    * banding before a corpus-scale dedup run. The powers are UNROLLED
    * multiplications in one fixed expression tree, so both engines
    * execute the same IEEE-754 op sequence bit-identically (no pow(),
    * whose libm last-ulps differ); the output rounds to basis points.
    * 19 rows from a range source — no table scan at all. */
  private def dLshScurve(spark: SparkSession, d: String): DataFrame =
    spark.range(1, 20)
      .select((col("id") * 500).cast("long").as("s_bp"))
      .withColumn("s", col("s_bp").cast("double") / 10000.0)
      .withColumn("s4", expr("s * s * s * s"))
      .withColumn("t", expr("1.0 - s4"))
      .withColumn("p", expr("1.0 - (t * t * t * t)"))
      .select(col("s_bp"),
        expr("CAST(round(p * 10000, 0) AS BIGINT)").as("p_bp"))
      .orderBy("s_bp")

  private val dLshScurveSql =
    """SELECT s_bp, CAST(round(p * 10000, 0) AS BIGINT) AS p_bp
       FROM (SELECT s_bp, 1.0 - (t * t * t * t) AS p
             FROM (SELECT s_bp, 1.0 - (s * s * s * s) AS t
                   FROM (SELECT CAST(i * 500 AS BIGINT) AS s_bp,
                                CAST(i * 500 AS DOUBLE) / 10000.0 AS s
                         FROM range(1, 20) r(i))))
       ORDER BY s_bp"""

  /** Degree assortativity (Newman 2002) of the trade graph — do
    * high-degree nodes link to high-degree nodes? Pearson correlation of
    * the endpoint degrees over the DIRECTED edge list (each undirected
    * edge counted both ways, so the x/y marginals coincide and the
    * denominator is the single integer m₂·Σx² − (Σx)² — no sqrt):
    * r = (m₂·Σxy − (Σx)²) / (m₂·Σx² − (Σx)²). The three sums are
    * BIGINT-exact (≤ 10¹⁴ at sf1, within double's 2⁵³ integer range);
    * the final ratio is ONE fixed IEEE multiply/subtract/divide tree —
    * bit-identical on both engines — rounded to basis points. A strongly
    * negative r_bp is the bipartite-hub signature this cust↔supp graph
    * should show. 1-row output: m₂ and the sums (auditable), r_bp. */
  private def grAssortativity(spark: SparkSession, d: String): DataFrame = {
    val e = GraphQ.tradeEdges(spark, d)
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
      .localCheckpoint()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("dg"))
    val j = e
      .join(deg.select(col("node").as("src"), col("dg").as("dx")), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("dg").as("dy")), Seq("dst"))
    j.agg(count(lit(1)).as("m2"),
        sum(col("dx")).as("sx"),
        sum(expr("dx * dy")).as("sxy"),
        sum(expr("dx * dx")).as("sx2"))
      .select(col("m2"), col("sx"), col("sxy"), col("sx2"),
        expr("CAST(round(10000.0 * " +
          "(CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE) " +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / " +
          "(CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE) " +
          " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 0) AS BIGINT)")
          .as("r_bp"))
  }

  private val grAssortativitySql =
    """WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS cust_node,
                              l_suppkey * 2 + 1 AS supp_node
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT cust_node AS src, supp_node AS dst FROM pairs
             UNION
             SELECT supp_node, cust_node FROM pairs),
       deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS dg
               FROM e GROUP BY 1),
       j AS (SELECT dx.dg AS dx, dy.dg AS dy
             FROM e JOIN deg dx ON e.src = dx.node
                    JOIN deg dy ON e.dst = dy.node),
       s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                    CAST(SUM(dx) AS BIGINT) AS sx,
                    CAST(SUM(dx * dy) AS BIGINT) AS sxy,
                    CAST(SUM(dx * dx) AS BIGINT) AS sx2
             FROM j)
       SELECT m2, sx, sxy, sx2,
              CAST(round(10000.0 *
                (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
                (CAST(m2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 0) AS BIGINT)
                AS r_bp
       FROM s"""

  def queries: Seq[Q] = Seq(
    Q("gr_modularity", grModularity, Some(grModularitySql)),
    Q("gr_assortativity", grAssortativity, Some(grAssortativitySql)),
    Q("d_lsh_scurve", dLshScurve, Some(dLshScurveSql)))
}
