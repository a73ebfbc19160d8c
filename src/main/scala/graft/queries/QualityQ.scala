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

  // ------------------------------------------------------------ t_langid_eval

  /** Confusion matrix of the stopword-vote language ID
    * ([[graft.text.Text.langIdFast]], the `t_langid` heuristic)
    * against the documents table's GROUND-TRUTH lang column — the
    * measured-not-asserted discipline applied to the classifier the
    * corpus filters depend on: per (true, predicted) cell the count
    * and the within-true recall share in bp (diagonal = per-language
    * recall; off-diagonal mass names exactly which languages the
    * stopword vote confuses, incl. the 'und' abstentions). One fact
    * shuffle onto the ≤ |langs|² grid; the share window is
    * PARTITIONED by true language over that grid. */
  private def tLangidEval(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("true_lang")
    graft.Tables.documents(spark, d)
      .select(col("lang").as("true_lang"),
        graft.text.Text.langIdFast(col("text")).as("pred_lang"))
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_true", sum(col("n")).over(w))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        expr("(n * 10000) div n_true").as("recall_bp"))
      .orderBy("true_lang", "pred_lang")
  }

  private val tLangidEvalSql = {
    val lists = graft.text.Text.langStopwords.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
    val hitCols = lists.map { case (l, arr) =>
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS h_$l"
    }.mkString(", ")
    val langs = lists.map(_._1)
    val g = s"greatest(${langs.map("h_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN h_$l = g AND g > 0 THEN '$l'")
      .mkString(" ")
    s"""WITH t AS (SELECT lang, string_split(text, ' ') AS toks
            FROM documents),
       h AS (SELECT lang, $hitCols FROM t),
       m AS (SELECT *, $g AS g FROM h),
       p AS (SELECT lang AS true_lang,
               CASE $cases ELSE 'und' END AS pred_lang
             FROM m),
       c AS (SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
             FROM p GROUP BY 1, 2)
       SELECT true_lang, pred_lang, n,
              CAST((n * 10000) // SUM(n) OVER (PARTITION BY true_lang)
                AS BIGINT) AS recall_bp
       FROM c ORDER BY true_lang, pred_lang"""
  }

  // -------------------------------------------------------- c_filter_ablation

  /** Corpus-filter ablation grid — which filter does the work, and how
    * much do they overlap: per ordered filter pair (a ≤ b, diagonal =
    * the filter alone), the documents and token mass BOTH would
    * remove, with the doc share of the whole corpus in bp. Filters are
    * the suite's own gates: `lang` (stopword-vote language ≠ en),
    * `quality` (the t_filter_pipeline 0.5 gate), `rep` (3-gram
    * dup_frac > 1/5 as the INTEGER comparison 5·(n_grams−n_distinct) >
    * n_grams), `short` (< 10 tokens, the Gopher floor). High
    * off-diagonal overlap means a filter is redundant; a diagonal-
    * heavy grid means each earns its slot. One scan computes all four
    * flags; the explode is ≤ 4 rows/doc; the pair join is per-doc over
    * those ≤ 4 rows — never corpus². Corpus total rides a 1-row cross
    * join (PlanAuditSpec-listed). */
  private def cFilterAblation(spark: SparkSession, d: String): DataFrame = {
    import graft.text.Text
    val enStop = Text.langStopwords.toMap.apply("en")
    val qs = Text.qualityStatsFast(col("text"), enStop)
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tok"),
        Text.langIdFast(col("text")).as("lang_guess"),
        qs.getField("quality").as("quality"),
        greatest(Text.tokenCount(col("text")) - 2, lit(0)).cast("long")
          .as("n_grams"),
        size(graft.dedup.Dedup.shinglesFast(col("text"), 3)).cast("long")
          .as("n_distinct"))
    val flagged = docs.select(col("doc_id"), col("n_tok"),
      explode(expr(
        """filter(array(
             IF(lang_guess != 'en', 'lang', NULL),
             IF(quality < 0.5, 'quality', NULL),
             IF(5 * (n_grams - n_distinct) > n_grams, 'rep', NULL),
             IF(n_tok < 10, 'short', NULL)),
           x -> x IS NOT NULL)""")).as("f"))
    val tot = graft.Tables.documents(spark, d)
      .agg(count(lit(1)).as("n_corpus"))
    flagged.as("a")
      .join(flagged.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.f") <= col("b.f"))
      .groupBy(col("a.f").as("filter_a"), col("b.f").as("filter_b"))
      .agg(count(lit(1)).as("n_docs"), sum(col("a.n_tok")).as("tok_sum"))
      .crossJoin(broadcast(tot))
      .select(col("filter_a"), col("filter_b"), col("n_docs"),
        col("tok_sum"),
        expr("(n_docs * 10000) div n_corpus").as("pct_docs_bp"))
      .orderBy("filter_a", "filter_b")
  }

  private val cFilterAblationSql = {
    val stopList = graft.text.Text.langStopwords.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val lists = graft.text.Text.langStopwords.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
    val hitCols = lists.map { case (l, arr) =>
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS h_$l"
    }.mkString(", ")
    val langs = lists.map(_._1)
    val g = s"greatest(${langs.map("h_" + _).mkString(", ")})"
    val cases = langs.map(l => s"WHEN h_$l = g AND g > 0 THEN '$l'")
      .mkString(" ")
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
            FROM documents),
       h0 AS (SELECT doc_id, toks, $hitCols FROM t),
       h1 AS (SELECT *, $g AS g FROM h0),
       f AS (SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CASE $cases ELSE 'und' END AS lang_guess,
               (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
                 + (CAST(len(list_filter(toks,
                      x -> list_contains($stopList, x))) AS DOUBLE)
                    / len(toks)) * 0.25
                 + (CASE WHEN len(toks) BETWEEN 10 AND 1000
                         THEN 1.0 ELSE 0.5 END) * 0.25 AS quality,
               CAST(GREATEST(len(toks) - 2, 0) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(list_transform(
                 range(1, GREATEST(len(toks) - 1, 1)),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                 AS BIGINT) AS n_distinct
             FROM h1),
       fl AS (SELECT doc_id, n_tok,
                unnest(list_filter([
                  CASE WHEN lang_guess <> 'en' THEN 'lang' END,
                  CASE WHEN quality < 0.5 THEN 'quality' END,
                  CASE WHEN 5 * (n_grams - n_distinct) > n_grams
                       THEN 'rep' END,
                  CASE WHEN n_tok < 10 THEN 'short' END],
                  x -> x IS NOT NULL)) AS f
              FROM f),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM t),
       pairs AS (SELECT a.f AS filter_a, b.f AS filter_b,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(a.n_tok) AS BIGINT) AS tok_sum
                 FROM fl a JOIN fl b
                   ON a.doc_id = b.doc_id AND a.f <= b.f
                 GROUP BY 1, 2)
       SELECT filter_a, filter_b, n_docs, tok_sum,
              CAST((n_docs * 10000) // n_corpus AS BIGINT) AS pct_docs_bp
       FROM pairs CROSS JOIN tot ORDER BY 1, 2"""
  }

  def queries: Seq[Q] = Seq(
    Q("gr_modularity", grModularity, Some(grModularitySql)),
    Q("gr_assortativity", grAssortativity, Some(grAssortativitySql)),
    Q("t_langid_eval", tLangidEval, Some(tLangidEvalSql)),
    Q("c_filter_ablation", cFilterAblation, Some(cFilterAblationSql)),
    Q("d_lsh_scurve", dLshScurve, Some(dLshScurveSql)))
}
