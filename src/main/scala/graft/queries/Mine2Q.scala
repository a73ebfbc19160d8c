package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.text.Text
import graft.util.Exact.idiv

/** Round-9 mining pack II: collocation mining and an ordering-bias
  * monitor — both exact-integer so the DuckDB oracle replays them
  * bit-for-bit.
  *
  * `t_colloc_lift` is the phrase-harvesting step of a corpus pipeline
  * (Mikolov et al. 2013 §4 mine phrases with a count-ratio score; the
  * classic association form is lift = P(xy)/(P(x)·P(y))). Log-free on
  * purpose: lift is a pure count ratio, so both engines do integer
  * arithmetic only — `lift_bp = N·c(xy)·10⁴ div (c(x)·c(y))` in
  * DECIMAL(38,0)/HUGEINT, immune to libm drift (the same reason
  * `mb_rules` reports lift not log-PMI).
  *
  * `st_runs_test` is the Wald–Wolfowitz runs test applied as a pipeline
  * monitor: a daily-revenue series whose above/below-mean signs
  * cluster into far fewer runs than expected is trending/shifted, far
  * more is oscillating — either way not exchangeable, the cheap
  * one-scalar complement to `e_cusum_drift`'s sequential detector.
  */
object Mine2Q extends QueryPack {

  private val D38 = DecimalType(38, 0)
  /** Min bigram support: below this, lift is count noise (a 1-in-N
    * bigram of two 1-in-N words scores N·10⁴). */
  private val MinC = 10
  private val TopK = 50

  // ----------------------------------------------------------- t_colloc_lift

  /** Top-[[TopK]] bigram collocations by integer lift. Shape: one token
    * scan feeds BOTH the unigram and the adjacent-bigram partial-agg
    * counts (each collapsed map-side before its shuffle); the two
    * |vocab|-sized joins hang the component counts back on the ≥[[MinC]]
    * bigrams; the corpus token total N is a ONE-row aggregate cross join
    * (scalar by construction, PlanAuditSpec-listed). Final top-k is
    * TakeOrderedAndProject — (lift, w1, w2) is a total order because
    * (w1, w2) is the group key, so the cut is deterministic. At 100 TB
    * every relation after the scans is vocab- not corpus-sized. */
  private def tCollocLift(spark: SparkSession, d: String): DataFrame =
    collocTop(spark, d)

  private def collocTop(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(Text.tokens(col("text")).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val n = uni.agg(sum(col("c1")).cast("long").as("n_tokens"))
    // codegen'd bigram extraction (BigramsExpr; empty array for <2
    // tokens, so explode subsumes the old size(t) >= 2 prefilter)
    val big = Tables.documents(spark, d)
      .select(explode(Text.bigramsArr(col("text"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= MinC)
    big
      .join(uni.select(col("w").as("w1"), col("c1").as("c1a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1b")), "w2")
      .crossJoin(n)
      .select(col("w1"), col("w2"), col("c2").cast("long").as("n_pair"),
        idiv(col("c2").cast(D38) * col("n_tokens") * 10000,
          col("c1a").cast(D38) * col("c1b")).cast("long").as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("w1"), col("w2"))
      .limit(TopK)
  }

  /** The collocation CTE chain shared by the mining oracle and the
    * apply-pass oracle. */
  private val collocCtes =
    s"""toks AS (SELECT string_split(text, ' ') AS t FROM documents),
       uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
               FROM (SELECT UNNEST(t) AS w FROM toks) g GROUP BY 1),
       n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_tokens FROM uni),
       big AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c2
               FROM (SELECT UNNEST(list_transform(range(1, len(t)),
                         i -> {'w1': t[i], 'w2': t[i + 1]})) AS b
                     FROM toks WHERE len(t) >= 2) g
               GROUP BY 1, 2
               HAVING COUNT(*) >= $MinC),
       top50 AS (SELECT big.w1, big.w2, big.c2 AS n_pair,
              CAST(CAST(big.c2 AS HUGEINT) * n.n_tokens * 10000
                   // (CAST(a.c1 AS HUGEINT) * b.c1) AS BIGINT) AS lift_bp
       FROM big
       JOIN uni a ON a.w = big.w1
       JOIN uni b ON b.w = big.w2
       CROSS JOIN n
       ORDER BY lift_bp DESC, big.w1, big.w2
       LIMIT $TopK)"""

  private val tCollocLiftSql =
    s"""WITH $collocCtes
       SELECT w1, w2, n_pair, lift_bp FROM top50
       ORDER BY lift_bp DESC, w1, w2"""

  // ----------------------------------------------------------- t_colloc_apply

  /** The word2phrase APPLY pass: merge every non-overlapping, leftmost-
    * greedy occurrence of a mined top-[[TopK]] collocation into a
    * single token and account for the corpus-wide token-count change.
    * Greedy non-overlap looks sequential, but is exactly a PARITY rule
    * over runs of consecutive matches: within each maximal run of
    * bigram matches at adjacent positions, the 1st, 3rd, 5th… merge
    * and the even ones are consumed by their left neighbor ("a b c"
    * with both ("a","b") and ("b","c") in the set merges only ("a","b")
    * — word2phrase's scan order). So: per-doc match positions → run
    * boundaries via lag — run-relative row_number — keep odd ranks.
    * All windows are PARTITIONED by doc (match lists, ≤ doc length);
    * the phrase set joins in as a broadcast [[TopK]]-row dim; the final
    * accounting crosses two ONE-row aggregates (PlanAuditSpec-listed).
    * Output: one row (n_matches, n_merges, tokens_before,
    * tokens_after). */
  private def tCollocApply(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val before = toks.agg(sum(size(col("t"))).cast("long")
      .as("tokens_before"))
    val pos = Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(Text.bigramsArr(col("text"), withPos = true)).as("b"))
      .select(col("doc_id"), col("b.p").as("p"), col("b.w1").as("w1"),
        col("b.w2").as("w2"))
    val matches = pos
      .join(broadcast(collocTop(spark, d).select("w1", "w2")), Seq("w1", "w2"))
      .select("doc_id", "p")
    val wDoc = Window.partitionBy("doc_id").orderBy("p")
    val runs = matches
      .withColumn("new_run",
        when(col("p") - coalesce(lag(col("p"), 1).over(wDoc), lit(-1L))
          =!= 1L, 1L).otherwise(0L))
      .withColumn("run_id", sum(col("new_run")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id", "run_id").orderBy("p")))
    runs.agg(count(lit(1)).cast("long").as("n_matches"),
        sum(when(col("rn") % 2 === 1, 1L).otherwise(0L)).cast("long")
          .as("n_merges"))
      .crossJoin(before)
      .select(col("n_matches"), col("n_merges"), col("tokens_before"),
        (col("tokens_before") - col("n_merges")).as("tokens_after"))
  }

  private val tCollocApplySql =
    s"""WITH $collocCtes,
       tid AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       before AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS tokens_before
                  FROM tid),
       pos AS (SELECT doc_id, b.p AS p, b.w1 AS w1, b.w2 AS w2
               FROM (SELECT doc_id,
                       UNNEST(list_transform(range(1, len(t)),
                         i -> {'p': i, 'w1': t[i], 'w2': t[i + 1]})) AS b
                     FROM tid WHERE len(t) >= 2) g),
       m AS (SELECT doc_id, p FROM pos JOIN top50 USING (w1, w2)),
       r AS (SELECT doc_id, p,
                    CASE WHEN p - COALESCE(LAG(p) OVER (PARTITION BY doc_id
                         ORDER BY p), -1) <> 1 THEN 1 ELSE 0 END AS new_run
             FROM m),
       rr AS (SELECT doc_id, p,
                     SUM(new_run) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS UNBOUNDED PRECEDING) AS run_id
              FROM r),
       rk AS (SELECT doc_id, p,
                     ROW_NUMBER() OVER (PARTITION BY doc_id, run_id
                       ORDER BY p) AS rn
              FROM rr)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
              CAST(SUM(CASE WHEN rn % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_merges,
              before.tokens_before,
              CAST(before.tokens_before
                   - SUM(CASE WHEN rn % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS tokens_after
       FROM rk CROSS JOIN before
       GROUP BY before.tokens_before"""

  // ------------------------------------------------------------ st_runs_test

  /** Wald–Wolfowitz runs test over the daily order-revenue series:
    * daily totals in exact integer cents, signed against the integer
    * mean (div — both engines truncate identically on the non-negative
    * operands), runs counted with a lag over the DATE-ordered series.
    * The global window runs on the post-agg CALENDAR-sized relation
    * (|days|, same scale story as `w2_rolling`), never on orders; the
    * mean is a ONE-row aggregate cross join. Output is one row:
    * observed runs vs the exchangeability expectation
    * E[R] = 1 + 2·n₊·n₋/n in basis points. */
  private def stRunsTest(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, d)
      .select(to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum(col("cents")).as("total_c"))
    val mean = daily.agg(idiv(sum(col("total_c")), count(lit(1)))
      .as("mean_c"))
    val signed = daily.crossJoin(mean)
      .select(col("day"),
        (col("total_c") > col("mean_c")).cast("int").as("s"))
    val w = Window.orderBy("day")
    signed
      .select(col("s"), lag(col("s"), 1).over(w).as("ps"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("s")).cast("long").as("n_above"),
        sum(lit(1) - col("s")).cast("long").as("n_below"),
        sum(when(col("ps").isNull || col("s") =!= col("ps"), 1L)
          .otherwise(0L)).cast("long").as("runs"))
      .select(col("n_days"), col("n_above"), col("n_below"), col("runs"),
        (lit(10000L) + idiv(col("n_above") * col("n_below") * 20000L,
          col("n_days"))).as("expected_runs_bp"))
  }

  private val stRunsTestSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS total_c
            FROM orders GROUP BY 1),
       m AS (SELECT CAST(SUM(total_c) // COUNT(*) AS BIGINT) AS mean_c
             FROM daily),
       s AS (SELECT day, CAST(total_c > m.mean_c AS INT) AS s
             FROM daily, m),
       l AS (SELECT s, LAG(s) OVER (ORDER BY day) AS ps FROM s)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
              CAST(SUM(s) AS BIGINT) AS n_above,
              CAST(SUM(1 - s) AS BIGINT) AS n_below,
              CAST(SUM(CASE WHEN ps IS NULL OR s <> ps THEN 1 ELSE 0 END)
                   AS BIGINT) AS runs,
              CAST(10000 + (SUM(s) * SUM(1 - s) * 20000) // COUNT(*)
                   AS BIGINT) AS expected_runs_bp
       FROM l"""

  // ------------------------------------------- st_exact_median / st_exact_p90

  /** Exact order statistics over the largest fact column
    * ([[graft.util.Selection.exactRank]]: iterative range-narrowing, no
    * global sort — log₆₄(value-range) filtered scans, each a B-row
    * mergeable aggregate). Like `sim_mmr`/`d_cc` this is an
    * iterative-query shape: the narrowing loop executes at
    * construction and the audited plan is the driver-local 1-row
    * result; the kernel's per-round plans are the scan + 64-row agg
    * documented in its scaladoc. k is pinned by an explicit integer
    * formula replayed verbatim by the oracle's rank-k window selection
    * (lower median k = (n+1) div 2; p90 k = ⌈9n/10⌉). */
  private def exactQuantile(num: Long, den: Long, ceil: Boolean)(
      spark: SparkSession, d: String): DataFrame = {
    val vals = Tables.lineitem(spark, d)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
    val n = vals.count()
    val k = if (ceil) (num * n + den - 1) / den else (num * n + num) / den
    val v = graft.util.Selection.exactRank(vals, col("c"), k)
    import spark.implicits._
    Seq((n, k, v)).toDF("n_rows", "k", "value_cents")
  }

  private def quantileSql(kExpr: String) =
    s"""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                 FROM lineitem),
       r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
                    COUNT(*) OVER () AS n
             FROM v)
       SELECT CAST(n AS BIGINT) AS n_rows, CAST($kExpr AS BIGINT) AS k,
              CAST(c AS BIGINT) AS value_cents
       FROM r WHERE rn = $kExpr"""

  // -------------------------------------------------------------- sim_knn_cc

  /** Mutual-kNN embedding clustering
    * ([[graft.sim.Similarity.mutualKnnClusters]], k=3 over the standard
    * 16-plane/4-band LSH): reciprocal top-k edges → connected
    * components — the density-free complement to `d_semantic`'s
    * k-means cells (no codebook; hubs stripped by the mutuality
    * filter). Deterministic end-to-end (md5 hyperplanes, 4dp rerank,
    * id tie-breaks, min-id labels), so the oracle replays signatures,
    * bands, top-3 lists, the reciprocity join, and the transitive
    * closure. The reused CTEs are `AS MATERIALIZED` (the README's
    * oracle-spill pattern): without the hints DuckDB re-derives the
    * vector-carrying candidate join under the rank window and spills
    * > 79 GB at sf1; with them the window sorts a 24-byte/row
    * materialization and the sf1 replay passes. */
  /** Shared candidate-sims build for the whole mutual-kNN family —
    * [[graft.sim.Similarity.lshCandidateSims]] over the embeddings
    * corpus, built ONCE per (session, sfDir) and cut per (k, snn)
    * config. The oracle already shares exactly this work (its
    * `sigs`/`cand`/`sims` CTEs are `AS MATERIALIZED` across every
    * chain); without the cache, `sim_knn_cc` + `sim_knn_purity`'s two
    * configs rebuilt the same signatures → band join → rerank three
    * times — the suite's #1 and #5 bench rows. localCheckpoint (not
    * persist) so each consumer's rank window reads a bare
    * materialization, not the re-optimized build subtree. */
  private val knnSimsCache = graft.util.ManagedCaches.register()
  private val knnCcCache = graft.util.ManagedCaches.register()

  /** The (k, snn_min) dial points `sim_knn_purity` measures (declared
    * here, above [[KnnMaxK]], so the cache depth DERIVES from the
    * consumer configs — adding a config can never under-fill the
    * shared ranked build). */
  private val PurityConfigs = Seq((3, 0), (8, 1))

  /** The k `sim_knn_cc` clusters at (shared with PurityConfigs' first
    * row). */
  private val KnnCcK = 3

  /** Max k over every consumer config — the cached ranked-kNN
    * materialization keeps ranks up to here; each config is then a
    * bare `rank <= k` filter. Computed, not hand-written: a config
    * with k beyond the cache would otherwise silently cluster from an
    * under-filled neighbor list. */
  private val KnnMaxK = (PurityConfigs.map(_._1) :+ KnnCcK).max

  private def knnSims(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.checkpointCache(knnSimsCache, spark, d) {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(spark, d)
      val sims = graft.sim.Similarity.lshCandidateSims(
        e, e, graft.sim.Similarity.annParamsFor(e, d))
      val wk = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      sims.withColumn("rank", row_number().over(wk))
        .filter(col("rank") <= KnnMaxK)
        .select("query_id", "neighbor_id", "rank")
    }

  /** The (k=3, snn=0) clustering, shared VERBATIM by `sim_knn_cc` and
    * `sim_knn_purity`'s first config row. */
  private def knnCluster3(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.checkpointCache(knnCcCache, spark, d)(
      graft.sim.Similarity.mutualKnnClustersFromRanked(
        Tables.embeddings(spark, d), knnSims(spark, d), k = KnnCcK))

  private def simKnnCc(spark: SparkSession, d: String): DataFrame =
    knnCluster3(spark, d).orderBy("vec_id")

  /** Config-independent CTE prefix (signatures → banded candidates →
    * rerank sims), shared by every (k, snn) chain in one statement. */
  private val knnCommonCtes: String =
    s"""WITH RECURSIVE
       ${AnnSql.simsCtes("TRUE", qCol = "u", nCol = "v2")}"""

  /** One (k, snn) clustering chain, CTE names suffixed so several
    * configs coexist in one WITH RECURSIVE. Mirrors
    * [[graft.sim.Similarity.mutualKnnClusters]] exactly: top-k by
    * (sim DESC, id), reciprocity, optional ≥snn shared-top-k-neighbor
    * gate, min-label transitive closure, singletons self-labeled. */
  private def knnChainCtes(k: Int, snn: Int, sfx: String): String = {
    val mutualCte =
      if (snn <= 0)
        s"""mutual$sfx AS (SELECT a.u AS id_a, a.v2 AS id_b
                  FROM knn$sfx a JOIN knn$sfx b ON a.u = b.v2 AND a.v2 = b.u
                  WHERE a.u < a.v2)"""
      else
        s"""mutual0$sfx AS (SELECT a.u AS id_a, a.v2 AS id_b
                  FROM knn$sfx a JOIN knn$sfx b ON a.u = b.v2 AND a.v2 = b.u
                  WHERE a.u < a.v2),
       snn$sfx AS (SELECT x.u AS id_a, y.u AS id_b
                   FROM knn$sfx x JOIN knn$sfx y
                     ON x.v2 = y.v2 AND x.u < y.u
                   GROUP BY 1, 2 HAVING COUNT(*) >= $snn),
       mutual$sfx AS (SELECT m.id_a, m.id_b FROM mutual0$sfx m
                      JOIN snn$sfx USING (id_a, id_b))"""
    s"""knn$sfx AS MATERIALIZED (SELECT u, v2 FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY u
                           ORDER BY sim DESC, v2) AS rn FROM sims)
               WHERE rn <= $k),
       $mutualCte,
       edges$sfx AS (SELECT id_a AS u, id_b AS v FROM mutual$sfx
                 UNION ALL SELECT id_b, id_a FROM mutual$sfx),
       reach$sfx AS (SELECT u, v FROM edges$sfx
                 UNION
                 SELECT r.u, e.v FROM reach$sfx r
                 JOIN edges$sfx e ON r.v = e.u),
       groups$sfx AS (SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_id
                  FROM reach$sfx GROUP BY u),
       lab$sfx AS (SELECT e.vec_id,
                      COALESCE(g.cluster_id, e.vec_id) AS cluster_id
               FROM embeddings e LEFT JOIN groups$sfx g USING (vec_id))"""
  }

  private val simKnnCcSql: String =
    s"""$knnCommonCtes,
       ${knnChainCtes(3, 0, "")},
       sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
              FROM lab GROUP BY 1)
       SELECT lab.vec_id, lab.cluster_id, sz.n_members
       FROM lab JOIN sz USING (cluster_id) ORDER BY vec_id"""

  // --------------------------------------------------------- sim_knn_purity

  /** Clustering-quality harness for [[simKnnCc]] — purity against the
    * generator's planted labels across the (k, snn) dial, measured not
    * asserted (the `sim_recall_lsh` discipline applied to clustering):
    * purity = Σ_clusters max_label |cluster ∩ label| / N in exact
    * basis points (each max is an integer count — pure integer
    * arithmetic in both engines). One row per config. The two configs
    * bracket the dial's failure modes ON THIS CORPUS: plain mutual-3NN
    * single-links into one giant component (purity ≈ chance), while
    * k=8 + SNN≥1 recovers label-aligned granularity — singletons are
    * reported alongside because an unclustered vector is its own
    * majority and inflates naive purity. Everything after each
    * clustering is (cluster × label)-sized. The configs live in
    * [[PurityConfigs]] (declared beside [[KnnMaxK]], which derives
    * from them). */
  private def simKnnPurity(spark: SparkSession, d: String): DataFrame = {
    val labels = Tables.embeddings(spark, d).select("vec_id", "label")
    PurityConfigs.map { case (k, snn) =>
      require(k <= KnnMaxK,
        s"purity config k=$k exceeds the shared ranked-kNN cache depth $KnnMaxK")
      val cl =
        if (k == KnnCcK && snn == 0) knnCluster3(spark, d)
        else graft.sim.Similarity.mutualKnnClustersFromRanked(
          Tables.embeddings(spark, d), knnSims(spark, d), k = k,
          snnMin = snn)
      cl.join(labels, "vec_id")
        .groupBy("cluster_id", "label").agg(count(lit(1)).as("n"))
        .groupBy("cluster_id")
        .agg(max(col("n")).as("mx"), sum(col("n")).as("sz"))
        .agg(sum(col("sz")).cast("long").as("n_vectors"),
          count(lit(1)).cast("long").as("n_clusters"),
          sum(when(col("sz") === 1, 1L).otherwise(0L)).cast("long")
            .as("n_singletons"),
          idiv(sum(col("mx")) * 10000, sum(col("sz"))).as("purity_bp"))
        .select(lit(k.toLong).as("k"), lit(snn.toLong).as("snn_min"),
          col("n_vectors"), col("n_clusters"), col("n_singletons"),
          col("purity_bp"))
    }.reduce(_ unionByName _).orderBy("k")
  }

  private val simKnnPuritySql: String = {
    val chains = PurityConfigs.map { case (k, snn) =>
      knnChainCtes(k, snn, s"_k$k")
    }.mkString(",\n       ")
    val rows = PurityConfigs.map { case (k, snn) =>
      s"""SELECT CAST($k AS BIGINT) AS k, CAST($snn AS BIGINT) AS snn_min,
              CAST(SUM(sz) AS BIGINT) AS n_vectors,
              CAST(COUNT(*) AS BIGINT) AS n_clusters,
              CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_singletons,
              CAST((SUM(mx) * 10000) // SUM(sz) AS BIGINT) AS purity_bp
       FROM (SELECT cluster_id, MAX(n) AS mx, SUM(n) AS sz
             FROM (SELECT lab_k$k.cluster_id, e.label,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM lab_k$k JOIN embeddings e USING (vec_id)
                   GROUP BY 1, 2) pl
             GROUP BY 1) pc"""
    }.mkString("\n       UNION ALL\n       ")
    s"""$knnCommonCtes,
       $chains
       SELECT * FROM ($rows) ORDER BY k"""
  }

  override def warms: Seq[Q] = Seq(
    Q("knn_sims_build", (s, d) => knnSims(s, d), None))

  def queries: Seq[Q] = Seq(
    Q("sim_knn_cc", simKnnCc, Some(simKnnCcSql)),
    Q("sim_knn_purity", simKnnPurity, Some(simKnnPuritySql)),
    Q("t_colloc_lift", tCollocLift, Some(tCollocLiftSql)),
    Q("t_colloc_apply", tCollocApply, Some(tCollocApplySql)),
    Q("st_runs_test", stRunsTest, Some(stRunsTestSql)),
    Q("st_exact_median", exactQuantile(1, 2, ceil = false),
      Some(quantileSql("(n + 1) // 2"))),
    Q("st_exact_p90", exactQuantile(9, 10, ceil = true),
      Some(quantileSql("(9 * n + 9) // 10"))))
}
