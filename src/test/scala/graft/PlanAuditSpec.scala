package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene audit over EVERY registered query: builds each plan (no
  * execution) and rejects join strategies that would be scale accidents —
  * a cartesian or broadcast-nested-loop join that is not on the explicit
  * allowlist of intentional ones. This codifies the README's plan-hygiene
  * claim so a future query can't silently regress into an O(n²) plan.
  */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-plan-audit")
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose nested-loop/cartesian joins are the POINT: the ANN
    * cross joins broadcast the (small) query side; the all-pairs kernel
    * is the shuffle-replicated exact join; q22's scalar-subquery gate is
    * a ONE-row aggregate broadcast against customer, and the partsupp
    * family (q2/q11/q15/q16/q20) and t_tfidf derive its relation via broadcast
    * cross joins of a 4-row index and one-row scalar aggregates —
    * constant-size sides by construction. */
  private val intentional = Set(
    "sim_topk", "sim_topk_agg", "sim_lsh_topk", "sim_ivf_topk",
    "sim_near_dup", "sim_kmeans", "sim_ivft", "sim_ivfpq", "d_semantic", "q22",
    "q2", "q11", "q15", "q16", "q20", "t_tfidf",
    // bm25's cross join (single + batch query form) broadcasts the
    // ONE-row corpus n_docs/total-length stats aggregate — a scalar side
    // by construction
    "t_bm25", "t_bm25_batch",
    // the recall harnesses replay the ANN cross-join shapes: the exact
    // (brute-force) side is sim_topk's broadcast-query-side join, and
    // the IVF/IVF-PQ sides cross the broadcast CODEBOOK (|centroids|
    // rows by construction) into assignment/probing — dim-sized sides
    "sim_recall_lsh", "sim_recall_ivf", "sim_recall_ivfpq",
    "sim_mp_topk", "sim_recall_mp",
    // each BPE round cross-joins the ONE-row winning-pair aggregate into
    // the vocab rewrite (and the encode fold) — scalar sides by
    // construction
    "t_bpe_merges", "t_bpe_apply",
    // the DSIR weight projection cross-joins the ONE-row corpus-total
    // aggregate (nt, nr) into the |vocab| count table — scalar side by
    // construction
    "c_affinity_select",
    // the HLL output row cross-joins the ONE-row estimate with the
    // ONE-row exact countDistinct — both scalar by construction
    "t_hll_distinct",
    // the sampled-Brandes estimator cross-joins the ONE-row n_tot and
    // n_smp source-count aggregates into the per-node scale-up — both
    // scalar by construction
    "gr_betweenness_sampled",
    // the mix-drift grid crosses the |periods| dim with the broadcast
    // |categories| dim and the ONE-row global total — dim/scalar sides
    // by construction
    "e_cat_drift",
    // hybrid fusion runs both rankers: bm25's ONE-row stats cross join
    // + the ANN broadcast-query-side join (sim_topk's shape)
    "hr_rrf",
    // the co-occurrence lift cross-joins the ONE-row engaged-user-count
    // aggregate into the |item pairs| relation — scalar side by
    // construction
    "rec_cooc", "rec_eval",
    // the KM curve cross-joins the ONE-row observation-end aggregate
    // into the per-user lifetime table — scalar side by construction
    "e_km_survival",
    // louvain's gain term and the modularity tail cross-join the
    // ONE-row 2m / global-sum / edge-count aggregates — scalar sides
    // by construction
    "gr_louvain", "gr_louvain2",
    // the ablation grid cross-joins the ONE-row corpus-count aggregate
    // into the ≤ 4×4 filter-pair relation — scalar side by construction
    "c_filter_ablation",
    // AMS F2 crosses its ONE-row 16-sum sketch with the ONE-row exact
    // F2 aggregate — both scalar by construction
    "sk_ams_f2",
    // the quantile sweep crosses the ≤ 66-bucket histogram with its
    // ONE-row total-count aggregate — fixed-size sides by construction
    "sk_qhist",
    // hard-negative mining broadcasts the (small) query side — the
    // sim_topk ANN shape with a label-disequality filter; its recall
    // harness pays for the same exact side as ground truth (the banded
    // row under grade is pure equi-joins)
    "sim_hard_neg", "sim_recall_hard_neg",
    // the banded-near-dup recall harness pays for its own ground truth:
    // the exact side IS sim_near_dup's contracted SHUFFLE_REPLICATE_NL
    // all-pairs join, and the summary row crosses three ONE-row counts
    // (scalar by construction). The banded side under grade is
    // sim_near_dup_banded's audited equi-join plan.
    "sim_recall_banded_nd",
    // temperature mixing crosses the |sources| weight table with its
    // ONE-row max aggregate — dim/scalar sides by construction
    "c_mix_temp",
    // heavy hitters: the MG candidate broadcast is ≤ k·partitions rows
    // by construction and the gate crosses the ONE-row total aggregate
    "t_heavy",
    // centroid separability pairs the |labels|-row centroid table with
    // itself via a broadcast inequality join — dim-sized by construction
    "sim_centroids",
    // winsorization crosses the ≤66-bucket histogram sweep (sk_qhist's
    // shape) and broadcasts the ONE-row clip bounds into the clamp
    "e_winsor",
    // the KMV output row crosses the ONE-row estimate with the ONE-row
    // exact countDistinct — both scalar by construction (t_hll_distinct's
    // shape)
    "sk_kmv",
    // negative sampling crosses the ONE-row node-count aggregate into
    // the ring/probe hash arithmetic — scalar side by construction
    "gr_negsample",
    // the shard plan crosses the ≤|shards|-row per-shard table with its
    // ONE-row token-total aggregate — dim/scalar sides by construction
    "c_shard_plan",
    // KMV Jaccard's output row crosses ONE-row sketch-side aggregates
    // (k_eff, n_inter) with the ONE-row exact inter/union counts —
    // all scalar by construction (sk_kmv's shape)
    "sk_kmv_jaccard",
    // MRR rides bm25's ONE-row corpus-stats cross join
    // (t_bm25_batch's shape); the grading joins are |queries|-bounded
    "t_mrr",
    // sim_mmr is plan-OPAQUE to this audit, not plan-clean: the greedy
    // k-pass loop executes at construction (the iterative-query shape,
    // like d_cc's convergence loop) and returns a driver-local k-row
    // relation, so the audited plan contains none of its joins. Its
    // internal candidate scan is the broadcast-query-side cross join of
    // sim_topk (code-identical normalized+dotFast shape) and its
    // behavior is spec'd in CurateSpec; listed here so the audit's
    // coverage claim stays honest.
    "sim_mmr",
    // MaxSim broadcasts the ≤groupSize-vector query GROUP into the
    // corpus scan — the sim_topk broadcast-query-side shape with a
    // multi-vector query
    "sim_maxsim",
    // SQ8 recall harness: both the exact side and the quantized side are
    // sim_topk's broadcast-query-side cross join
    "sim_sq8",
    // rank eval rides bm25's ONE-row corpus-stats cross join
    // (t_mrr's shape); the grading joins are |queries|-bounded
    "t_rank_eval",
    // length buckets cross the ≤(max_len/width)-row bucket table with
    // its ONE-row global-max aggregate — dim/scalar by construction
    "c_length_buckets",
    // the budget waterfall crosses the |sources|-row table with ONE-row
    // count/leftover aggregates — dim/scalar by construction
    "c_token_budget",
    // curriculum banding crosses the ONE-row min/max bounds into the
    // doc scan, then the |phases|-row table with its ONE-row total
    "c_curriculum",
    // modularity crosses the per-community sums with the ONE-row edge
    // count — scalar by construction (LPA itself is gr_labelprop's
    // audited per-round join+agg)
    "gr_modularity",
    // the singleton row crosses the ONE-row doc count with the ONE-row
    // clustered count — both scalar by construction
    "d_cluster_hist",
    // both PRF passes ride bm25's ONE-row corpus-stats cross join
    // (t_bm25_batch's shape); the feedback and expansion relations are
    // 10- and 3-row by construction
    "t_prf_expand",
    // nDCG rides bm25's ONE-row corpus-stats cross join (t_rank_eval's
    // shape); the discount/IDCG tables are ≤11-row broadcast literals
    // joined EQUI
    "t_ndcg",
    // the source-overlap pair grid is a dim×dim inequality join —
    // |sources| rows a side by construction (a catalog, not data); all
    // downstream work is O(pairs·k) sketch rows
    "sk_source_overlap",
    // the classifier evaluators score against a ONE-row label-0
    // centroid broadcast cross-joined into the embedding scan — scalar
    // side by construction (t_hll_distinct's shape); everything
    // downstream is the bounded-domain score histogram
    "ml_auc", "ml_avg_precision", "ml_calibration", "ml_confusion",
    "ml_pr_curve", "ml_lift_deciles", "ml_ks",
    // kappa broadcasts BOTH one-row centroids into the same scan —
    // two scalar sides by construction
    "ml_kappa",
    // the label-projection pass broadcasts the ONE-row power-iterated
    // direction into the embedding scan — scalar side by construction
    "sim_proj_label",
    // collocation lift crosses the ONE-row corpus-token-total aggregate
    // into the |bigram-vocab| join — scalar side by construction
    "t_colloc_lift",
    // the runs test crosses the ONE-row integer-mean aggregate into the
    // calendar-sized daily series — scalar side by construction
    "st_runs_test",
    // the apply-pass accounting crosses the ONE-row merge-count
    // aggregate with the ONE-row corpus-token total — both scalar by
    // construction (t_hll_distinct's shape)
    "t_colloc_apply",
    // graph-descent ANN is plan-opaque like sim_mmr: the kNN-graph
    // build and beam rounds execute at construction (localCheckpoint
    // truncation), so the audited plan is the final rank over
    // checkpointed beams; its internal joins are lshTopK's band-join
    // shape + |Q|·beam equi joins. The recall harness additionally
    // rides the exact side's broadcast-query-side cross join
    // (sim_topk's shape)
    "sim_nsw_topk", "sim_recall_nsw",
    // label propagation shares the graph-descent shape: build + rounds
    // execute at construction (localCheckpoint), per-round joins are
    // |V|·2k equi joins + argmax windows — plan-opaque like sim_mmr
    "sim_label_prop",
    // binary quantization rides the broadcast-query-side cross join on
    // the 16-byte CODES (sim_topk's shape with 16× narrower rows); the
    // recall harness adds the exact side's same-shape join
    "sim_bq_topk", "sim_recall_bq",
    // the MW step crosses two ONE-row aggregates (domain-mean total,
    // raw-weight sum) into the |sources| dim — scalar sides by
    // construction, plus lmScore's ≤500-row model broadcast
    "c_doremi_step",
    // the ACF denominator/numerator pass crosses the ONE-row (n, S)
    // series-total aggregate into the calendar-sized daily series —
    // scalar side by construction (st_runs_test's shape)
    "st_acf",
    // pacf and ljung-box consume the same acfBp plan (its ONE-row n/S
    // totals cross join) — the same scalar side as st_acf
    "st_pacf", "st_ljung_box",
    // Theil–Sen's pairwise-slope theta self-join pairs the |months|-row
    // POST-AGG series with itself — calendar-bounded (≈84 rows) at any
    // data volume; the final row crosses two ONE-row aggregates
    "st_theil_sen",
    // Kendall's concordance pair join pairs the |days|-row POST-AGG
    // daily series with its broadcast self — calendar-bounded (≈2.4k
    // rows a side, ~3M comparisons) at any data volume (st_theil_sen's
    // shape on the finer grain)
    "st_kendall",
    // the bootstrap grid crosses the calendar-sized daily index with
    // the 200-row broadcast resample dim, and the output row crosses
    // two ONE-row percentile picks — dim/scalar sides by construction
    "st_bootstrap_ci",
    // silhouette crosses the k-row broadcast CODEBOOK into the distance
    // scan — sim_kmeans's shape (the centroid side is dim-sized by
    // construction)
    "sim_silhouette")

  test("no accidental CartesianProduct or BroadcastNestedLoopJoin in any query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !intentional(name) =>
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: $e") }
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian/nested-loop joins in: ${offenders.mkString(", ")}")
  }

  /** r9 verdict #7 — codegen-coverage audit: the expression kernels in
    * `graft.plans` claim real `doGenCode`; this sweep asserts the claim
    * STAYS true by walking every registered query's executed plan and
    * requiring each custom Catalyst expression that appears anywhere to
    * appear inside a WholeStageCodegen region in at least one plan that
    * uses it. A new expression (or a regression in an existing one —
    * e.g. a CodegenFallback slipping in) that only ever evaluates
    * interpreted fails the audit by name. Region membership follows
    * Spark's own boundary rule: nodes under a WholeStageCodegenExec down
    * to (excluding) the next InputAdapter. */
  test("every custom Catalyst expression is codegen'd in at least one plan") {
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    val interesting = Set(
      classOf[graft.plans.SimHashExpr], classOf[graft.plans.Md5BucketExpr],
      classOf[graft.plans.ShinglesExpr], classOf[graft.plans.MinHashSigExpr],
      classOf[graft.plans.TextStatsExpr], classOf[graft.plans.QualityStatsExpr],
      classOf[graft.plans.LangIdExpr], classOf[graft.plans.DotExpr],
      classOf[graft.plans.BigramsExpr],
      classOf[graft.plans.LshSignatureExpr], classOf[graft.plans.SqDistExpr],
      classOf[graft.plans.L2NormalizeExpr]).map(_.getName)
    def exprClasses(node: SparkPlan): Set[String] =
      node.expressions.flatMap(_.collect {
        case e if interesting(e.getClass.getName) => e.getClass.getName
      }).toSet
    def regionNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: InputAdapter => Nil // codegen-region boundary
      case _ => p +: p.children.flatMap(regionNodes)
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val codegend = scala.collection.mutable.Set.empty[String]
    // AQE wraps the tree in an opaque AdaptiveSparkPlanExec; the audit
    // needs the materialized operator tree, so build these plans with
    // AQE off (restored after — the join-strategy sweep keeps the
    // production setting).
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      plan.foreach(node => seen ++= exprClasses(node))
      plan.collect { case w: WholeStageCodegenExec => w }.foreach { w =>
        regionNodes(w.child).foreach(node => codegend ++= exprClasses(node))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(seen.nonEmpty, "audit saw no custom expressions at all — " +
      "the sweep itself is broken")
    val interpretedOnly = seen -- codegend
    assert(interpretedOnly.isEmpty,
      s"custom expressions never inside a WholeStageCodegen region: " +
        s"${interpretedOnly.mkString(", ")}")
  }

  test("q7: two-nation filters sit below the fact joins (pushed to the nation scans)") {
    val plan = SparkEntry.queries("q7")(spark, sf).queryExecution.executedPlan.toString
    // The hand-derived single-side conjuncts must reach the parquet scans of
    // BOTH nation roles as pushed In-filters — i.e. below every fact join —
    // rather than surviving only as the residual pair disjunction on top.
    val pushed = "In\\(n_name".r.findAllIn(plan).size
    assert(pushed >= 2,
      s"expected the two-nation In(n_name,…) filter pushed to both nation scans, found $pushed:\n$plan")
  }

  test("q12: the shipmode/date predicates run before the orders join") {
    // The derived-column filters are ~24× selective and must gate the
    // lineitem side below the join, not filter the joined result.
    // Anchor the assertion to the join's lineitem-side CHILD subtree (a
    // Filter anywhere after the first "Join" in the plan string would
    // also match plans where the filter runs on the joined result).
    // sparkPlan, not executedPlan: AQE wraps the latter in a leaf
    // AdaptiveSparkPlanExec that TreeNode.collect cannot descend into.
    val plan = SparkEntry.queries("q12")(spark, sf).queryExecution.sparkPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, s"expected a join in q12:\n$plan")
    val liSides = joins.flatMap(_.children)
      .filter(_.toString.contains("lineitem"))
    assert(liSides.nonEmpty, s"no join child scans lineitem:\n$plan")
    assert(liSides.exists(_.collect {
        case f: org.apache.spark.sql.execution.FilterExec => f }.nonEmpty),
      s"expected the selective shipmode/date FilterExec inside the " +
        s"lineitem-side join subtree:\n$plan")
  }

  test("q13: zero-order customers survive the left join into the histogram") {
    val rows = SparkEntry.queries("q13")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.contains(0L), s"expected a c_count=0 bucket, got $rows")
  }

  override def afterAll(): Unit = {
    graft.util.ManagedCaches.clearAll(spark)
    spark.stop()
  }
}
