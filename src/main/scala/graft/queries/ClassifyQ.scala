package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.{Eval, Stats}
import graft.util.Exact

/** Round-9 classifier-evaluation pack: the measurement half of the
  * model-based curation loop. A nearest-centroid classifier scores every
  * embedding by its integer dot product with the label-0 centroid, and
  * the [[graft.ml.Eval]] evaluators grade that score against the true
  * label four ways — ROC AUC, average precision, a calibration curve,
  * and the thresholded confusion matrix. Plus Spearman rank correlation
  * ([[graft.ml.Stats.spearmanBp]]) between two per-customer metrics.
  *
  * Exactness: the score is PURE INTEGERS end to end — the house 2²⁰
  * fixed-point quantization (floor(x·2²⁰), the `sim_centroids`
  * convention), an integer-floored centroid, an integer dot product
  * (|dot| ≤ 64·2²⁰·2²⁰ = 2⁴⁶, BIGINT-safe at ANY corpus size because
  * the centroid is a MEAN — bounded by the coordinate range, not the
  * row count), then a +2⁴⁷ offset before the ÷2³⁰ floor so the
  * numerator is never negative (Spark's `div` truncates toward zero,
  * DuckDB's `//` floors — identical only for non-negative operands).
  * The resulting score domain is a BOUNDED [0, ~2¹⁷] integer range at
  * any scale, which is what makes the Eval histogram plans safe: the
  * cumulative windows sort ≤ |domain| rows, never the corpus.
  *
  * Scale shape: one partial-agg vector-sum for the centroid
  * ([[graft.plans.VecSum]] — k rows through the shuffle, not k·dims),
  * a ONE-row centroid broadcast cross join into the scoring scan
  * (PlanAuditSpec-listed, the `t_hll_distinct` scalar-side shape), one
  * groupBy(score) histogram. AUC at 100 TB is therefore: scan + two
  * bounded aggregations.
  */
object ClassifyQ extends QueryPack {

  /** Integer nearest-centroid score per embedding + binary label.
    * Shared scan for all four evaluators. */
  private def scored(spark: SparkSession, d: String): DataFrame = {
    val sv = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))")
          .as("q"))
    val cent = sv.filter(col("label") === 0)
      .agg(graft.plans.VecSum.sum(col("q")).as("s"),
        count(lit(1)).as("n"))
      .select(expr("transform(s, x -> x div n)").as("c"))
    sv.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        when(col("label") === 0, 1L).otherwise(0L).as("y"),
        expr("""(aggregate(zip_with(q, c, (a, b) -> a * b),
                           CAST(0 AS BIGINT), (acc, x) -> acc + x)
                 + 140737488355328) div 1073741824""").as("score"))
  }

  /** The same scored relation in DuckDB: list_sum over the integer
    * products (NOT list_dot_product, which is a float kernel). */
  private val scoredSql =
    """sv AS (SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
       FROM embeddings),
       ce AS (SELECT u.dim, u.q AS qv
              FROM sv, UNNEST(list_transform(q,
                (x, i) -> {'dim': i - 1, 'q': x})) AS r(u)
              WHERE label = 0),
       cagg AS (SELECT dim, SUM(qv) AS s, COUNT(*) AS n
                FROM ce GROUP BY 1),
       cent AS (SELECT list(CAST(s // n AS BIGINT) ORDER BY dim) AS c
                FROM cagg),
       scored AS (SELECT vec_id,
           CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
           CAST((list_sum(list_transform(q, (x, i) -> x * c[i]))
                 + 140737488355328) // 1073741824 AS BIGINT) AS score
         FROM sv, cent)"""

  private def mlAuc(spark: SparkSession, d: String): DataFrame =
    Eval.aucBp(scored(spark, d), col("score"), col("y"))

  private val mlAucSql =
    s"""WITH $scoredSql,
       h AS (SELECT score, SUM(y) AS pos, SUM(1 - y) AS neg
             FROM scored GROUP BY 1),
       w AS (SELECT pos, neg,
               COALESCE(SUM(neg) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS neg_below
             FROM h),
       a AS (SELECT CAST(SUM(pos) AS BIGINT) AS pos_n,
                    CAST(SUM(neg) AS BIGINT) AS neg_n,
                    SUM(CAST(pos AS HUGEINT) * (2 * neg_below + neg)) AS u2
             FROM w)
       SELECT pos_n, neg_n,
              CASE WHEN pos_n = 0 OR neg_n = 0 THEN NULL
                   ELSE CAST((u2 * 10000) //
                     (CAST(pos_n AS HUGEINT) * neg_n * 2) AS BIGINT)
              END AS auc_bp
       FROM a"""

  private def mlAvgPrecision(spark: SparkSession, d: String): DataFrame =
    Eval.avgPrecisionBp(scored(spark, d), col("score"), col("y"))

  private val mlAvgPrecisionSql =
    s"""WITH $scoredSql,
       h AS (SELECT score, SUM(y) AS pos, SUM(1 - y) AS neg
             FROM scored GROUP BY 1),
       w AS (SELECT pos,
               SUM(pos) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
               SUM(pos + neg) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
             FROM h),
       t AS (SELECT CAST(SUM(pos) AS BIGINT) AS pos_n,
                    SUM((CAST(pos AS HUGEINT) * cum_pos * 10000) // cum_n)
                      AS term_sum
             FROM w)
       SELECT pos_n,
              CASE WHEN pos_n = 0 THEN NULL
                   ELSE CAST(term_sum // pos_n AS BIGINT) END AS ap_bp
       FROM t"""

  private def mlCalibration(spark: SparkSession, d: String): DataFrame =
    Eval.calibration(scored(spark, d), col("score"), col("y"),
        bucketWidth = 16L)
      .orderBy("bucket")

  private val mlCalibrationSql =
    s"""WITH $scoredSql,
       c AS (SELECT score // 16 AS bucket, COUNT(*) AS n,
                    SUM(y) AS pos, SUM(score) AS score_sum
             FROM scored GROUP BY 1)
       SELECT bucket, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
              CAST((pos * 10000) // n AS BIGINT) AS pos_rate_bp,
              CAST((score_sum * 100) // n AS BIGINT) AS mean_score_c
       FROM c ORDER BY bucket"""

  private def mlPrCurve(spark: SparkSession, d: String): DataFrame =
    Eval.prCurve(scored(spark, d), col("score"), col("y"))
      .orderBy(col("threshold").desc)

  private val mlPrCurveSql =
    s"""WITH $scoredSql,
       h AS (SELECT score, SUM(y) AS pos, SUM(1 - y) AS neg
             FROM scored GROUP BY 1),
       w AS (SELECT score,
               SUM(pos) OVER ft AS tp_h,
               SUM(pos + neg) OVER ft AS npred,
               SUM(pos) OVER () AS pos_n
             FROM h
             WINDOW ft AS (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       SELECT score AS threshold, CAST(tp_h AS BIGINT) AS tp,
              CAST(npred - tp_h AS BIGINT) AS fp,
              CAST(pos_n - tp_h AS BIGINT) AS fn,
              CAST((tp_h * 10000) // npred AS BIGINT) AS precision_bp,
              CASE WHEN pos_n = 0 THEN NULL
                   ELSE CAST((tp_h * 10000) // pos_n AS BIGINT)
              END AS recall_bp
       FROM w ORDER BY threshold DESC"""

  private def mlConfusion(spark: SparkSession, d: String): DataFrame =
    Eval.confusion(scored(spark, d), col("score"), col("y"),
      threshold = 131090L)

  private val mlConfusionSql =
    s"""WITH $scoredSql,
       a AS (SELECT
           CAST(SUM(CASE WHEN score >= 131090 AND y = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN score >= 131090 AND y = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN score < 131090 AND y = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN score < 131090 AND y = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS tn
         FROM scored)
       SELECT tp, fp, fn, tn,
              CASE WHEN tp + fp = 0 THEN NULL
                   ELSE CAST((tp * 10000) // (tp + fp) AS BIGINT)
              END AS precision_bp,
              CASE WHEN tp + fn = 0 THEN NULL
                   ELSE CAST((tp * 10000) // (tp + fn) AS BIGINT)
              END AS recall_bp,
              CASE WHEN tp * 2 + fp + fn = 0 THEN NULL
                   ELSE CAST((tp * 20000) // (tp * 2 + fp + fn) AS BIGINT)
              END AS f1_bp
       FROM a"""

  /** Spearman ρ between per-customer total spend and order count —
    * do bigger spenders order more often, as a rank statistic. The
    * metrics aggregate first (one groupBy on the customer key), so the
    * rank windows sort the CUSTOMER table, not orders. */
  private def stSpearman(spark: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(spark, d)
      .groupBy("o_custkey")
      .agg(sum((Exact.dec2(col("o_totalprice")) * 100).cast("long"))
          .cast("long").as("spend_c"),
        count(lit(1)).cast("long").as("n_orders"))
    Stats.spearmanBp(perCust, col("spend_c"), col("n_orders"),
      col("o_custkey"))
  }

  private val stSpearmanSql =
    """WITH pc AS (SELECT o_custkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS BIGINT) AS spend_c,
         COUNT(*) AS n_orders
       FROM orders GROUP BY 1),
       r AS (SELECT
               ROW_NUMBER() OVER (ORDER BY spend_c, o_custkey) AS rx,
               ROW_NUMBER() OVER (ORDER BY n_orders, o_custkey) AS ry
             FROM pc),
       a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(rx - ry AS HUGEINT) * (rx - ry))
                      AS BIGINT) AS sum_d2
             FROM r)
       SELECT n, sum_d2,
              CASE WHEN n <= 1 THEN NULL
                   ELSE CAST(10000 - (CAST(sum_d2 AS HUGEINT) * 60000) //
                     (CAST(n AS HUGEINT) * n * n - n) AS BIGINT)
              END AS rho_bp
       FROM a"""

  /** Cohen's kappa between TWO deterministic classifiers over the same
    * embeddings — chance-corrected agreement, the metric behind
    * inter-annotator / model-vs-model audits. Annotator A is
    * `ml_confusion`'s thresholded centroid-0 score; annotator B is the
    * two-centroid nearest-of rule (dot₀ > dot₁). One scan with BOTH
    * one-row centroids broadcast in, one 4-cell agreement aggregate,
    * then κ = (N·(n₁₁+n₀₀) − E) / (N² − E) with
    * E = (n₁₁+n₁₀)(n₁₁+n₀₁) + (n₀₁+n₀₀)(n₁₀+n₀₀), floor-divided
    * sign-safely into basis points (κ can be negative). The cross-row
    * products run in DECIMAL(38,0)/HUGEINT — N² overflows BIGINT long
    * before the scan becomes the bottleneck. */
  private def mlKappa(spark: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val sv = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))")
          .as("q"))
    def cent(label: Int, out: String) =
      sv.filter(col("label") === label)
        .agg(graft.plans.VecSum.sum(col("q")).as("s"),
          count(lit(1)).as("n"))
        .select(expr("transform(s, x -> x div n)").as(out))
    val dot = (c: String) =>
      s"""aggregate(zip_with(q, $c, (a, b) -> a * b),
          CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
    val cells = sv.crossJoin(broadcast(cent(0, "c0")))
      .crossJoin(broadcast(cent(1, "c1")))
      .select(
        expr(s"""CASE WHEN (${dot("c0")} + 140737488355328)
                   div 1073741824 >= 131090 THEN 1 ELSE 0 END""").as("a"),
        expr(s"""CASE WHEN ${dot("c0")} > ${dot("c1")}
                   THEN 1 ELSE 0 END""").as("b"))
      .agg(
        sum(col("a") * col("b")).cast("long").as("n11"),
        sum(col("a") * (lit(1) - col("b"))).cast("long").as("n10"),
        sum((lit(1) - col("a")) * col("b")).cast("long").as("n01"),
        sum((lit(1) - col("a")) * (lit(1) - col("b"))).cast("long")
          .as("n00"))
    cells
      .withColumn("nn",
        (col("n11") + col("n10") + col("n01") + col("n00")).cast(D))
      .withColumn("ee", expr(
        """(CAST(n11 AS DECIMAL(38,0)) + n10) * (CAST(n11 AS DECIMAL(38,0)) + n01)
           + (CAST(n01 AS DECIMAL(38,0)) + n00) * (CAST(n10 AS DECIMAL(38,0)) + n00)"""))
      .withColumn("num", expr(
        "nn * (CAST(n11 AS DECIMAL(38,0)) + n00) - ee"))
      .withColumn("den", expr("nn * nn - ee"))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        Exact.idiv((col("n11") + col("n00")) * 10000,
          col("n11") + col("n10") + col("n01") + col("n00"))
          .cast("long").as("po_bp"),
        expr("""CASE WHEN den = 0 THEN NULL
                     WHEN num < 0 THEN -((10000 * (-num)) div den)
                     ELSE (10000 * num) div den END""")
          .cast("long").as("kappa_bp"))
  }

  private val mlKappaSql =
    """WITH sv AS (SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
       FROM embeddings),
       ce0 AS (SELECT u.dim, u.q AS qv
               FROM sv, UNNEST(list_transform(q,
                 (x, i) -> {'dim': i - 1, 'q': x})) AS r(u)
               WHERE label = 0),
       cent0 AS (SELECT list(CAST(s // n AS BIGINT) ORDER BY dim) AS c0
                 FROM (SELECT dim, SUM(qv) AS s, COUNT(*) AS n
                       FROM ce0 GROUP BY 1)),
       ce1 AS (SELECT u.dim, u.q AS qv
               FROM sv, UNNEST(list_transform(q,
                 (x, i) -> {'dim': i - 1, 'q': x})) AS r(u)
               WHERE label = 1),
       cent1 AS (SELECT list(CAST(s // n AS BIGINT) ORDER BY dim) AS c1
                 FROM (SELECT dim, SUM(qv) AS s, COUNT(*) AS n
                       FROM ce1 GROUP BY 1)),
       ab AS (SELECT
           CASE WHEN (list_sum(list_transform(q, (x, i) -> x * c0[i]))
                      + 140737488355328) // 1073741824 >= 131090
                THEN 1 ELSE 0 END AS a,
           CASE WHEN list_sum(list_transform(q, (x, i) -> x * c0[i])) >
                     list_sum(list_transform(q, (x, i) -> x * c1[i]))
                THEN 1 ELSE 0 END AS b
         FROM sv, cent0, cent1),
       cells AS (SELECT
           CAST(SUM(a * b) AS BIGINT) AS n11,
           CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
           CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
           CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
         FROM ab),
       k AS (SELECT *,
               CAST(n11 + n10 + n01 + n00 AS HUGEINT) AS nn,
               (CAST(n11 AS HUGEINT) + n10) * (CAST(n11 AS HUGEINT) + n01)
                 + (CAST(n01 AS HUGEINT) + n00) * (CAST(n10 AS HUGEINT) + n00)
                 AS ee
             FROM cells)
       SELECT n11, n10, n01, n00,
              CAST(((n11 + n00) * 10000) // (n11 + n10 + n01 + n00)
                AS BIGINT) AS po_bp,
              CASE WHEN nn * nn - ee = 0 THEN NULL
                   WHEN nn * (CAST(n11 AS HUGEINT) + n00) - ee < 0
                   THEN CAST(-((10000 * (ee - nn * (CAST(n11 AS HUGEINT) + n00)))
                     // (nn * nn - ee)) AS BIGINT)
                   ELSE CAST((10000 * (nn * (CAST(n11 AS HUGEINT) + n00) - ee))
                     // (nn * nn - ee) AS BIGINT)
              END AS kappa_bp
       FROM k"""

  /** Decile lift/gain chart of the centroid score: embeddings ranked
    * best-score-first into 10 equal-size deciles, each graded by
    * positive rate, lift vs the global rate, and cumulative gain — the
    * model-quality report a curation classifier ships with. NO global
    * sort: the total rank decomposes as (rows with a BETTER score) +
    * (row_number WITHIN this score by vec_id) — the first term comes
    * from a cumulative window over the BOUNDED score histogram
    * (ClassifyQ header: the domain is ≤ ~2¹⁷ values at any corpus
    * size), the second from a per-score window (per-key, never
    * global). Lift/gain products ride DECIMAL(38,0)/HUGEINT so
    * corpus² · 10⁴ can't overflow; outputs are BIGINT bp. */
  private def mlLiftDeciles(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = scored(spark, d)
    val hist = s.groupBy("score").agg(count(lit(1)).as("n"))
    val wDesc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist
      .withColumn("above", coalesce(sum(col("n")).over(wDesc), lit(0L)))
      .withColumn("total", sum(col("n")).over(wAll))
      .select("score", "above", "total")
    val ranked = s.join(broadcast(cum), Seq("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("score").orderBy("vec_id")))
      .withColumn("decile",
        expr("(above + rn - 1) * 10 div total + 1"))
    val dec = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    dec
      .withColumn("cum_pos", sum(col("pos")).over(wCum).cast(D38))
      .withColumn("tot_n", sum(col("n")).over(wTot).cast(D38))
      .withColumn("tot_pos", sum(col("pos")).over(wTot).cast(D38))
      .select(col("decile").cast("long").as("decile"), col("n"), col("pos"),
        expr("pos * 10000 div n").as("pos_rate_bp"),
        floor(col("pos").cast(D38) * col("tot_n") * 10000 /
          (col("n").cast(D38) * col("tot_pos"))).cast("long").as("lift_bp"),
        floor(col("cum_pos") * 10000 / col("tot_pos")).cast("long")
          .as("cum_gain_bp"))
      .orderBy("decile")
  }

  private val mlLiftDecilesSql =
    s"""WITH $scoredSql,
       hist AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS n
                FROM scored GROUP BY 1),
       cum AS (SELECT score,
                 COALESCE(SUM(n) OVER (ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS above,
                 SUM(n) OVER () AS total
               FROM hist),
       ranked AS (SELECT y,
                    (above + ROW_NUMBER() OVER (PARTITION BY s.score
                       ORDER BY vec_id) - 1) * 10 // total + 1 AS decile
                  FROM scored s JOIN cum USING (score)),
       dec AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
               FROM ranked GROUP BY 1),
       t AS (SELECT decile, n, pos,
               CAST(SUM(pos) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS HUGEINT) AS cum_pos,
               CAST(SUM(n) OVER () AS HUGEINT) AS tot_n,
               CAST(SUM(pos) OVER () AS HUGEINT) AS tot_pos
             FROM dec)
       SELECT CAST(decile AS BIGINT) AS decile, n, pos,
              CAST(pos * 10000 // n AS BIGINT) AS pos_rate_bp,
              CAST((CAST(pos AS HUGEINT) * tot_n * 10000)
                   // (CAST(n AS HUGEINT) * tot_pos) AS BIGINT) AS lift_bp,
              CAST(cum_pos * 10000 // tot_pos AS BIGINT) AS cum_gain_bp
       FROM t ORDER BY decile"""

  /** Kolmogorov–Smirnov separation of the centroid-similarity scorer
    * ([[graft.ml.Eval.ksBp]]): max |F_pos − F_neg| over the score
    * CDFs, with the achieving threshold — the credit-scoring
    * separation dial next to `ml_auc`'s rank view (same one-shuffle
    * score histogram, two cumulative windows over it). */
  private def mlKs(spark: SparkSession, d: String): DataFrame =
    Eval.ksBp(scored(spark, d), col("score"), col("y"))

  private val mlKsSql =
    s"""WITH $scoredSql,
       h AS (SELECT score, SUM(y) AS pos, SUM(1 - y) AS neg
             FROM scored GROUP BY 1),
       w AS (SELECT score,
               CAST(SUM(pos) OVER (ORDER BY score) AS HUGEINT) AS cp,
               CAST(SUM(neg) OVER (ORDER BY score) AS HUGEINT) AS cn,
               CAST(SUM(pos) OVER () AS HUGEINT) AS p,
               CAST(SUM(neg) OVER () AS HUGEINT) AS n
             FROM h),
       d AS (SELECT score, p, n, ABS(cp * n - cn * p) AS num,
               ROW_NUMBER() OVER (ORDER BY ABS(cp * n - cn * p) DESC,
                 score ASC) AS rn
             FROM w)
       SELECT CAST(p AS BIGINT) AS pos_n, CAST(n AS BIGINT) AS neg_n,
              score AS at_score,
              CASE WHEN p = 0 OR n = 0 THEN NULL
                   ELSE CAST(num * 10000 // (p * n) AS BIGINT)
              END AS ks_bp
       FROM d WHERE rn = 1"""

  def queries: Seq[Q] = Seq(
    Q("ml_auc", mlAuc, Some(mlAucSql)),
    Q("ml_ks", mlKs, Some(mlKsSql)),
    Q("ml_lift_deciles", mlLiftDeciles, Some(mlLiftDecilesSql)),
    Q("ml_kappa", mlKappa, Some(mlKappaSql)),
    Q("ml_avg_precision", mlAvgPrecision, Some(mlAvgPrecisionSql)),
    Q("ml_calibration", mlCalibration, Some(mlCalibrationSql)),
    Q("ml_pr_curve", mlPrCurve, Some(mlPrCurveSql)),
    Q("ml_confusion", mlConfusion, Some(mlConfusionSql)),
    Q("st_spearman", stSpearman, Some(stSpearmanSql)))
}
