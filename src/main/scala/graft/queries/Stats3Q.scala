package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-9 series-diagnostics pack: a CUSUM-family mean-shift
  * changepoint locator and Kendall-tau concordance counts — the
  * "WHERE did the level move" and "do the two series move together"
  * questions next to `st_cusum_drift` (does it drift) and
  * `st_spearman` (monotone association by ranks).
  *
  * Exactness discipline as [[Stats2Q]]: cents are exact BIGINT, the
  * rational t/n is cleared by scaling with n (|n·S_t − t·S_n| is
  * integer), wide products ride DECIMAL(38,0)/HUGEINT, and the one
  * division per output is a floor division on positives — bit-identical
  * on both engines.
  *
  * Scale story: the fact-sized work is ONE partial-agg shuffle onto the
  * day key; every window and the Kendall pair join run on the
  * POST-AGGREGATION calendar-sized series (~2.4k days over the TPC-H
  * span), so the expensive stages are bounded by the CALENDAR at any
  * data volume — the `st_acf` discipline.
  */
object Stats3Q extends QueryPack {

  private val D38 = DecimalType(38, 0)

  private def daily(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("day")
      .agg(sum(col("cents")).as("total_c"),
        count(lit(1)).as("n_orders"))

  // --------------------------------------------------------- st_changepoint

  /** Single mean-shift changepoint on daily revenue: the day t
    * maximizing the scaled CUSUM departure D_t = |n·S_t − t·S_n|
    * (≡ n²·|S_t/t·(t/n) − ...| cleared of rationals — the classic
    * binary-segmentation statistic; first day wins ties). Both the
    * cumulative and the global-total windows run over the calendar-
    * sized daily series; the argmax is a second window pass on the
    * same ~2.4k rows. Output: the split day, its index, the statistic,
    * and the exact floor-divided mean level on each side. */
  private def stChangepoint(spark: SparkSession, d: String): DataFrame = {
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val c = daily(spark, d)
      .withColumn("t", row_number().over(Window.orderBy("day")))
      .withColumn("s_t", sum(col("total_c")).over(wCum).cast(D38))
      .withColumn("n", count(lit(1)).over(wAll).cast(D38))
      .withColumn("s_n", sum(col("total_c")).over(wAll).cast(D38))
      .withColumn("d_stat",
        abs(col("n") * col("s_t") - col("t").cast(D38) * col("s_n")))
    c.withColumn("rn", row_number().over(
        Window.orderBy(col("d_stat").desc, col("day").asc)))
      .filter(col("rn") === 1)
      .select(col("day").as("cp_day"),
        col("t").cast("long").as("t_idx"),
        col("n").cast("long").as("n_days"),
        // internal math is DECIMAL(38,0)/HUGEINT; the OUTPUT statistic
        // fits BIGINT through sf1 (~2.4e18 < 2^63) and narrows so both
        // engines surface the same physical type
        col("d_stat").cast("long").as("d_stat"),
        floor(col("s_t") / col("t")).cast("long").as("mean_before_c"),
        when(col("t").cast(D38) < col("n"),
          floor((col("s_n") - col("s_t")) / (col("n") - col("t"))))
          .cast("long").as("mean_after_c"))
  }

  private val stChangepointSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS total_c
            FROM orders GROUP BY 1),
       c AS (SELECT day,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS HUGEINT) AS t,
               CAST(SUM(total_c) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS HUGEINT) AS s_t,
               CAST(COUNT(*) OVER () AS HUGEINT) AS n,
               CAST(SUM(total_c) OVER () AS HUGEINT) AS s_n
             FROM daily),
       s AS (SELECT day, t, n, s_t, s_n,
               ABS(n * s_t - t * s_n) AS d_stat FROM c),
       r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY d_stat DESC, day ASC)
               AS rn FROM s)
       SELECT day AS cp_day, CAST(t AS BIGINT) AS t_idx,
              CAST(n AS BIGINT) AS n_days, CAST(d_stat AS BIGINT) AS d_stat,
              CAST(s_t // t AS BIGINT) AS mean_before_c,
              CASE WHEN t < n
                THEN CAST((s_n - s_t) // (n - t) AS BIGINT) END
                AS mean_after_c
       FROM r WHERE rn = 1"""

  // ------------------------------------------------------------- st_kendall

  /** Kendall concordance between daily revenue and daily order count:
    * every unordered day pair classified as concordant / discordant /
    * tied (x-only, y-only, both), plus tau-a in basis points
    * ((nc − nd)·10⁴ floor-div pairs — integer on both engines; tau-b's
    * sqrt denominator is left to the reader of the tie counts). The
    * pair join is |days|² ≈ 2.9M comparisons at ANY scale factor —
    * bounded by the calendar, the documented cross-join exception
    * (PlanAuditSpec) with a broadcast dim-sized side by construction. */
  private def stKendall(spark: SparkSession, d: String): DataFrame = {
    val s = daily(spark, d)
    val a = s.select(col("day"), col("total_c").as("x1"),
      col("n_orders").as("y1"))
    val b = s.select(col("day").as("day2"), col("total_c").as("x2"),
      col("n_orders").as("y2"))
    val pairs = a.crossJoin(broadcast(b)).filter(col("day") < col("day2"))
    def cnt(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L)), lit(0L))
    pairs.agg(
        count(lit(1)).as("n_pairs"),
        cnt((col("x1") < col("x2") && col("y1") < col("y2")) ||
          (col("x1") > col("x2") && col("y1") > col("y2"))).as("nc"),
        cnt((col("x1") < col("x2") && col("y1") > col("y2")) ||
          (col("x1") > col("x2") && col("y1") < col("y2"))).as("nd"),
        cnt(col("x1") === col("x2") && col("y1") =!= col("y2")).as("tie_x"),
        cnt(col("y1") === col("y2") && col("x1") =!= col("x2")).as("tie_y"),
        cnt(col("x1") === col("x2") && col("y1") === col("y2")).as("tie_xy"))
      .withColumn("tau_a_bp",
        floor((col("nc") - col("nd")) * 10000 / col("n_pairs")).cast("long"))
  }

  private val stKendallSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS x,
              CAST(COUNT(*) AS BIGINT) AS y
            FROM orders GROUP BY 1),
       p AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
             FROM daily a JOIN daily b ON a.day < b.day),
       agg AS (SELECT
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(CASE WHEN (x1 < x2 AND y1 < y2)
                  OR (x1 > x2 AND y1 > y2) THEN 1 END), 0) AS BIGINT) AS nc,
           CAST(COALESCE(SUM(CASE WHEN (x1 < x2 AND y1 > y2)
                  OR (x1 > x2 AND y1 < y2) THEN 1 END), 0) AS BIGINT) AS nd,
           CAST(COALESCE(SUM(CASE WHEN x1 = x2 AND y1 <> y2 THEN 1 END), 0)
             AS BIGINT) AS tie_x,
           CAST(COALESCE(SUM(CASE WHEN y1 = y2 AND x1 <> x2 THEN 1 END), 0)
             AS BIGINT) AS tie_y,
           CAST(COALESCE(SUM(CASE WHEN x1 = x2 AND y1 = y2 THEN 1 END), 0)
             AS BIGINT) AS tie_xy
         FROM p)
       SELECT n_pairs, nc, nd, tie_x, tie_y, tie_xy,
              CAST(FLOOR((nc - nd) * 10000.0 / n_pairs) AS BIGINT)
                AS tau_a_bp
       FROM agg"""

  // -------------------------------------------------------- st_bootstrap_ci

  private val B = 200

  /** Bootstrap 95% CI for the daily-revenue mean — 200 resamples of
    * the calendar-sized series, each drawing n days WITH replacement
    * where draw (b, i) picks index md5("bs|b|i") mod n: NO RNG, both
    * engines replay the identical resamples (the c_sample_uniform
    * md5-determinism discipline applied to resampling). The grid is
    * B·|days| ≈ 480k rows at ANY scale factor — bounded by the
    * calendar × a constant, never the fact. CI endpoints are
    * nearest-rank percentiles (rank 5 / 195 of the 200 sorted means,
    * ties broken by resample id); means are exact floor-divided
    * cents. Cross joins are the 200-row resample dim and two ONE-row
    * aggregates — PlanAuditSpec-listed scalar/dim sides. */
  private def stBootstrapCi(spark: SparkSession, d: String): DataFrame = {
    val s = daily(spark, d)
    val bs = spark.range(1, B + 1).select(col("id").as("b"))
    val idx = s
      .withColumn("rn", row_number().over(Window.orderBy("day")))
      .withColumn("n", count(lit(1)).over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val grid = idx.select("rn", "n").crossJoin(broadcast(bs))
      .withColumn("pick",
        pmod(conv(substring(md5(concat_ws("|", lit("bs"),
            col("b").cast("string"), col("rn").cast("string"))), 1, 8),
          16, 10).cast("long"), col("n")) + 1)
    val means = grid
      .join(idx.select(col("rn").as("pick"), col("total_c")), Seq("pick"))
      .groupBy("b")
      .agg(expr("sum(total_c) div count(1)").as("mean_c"))
    val ranked = means.withColumn("rk",
      row_number().over(Window.orderBy(col("mean_c"), col("b"))))
    val lo = ranked.filter(col("rk") === 5)
      .select(col("mean_c").as("ci_lo_c"))
    val hi = ranked.filter(col("rk") === B - 5)
      .select(col("mean_c").as("ci_hi_c"))
    val full = s.agg(count(lit(1)).as("n_days"),
      expr("sum(total_c) div count(1)").as("mean_c"))
    full.crossJoin(lo).crossJoin(hi)
      .withColumn("n_boot", lit(B.toLong))
      .select("n_days", "n_boot", "mean_c", "ci_lo_c", "ci_hi_c")
  }

  private val stBootstrapCiSql =
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS total_c
            FROM orders GROUP BY 1),
       idx AS (SELECT total_c, ROW_NUMBER() OVER (ORDER BY day) AS rn,
                 COUNT(*) OVER () AS n
               FROM daily),
       bs AS (SELECT UNNEST(range(1, ${B + 1})) AS b),
       grid AS (SELECT bs.b, i.rn,
                  (('0x' || substr(md5('bs|' || CAST(bs.b AS VARCHAR)
                      || '|' || CAST(i.rn AS VARCHAR)), 1, 8))::BIGINT
                   % i.n) + 1 AS pick
                FROM bs, idx i),
       means AS (SELECT b,
                   CAST(SUM(d.total_c) // COUNT(*) AS BIGINT) AS mean_c
                 FROM grid g JOIN idx d ON g.pick = d.rn GROUP BY 1),
       r AS (SELECT mean_c,
               ROW_NUMBER() OVER (ORDER BY mean_c, b) AS rk FROM means),
       f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(total_c) // COUNT(*) AS BIGINT) AS mean_c
             FROM daily)
       SELECT n_days, CAST($B AS BIGINT) AS n_boot, f.mean_c,
              lo.mean_c AS ci_lo_c, hi.mean_c AS ci_hi_c
       FROM f, (SELECT mean_c FROM r WHERE rk = 5) lo,
            (SELECT mean_c FROM r WHERE rk = ${B - 5}) hi"""

  // --------------------------------------------------------------- st_gini

  /** Spend concentration: the exact Gini coefficient and the top-10%
    * share of per-customer total spend (whole dollars) — the 80/20
    * audit. NO global sort over customers: ranks decompose over the
    * spend-VALUE histogram (cumulative windows over distinct dollar
    * amounts — bounded by the VALUE RANGE, ≤ ~10⁶ rows, not by
    * |customers|; the sk_qhist value-domain discipline). Ties are
    * exact: a value group's rank-weight is n_k·below + n_k(n_k+1)/2
    * (any within-tie order gives the same sum), and the top-k cut
    * takes a straddling group pro-rata in integer arithmetic.
    * G = (2W − (n+1)S) / (nS) with W = Σ v·rank — numerator is
    * provably ≥ 0, so floor-vs-truncate division agrees; wide products
    * ride DECIMAL(38,0)/HUGEINT. */
  private def stGini(spark: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(spark, d)
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("o_custkey")
      .agg(expr("sum(cents) div 100").as("dollars"))
    val hist = spend.groupBy("dollars").agg(count(lit(1)).as("nk"))
    val wAsc = Window.orderBy(col("dollars").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wDesc = Window.orderBy(col("dollars").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("dollars").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val t = hist
      .withColumn("below", coalesce(sum(col("nk")).over(wAsc), lit(0L)))
      .withColumn("taken", coalesce(sum(col("nk")).over(wDesc), lit(0L)))
      .withColumn("n", sum(col("nk")).over(wAll))
      .withColumn("s",
        sum(col("dollars").cast(D38) * col("nk")).over(wAll))
      .withColumn("k", expr("n div 10"))
    val parts = t.select(
      col("n"), col("s"),
      (col("dollars").cast(D38) *
        (col("nk").cast(D38) * col("below") +
          floor(col("nk").cast(D38) * (col("nk").cast(D38) + 1) / 2)))
        .as("wpart"),
      (col("dollars").cast(D38) *
        greatest(lit(0L),
          least(col("nk"), col("k") - col("taken"))).cast(D38))
        .as("toppart"))
    parts.agg(max(col("n")).as("n"), max(col("s")).as("s"),
        sum(col("wpart")).as("w"), sum(col("toppart")).as("t10"))
      .select(col("n").cast("long").as("n_cust"),
        col("s").cast("long").as("total_dollars"),
        floor((lit(2).cast(D38) * col("w") -
            (col("n").cast(D38) + 1) * col("s")) * 10000 /
          (col("n").cast(D38) * col("s"))).cast("long").as("gini_bp"),
        floor(col("t10") * 10000 / col("s")).cast("long")
          .as("top10_share_bp"))
  }

  private val stGiniSql =
    """WITH spend AS (SELECT o_custkey,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) // 100
                AS BIGINT) AS dollars
            FROM orders GROUP BY 1),
       hist AS (SELECT dollars, CAST(COUNT(*) AS BIGINT) AS nk
                FROM spend GROUP BY 1),
       t AS (SELECT dollars, nk,
               COALESCE(SUM(nk) OVER (ORDER BY dollars ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS below,
               COALESCE(SUM(nk) OVER (ORDER BY dollars DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS taken,
               CAST(SUM(nk) OVER () AS HUGEINT) AS n,
               CAST(SUM(CAST(dollars AS HUGEINT) * nk) OVER () AS HUGEINT)
                 AS s
             FROM hist),
       parts AS (SELECT n, s,
               CAST(dollars AS HUGEINT) *
                 (CAST(nk AS HUGEINT) * below
                  + (CAST(nk AS HUGEINT) * (nk + 1)) // 2) AS wpart,
               CAST(dollars AS HUGEINT) *
                 GREATEST(0, LEAST(nk, (n // 10) - taken)) AS toppart
             FROM t),
       agg AS (SELECT MAX(n) AS n, MAX(s) AS s, SUM(wpart) AS w,
                 SUM(toppart) AS t10
               FROM parts)
       SELECT CAST(n AS BIGINT) AS n_cust, CAST(s AS BIGINT)
                AS total_dollars,
              CAST((2 * w - (n + 1) * s) * 10000 // (n * s) AS BIGINT)
                AS gini_bp,
              CAST(t10 * 10000 // s AS BIGINT) AS top10_share_bp
       FROM agg"""

  def queries: Seq[Q] = Seq(
    Q("st_changepoint", stChangepoint, Some(stChangepointSql)),
    Q("st_kendall", stKendall, Some(stKendallSql)),
    Q("st_bootstrap_ci", stBootstrapCi, Some(stBootstrapCiSql)),
    Q("st_gini", stGini, Some(stGiniSql)))
}
