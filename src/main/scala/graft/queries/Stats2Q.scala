package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.Stats

/** Round-9 time-series statistics pack: lag-k autocorrelation and the
  * Theil–Sen robust trend — the two classical diagnostics missing from
  * the monitor family (`st_runs_test` tests exchangeability, `st_acf`
  * measures HOW the series remembers; `st_ols_trend` fits a trend,
  * `st_theil_sen` fits one a third of the data being garbage can't
  * move).
  *
  * Exactness discipline as [[StatsQ]] / [[graft.ml.Stats]]: every
  * moment is an exact integer (cents), mean-centering is cleared of
  * rationals by scaling with n (n·x − S is integer when x̄ = S/n is
  * not), and the single division per output value is a sign-safe
  * integer floor division — bit-identical on both engines at any
  * partitioning.
  *
  * Scale story: both operate on POST-AGGREGATION calendar-sized series
  * (|days| ≈ 2.4 k, |months| ≈ 84 over the TPC-H date span) — the
  * relation the global window / pair join touches grows with the
  * CALENDAR, not the data volume, so the plans are unchanged at 100 TB
  * (the `st_runs_test` / `w2_rolling` scale story). The fact-sized work
  * is one partial-agg shuffle onto the day (resp. month) key.
  */
object Stats2Q extends QueryPack {

  private val MaxLag = 7

  // ------------------------------------------------------------------ st_acf

  /** Sample autocorrelation of daily order revenue at lags 1..7, in
    * basis points. r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)² with every
    * term scaled by n² so it stays integer:
    * num_k = Σ (n·x_t − S)(n·x_{t−k} − S), den = Σ (n·x_t − S)².
    * One |days| window pass materializes all 7 lag columns, ONE
    * aggregate produces all 7 numerators + the denominator, and
    * `stack` unpivots to 7 rows — the whole post-agg stage is 3 plans
    * over a calendar-sized relation. DECIMAL(38,0) throughout: at
    * sf0.1 the deviations are ~10¹² so squares are ~10²⁴, and the
    * 10⁴-scaled sums stay far under the 38-digit cap (headroom to
    * ~10³ × the sf1 daily mass; past that drop the bp scaling first).
    * A weekly echo in the ACF (lag-7 spike) is the signature the
    * seasonal index (`g_seasonal_idx`) quantifies. */
  private def daily(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(to_date(col("o_orderdate")).as("day"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("day").agg(sum(col("cents")).as("total_c"))

  private def stAcf(spark: SparkSession, d: String): DataFrame =
    Stats.acfBp(daily(spark, d), col("day"), col("total_c"), MaxLag)

  /** The ACF computation as a reusable CTE chain ending in
    * `acfv(lag, n_pairs, acf_bp)` — shared by the `st_acf` oracle and
    * the `st_pacf` recursion that consumes it. */
  private val acfCtes = {
    val lags = (1 to MaxLag)
    s"""daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS total_c
            FROM orders GROUP BY 1),
       t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                    CAST(SUM(total_c) AS HUGEINT) AS s FROM daily),
       l AS (SELECT total_c,
                    ${lags.map(k => s"LAG(total_c, $k) OVER w AS x$k")
                      .mkString(", ")}
             FROM daily WINDOW w AS (ORDER BY day)),
       dv AS (SELECT n * total_c - s AS dev,
                     ${lags.map(k => s"n * x$k - s AS d$k").mkString(", ")}
              FROM l, t),
       a AS (SELECT SUM(dev * dev) AS den,
                    ${lags.map(k =>
                      s"SUM(dev * d$k) AS num$k, COUNT(d$k) AS np$k")
                      .mkString(", ")}
             FROM dv),
       acfv AS (SELECT lag, n_pairs, acf_bp FROM (
         ${lags.map(k =>
           s"""SELECT CAST($k AS BIGINT) AS lag,
                      CAST(np$k AS BIGINT) AS n_pairs,
                      CAST(CASE WHEN den = 0 THEN NULL
                                WHEN num$k < 0
                                THEN -((10000 * (-num$k)) // den)
                                ELSE (10000 * num$k) // den END AS BIGINT)
                        AS acf_bp
               FROM a""").mkString(" UNION ALL ")}))"""
  }

  private val stAcfSql =
    s"""WITH $acfCtes
       SELECT lag, n_pairs, acf_bp FROM acfv ORDER BY lag"""

  // ------------------------------------------------------------ st_theil_sen

  /** Theil–Sen slope of monthly order revenue on the month index, in
    * basis points (cents per month), beside the OLS slope from the
    * SAME series so the robustness gap is one subtraction. The
    * estimator is the LOWER MEDIAN over all C(|months|, 2) pairwise
    * slopes — each slope an integer-bp floor division, the median an
    * exact rank pick with a (slope, ym_a, ym_b) total order, so no
    * float ever appears. The pair join is a theta self-join on the
    * |months| ≈ 84-row aggregate (≈ 3.5 k pairs) — calendar-bounded at
    * ANY data volume, which is what makes the O(n²) estimator, usually
    * the textbook scaling objection, a constant-cost plan here
    * (PlanAuditSpec carries the documented exception). */
  private def stTheilSen(spark: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(spark, d)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("ym").agg(sum(col("cents")).as("total_c"))
    val med = Stats.theilSenBp(monthly, col("ym"), col("total_c"))
    val ols = Stats.olsSlopeBp(monthly, Seq.empty, col("ym"), col("total_c"))
      .select(col("n").as("n_months"), col("slope_bp").as("ols_slope_bp"))
    ols.crossJoin(med)
      .select("n_months", "n_pairs", "ts_slope_bp", "ols_slope_bp")
  }

  private val stTheilSenSql =
    """WITH monthly AS (SELECT
              CAST(YEAR(CAST(o_orderdate AS DATE)) * 12
                   + MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) AS ym,
              CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                AS total_c
            FROM orders GROUP BY 1),
       sl AS (SELECT a.ym AS ym_a, b.ym AS ym_b,
                     CASE WHEN b.total_c - a.total_c < 0
                          THEN -((10000 * (a.total_c - b.total_c))
                                 // (b.ym - a.ym))
                          ELSE (10000 * (b.total_c - a.total_c))
                               // (b.ym - a.ym) END AS slope_bp
              FROM monthly a JOIN monthly b ON a.ym < b.ym),
       r AS (SELECT slope_bp,
                    ROW_NUMBER() OVER (ORDER BY slope_bp, ym_a, ym_b) AS rn,
                    CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
             FROM sl),
       ts AS (SELECT CAST(slope_bp AS BIGINT) AS ts_slope_bp, n_pairs
              FROM r WHERE rn = (n_pairs + 1) // 2),
       m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
                    SUM(CAST(ym AS HUGEINT)) AS sx,
                    SUM(CAST(total_c AS HUGEINT)) AS sy,
                    SUM(CAST(ym AS HUGEINT) * total_c) AS sxy,
                    SUM(CAST(ym AS HUGEINT) * ym) AS sxx
             FROM monthly),
       o AS (SELECT n_months,
                    CAST(n_months AS HUGEINT) * sxy - sx * sy AS num,
                    CAST(n_months AS HUGEINT) * sxx - sx * sx AS den
             FROM m)
       SELECT n_months, n_pairs, ts_slope_bp,
              CAST(CASE WHEN den = 0 THEN NULL
                        WHEN num < 0 THEN -((10000 * (-num)) // den)
                        ELSE (10000 * num) // den END AS BIGINT)
                AS ols_slope_bp
       FROM o, ts"""

  // --------------------------------------------------------------- st_pacf

  /** Partial autocorrelation at lags 1..7 by the fixed-point
    * Durbin–Levinson recursion ([[graft.ml.Stats.pacfBp]]) over the
    * SAME daily-revenue ACF as `st_acf` — the second Box–Jenkins
    * identification plot (ACF tails off while PACF cuts off at p ⇒
    * AR(p); a lag-7 PACF spike that survives the lag-1 partialling-out
    * is weekly seasonality proper, not echo). The recursion runs on
    * ONE row over the 7-lag vector; the oracle is a recursive CTE
    * carrying the φ list with the same sign-safe floors. */
  private def stPacf(spark: SparkSession, d: String): DataFrame =
    Stats.pacfBp(
      Stats.acfBp(daily(spark, d), col("day"), col("total_c"), MaxLag),
      MaxLag)

  private val stPacfSql = {
    // sign-safe floor: a − ((a % b + b) % b) is exactly divisible
    def fd(a: String, b: String) =
      s"((($a) - ((($a) % ($b) + ($b)) % ($b))) // ($b))"
    val nums = fd("list_sum(list_transform(range(1, k + 1), " +
      "j -> phi[j] * rho[k + 1 - j]))", "10000")
    val dens = fd("list_sum(list_transform(range(1, k + 1), " +
      "j -> phi[j] * rho[j]))", "10000")
    s"""WITH RECURSIVE $acfCtes,
       rh AS (SELECT list(acf_bp ORDER BY lag) AS rho FROM acfv),
       pac AS (
         SELECT CAST(1 AS BIGINT) AS k, [rho[1]] AS phi, rho FROM rh
         UNION ALL
         SELECT k + 1,
                list_append(
                  list_transform(range(1, k + 1),
                    j -> phi[j] - ${fd("pkk * phi[k + 1 - j]", "10000")}),
                  pkk),
                rho
         FROM (
           SELECT k, phi, rho,
                  CASE WHEN (10000 - $dens) <= 0 THEN CAST(0 AS BIGINT)
                       ELSE ${fd(s"(rho[k + 1] - $nums) * 10000",
                                 s"10000 - $dens")}
                  END AS pkk
           FROM pac WHERE k < $MaxLag)),
       px AS (SELECT k AS lag, phi[k] AS pacf_bp FROM pac)
       SELECT a.lag, a.acf_bp, CAST(px.pacf_bp AS BIGINT) AS pacf_bp
       FROM acfv a JOIN px USING (lag) ORDER BY lag"""
  }

  // ----------------------------------------------------------- st_ljung_box

  /** Ljung–Box portmanteau whiteness test over the same 7-lag ACF:
    * Q = n(n+2) Σ_k ρ_k²/(n−k), here in exact fixed point (per-lag
    * floor term_k = ⌊acf_bp_k² / n_pairs_k⌋ — n_pairs IS n−k — then
    * one global floor to milli units), against the hardcoded χ²₇ 95%
    * critical value 14.067. Q ≫ crit on this series is the expected
    * verdict (daily revenue has real autocorrelation — `st_acf`'s
    * weekly echo); the test earns its keep on residual series after a
    * model fit. One more 1-row reduction over the calendar-sized
    * relation — all nonnegative, so `div`/`//` agree without the
    * sign-safe dance. */
  private def stLjungBox(spark: SparkSession, d: String): DataFrame =
    Stats.acfBp(daily(spark, d), col("day"), col("total_c"), MaxLag)
      .agg(max(col("n_pairs")).as("np1"),
        sum(expr("(acf_bp * acf_bp) div n_pairs")).as("terms"))
      .select((col("np1") + 1).as("n_days"),
        lit(MaxLag.toLong).as("df"),
        expr("((np1 + 1) * (np1 + 3) * terms * 1000) div 100000000")
          .as("q_milli"),
        lit(14067L).as("crit95_milli"),
        expr("CAST(CASE WHEN ((np1 + 1) * (np1 + 3) * terms * 1000)" +
          " div 100000000 > 14067 THEN 1 ELSE 0 END AS BIGINT)")
          .as("reject"))

  private val stLjungBoxSql =
    s"""WITH $acfCtes,
       s AS (SELECT MAX(n_pairs) AS np1,
                    SUM((acf_bp * acf_bp) // n_pairs) AS terms
             FROM acfv)
       SELECT CAST(np1 + 1 AS BIGINT) AS n_days,
              CAST($MaxLag AS BIGINT) AS df,
              CAST(((np1 + 1) * (np1 + 3) * terms * 1000) // 100000000
                AS BIGINT) AS q_milli,
              CAST(14067 AS BIGINT) AS crit95_milli,
              CAST(CASE WHEN ((np1 + 1) * (np1 + 3) * terms * 1000)
                     // 100000000 > 14067
                   THEN 1 ELSE 0 END AS BIGINT) AS reject
       FROM s"""

  def queries: Seq[Q] = Seq(
    Q("st_acf", stAcf, Some(stAcfSql)),
    Q("st_pacf", stPacf, Some(stPacfSql)),
    Q("st_ljung_box", stLjungBox, Some(stLjungBoxSql)),
    Q("st_theil_sen", stTheilSen, Some(stTheilSenSql)))
}
