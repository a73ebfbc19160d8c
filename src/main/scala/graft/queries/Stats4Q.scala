package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 forecasting pack: Holt's linear (double-exponential)
  * smoothing over the monthly revenue series, with its own one-step
  * in-sample backtest against the naive last-value forecaster — the
  * level+trend forecaster that `st_ols_trend` (one global line) and
  * `e_ewma` (level only) bracket.
  *
  * Exactness discipline: the recurrence runs in integer cents with
  * EXPLICIT floor division F(a,k) = (a − pmod(a,k)) div k — pmod is
  * nonnegative, so the subtraction makes the numerator exactly
  * divisible and `div` returns the true floor for either sign,
  * matching DuckDB's `//` exactly (the sign-safe discipline the
  * truncating `div` alone would break on negative trends).
  *
  * Scale story: the fact collapses to the |months| ≈ 84 calendar
  * series in ONE partial-agg shuffle; the fold runs once over that
  * array on one row (the st_acf post-agg contract) and the oracle
  * replays it as a recursive CTE, row for row.
  */
object Stats4Q extends QueryPack {

  private val Horizon = 6

  /** Holt's linear smoothing, α = 1/5, β = 1/10, classical init
    * (l₁ = x₁, b₁ = x₂ − x₁):
    *
    *   l_t = F(x_t + 4·(l_{t−1} + b_{t−1}), 5)
    *   b_t = F(l_t − l_{t−1} + 9·b_{t−1}, 10)
    *
    * The fold state also carries both backtest accumulators: the Holt
    * one-step error Σ|x_t − (l_{t−1}+b_{t−1})| and the naive error
    * Σ|x_t − x_{t−1}| over the same t = 3..n — t = 2 is EXCLUDED from
    * both, because the classical init b₁ = x₂ − x₁ makes the t = 2
    * Holt forecast exactly x₂ (a zero error by construction) while the
    * naive forecaster pays |x₂ − x₁|; scoring it would bias the
    * comparison in Holt's favor. Mechanically the t = 2 Holt term is
    * already 0, so only the naive accumulator starts at −|x₂ − x₁| and
    * both MAEs divide by n − 2. The query reports whether the smoother
    * actually beats carry-forward on this series (holt_mae_c vs
    * naive_mae_c). Output: one row per horizon h = 1..6 with
    * forecast_c = l_n + h·b_n. */
  private def stHolt(spark: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(spark, d)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("mon").agg(sum(col("cents")).as("x"))
    // F(a, k): exact floor division for either sign (pmod ≥ 0)
    def f(a: String, k: Int) = s"(($a) - pmod($a, $k)) div $k"
    val lNew = f("x.x + 4 * (acc.l + acc.b)", 5)
    val fold = monthly.agg(
      array_sort(collect_list(struct(col("mon"), col("x")))).as("ms"))
      .select(expr(
        s"""aggregate(
              slice(ms, 2, size(ms) - 1),
              named_struct(
                'l',  ms[0].x,
                'b',  ms[1].x - ms[0].x,
                'xp', ms[0].x,
                'eh', CAST(0 AS BIGINT),
                'en', -abs(ms[1].x - ms[0].x)),
              (acc, x) -> named_struct(
                'l',  $lNew,
                'b',  ${f(s"($lNew) - acc.l + 9 * acc.b", 10)},
                'xp', x.x,
                'eh', acc.eh + abs(x.x - (acc.l + acc.b)),
                'en', acc.en + abs(x.x - acc.xp))
            )""").as("st"),
        expr("size(ms)").as("n"))
    fold
      .select(col("n"), col("st.l").as("l"), col("st.b").as("b"),
        col("st.eh").as("eh"), col("st.en").as("en"),
        explode(sequence(lit(1L), lit(Horizon.toLong))).as("h"))
      .select(col("h"),
        (col("l") + col("h") * col("b")).as("forecast_c"),
        col("l").as("level_c"), col("b").as("trend_c"),
        // n = 2 (the shortest foldable series) has ZERO scored backtest
        // points — the MAEs are undefined, not infinite: guard to null
        // (mirrored by CASE WHEN in the oracle) instead of dividing by 0.
        expr("CASE WHEN n > 2 THEN (eh - pmod(eh, n - 2)) div (n - 2) END")
          .as("holt_mae_c"),
        expr("CASE WHEN n > 2 THEN (en - pmod(en, n - 2)) div (n - 2) END")
          .as("naive_mae_c"))
  }

  // DuckDB's `//` TRUNCATES toward zero on negatives (−7//2 = −3), so
  // the oracle floors explicitly: fdiv(a,k) = (a − ((a%k + k)%k)) // k.
  // The b-update would need l_new twice; instead its numerator is
  // scaled by 5 (bnum5 = 5·l_new − 5·l + 45·b with 5·l_new = lnum −
  // pmod(lnum,5)) and floored by 50 — same floor, one pass.
  private val stHoltSql =
    s"""WITH RECURSIVE monthly AS (
         SELECT date_trunc('month', o_orderdate) AS mon,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS x
         FROM orders GROUP BY 1),
       m AS (SELECT ROW_NUMBER() OVER (ORDER BY mon) AS rn, x FROM monthly),
       nn AS (SELECT CAST(MAX(rn) AS BIGINT) AS n FROM m),
       hw AS (
         SELECT CAST(1 AS BIGINT) AS t,
                m1.x AS l, m2.x - m1.x AS b, m1.x AS xp,
                CAST(0 AS BIGINT) AS eh,
                CAST(-abs(m2.x - m1.x) AS BIGINT) AS en
         FROM (SELECT x FROM m WHERE rn = 1) m1,
              (SELECT x FROM m WHERE rn = 2) m2
         UNION ALL
         SELECT t,
                (lnum - ((lnum % 5 + 5) % 5)) // 5,
                (bnum5 - ((bnum5 % 50 + 50) % 50)) // 50,
                xx, eh2, en2
         FROM (
           SELECT t + 1 AS t,
                  mx.x + 4 * (l + b) AS lnum,
                  (mx.x + 4 * (l + b))
                    - ((mx.x + 4 * (l + b)) % 5 + 5) % 5
                    - 5 * l + 45 * b AS bnum5,
                  mx.x AS xx,
                  eh + abs(mx.x - (l + b)) AS eh2,
                  en + abs(mx.x - xp) AS en2
           FROM hw JOIN m mx ON mx.rn = t + 1)),
       fin AS (SELECT l, b, eh, en, n FROM hw JOIN nn ON hw.t = nn.n)
       SELECT CAST(h AS BIGINT) AS h,
              CAST(l + h * b AS BIGINT) AS forecast_c,
              l AS level_c, b AS trend_c,
              CAST(CASE WHEN n > 2 THEN eh // (n - 2) END AS BIGINT)
                AS holt_mae_c,
              CAST(CASE WHEN n > 2 THEN en // (n - 2) END AS BIGINT)
                AS naive_mae_c
       FROM fin CROSS JOIN range(1, ${Horizon + 1}) r(h)"""

  // ----------------------------------------------------------- e_km_survival

  /** Kaplan–Meier error-free survival: per user, days from their first
    * event to their FIRST 'error' event; users who never error are
    * right-censored at their observed span (obs_end − first day) — the
    * rows a naive "mean time to failure" either drops or corrupts, and
    * exactly what the KM estimator handles. Per event day t (deaths
    * d_t, censored c_t, at-risk n_t):
    *
    *   S_bp(t) = ⌊S_bp(t−1) · (n_t − d_t) / n_t⌋   (death days only)
    *   n_{t+1} = n_t − d_t − c_t
    *
    * — the per-step bp floor makes the sequential product exact and
    * replayable (numerators are nonnegative, so truncating div IS the
    * floor in both engines). The fact collapses to per-user
    * (first event, first error) in one shuffle, then to the
    * |distinct days|-sized (d, c) table the fold runs over on ONE row;
    * the observation end is a 1-row aggregate cross-joined in
    * (PlanAuditSpec-listed). Output: one row per day-offset with
    * at_risk, deaths, censored, surv_bp — the declining reliability
    * curve. */
  private def eKmSurvival(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.canonEventTs(Tables.events(spark, d))
      .select(col("user_id"), col("event_type"),
        col("ts").cast("date").as("day"))
    val per = ev.groupBy("user_id")
      .agg(min(col("day")).as("first_day"),
        min(when(col("event_type") === "error", col("day"))).as("err_day"))
    val ends = ev.agg(max(col("day")).as("obs_end"))
    val weekly = per.crossJoin(broadcast(ends))
      .select(
        when(col("err_day").isNotNull,
          expr("CAST(datediff(err_day, first_day) AS BIGINT)"))
          .otherwise(expr("CAST(datediff(obs_end, first_day) AS BIGINT)"))
          .as("day"),
        when(col("err_day").isNull, 1L).otherwise(0L).as("cen"))
      .groupBy("day")
      .agg(sum(lit(1L) - col("cen")).as("d"), sum(col("cen")).as("c"))
    val sNew = """CASE WHEN x.d > 0
                  THEN (acc.s * (acc.n - x.d)) div acc.n
                  ELSE acc.s END"""
    weekly
      .groupBy()
      .agg(array_sort(collect_list(struct(col("day"), col("d"), col("c"))))
          .as("ws"),
        sum(col("d") + col("c")).as("total"))
      .select(explode(expr(
        s"""aggregate(
              ws,
              named_struct(
                'n', total, 's', CAST(10000 AS BIGINT),
                'out', CAST(array() AS
                  ARRAY<STRUCT<day: BIGINT, at_risk: BIGINT,
                    deaths: BIGINT, censored: BIGINT, surv_bp: BIGINT>>)),
              (acc, x) -> named_struct(
                'n', acc.n - x.d - x.c,
                's', $sNew,
                'out', concat(acc.out, array(named_struct(
                  'day', x.day, 'at_risk', acc.n, 'deaths', x.d,
                  'censored', x.c, 'surv_bp', $sNew)))),
              acc -> acc.out)""").as("r")))
      .select(col("col.day").as("day"), col("col.at_risk").as("at_risk"),
        col("col.deaths").as("deaths"), col("col.censored").as("censored"),
        col("col.surv_bp").as("surv_bp"))
  }

  private val eKmSurvivalSql =
    """WITH RECURSIVE per AS (
         SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
                MIN(CASE WHEN event_type = 'error'
                         THEN CAST(ts AS DATE) END) AS e
         FROM events GROUP BY 1),
       oe AS (SELECT MAX(CAST(ts AS DATE)) AS obs_end FROM events),
       lab AS (SELECT CASE WHEN e IS NOT NULL
                        THEN CAST(datediff('day', f, e) AS BIGINT)
                        ELSE CAST(datediff('day', f, obs_end) AS BIGINT)
                      END AS day,
                 CASE WHEN e IS NULL
                      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                 END AS cen
               FROM per, oe),
       wk AS (SELECT day, SUM(1 - cen) AS d, SUM(cen) AS c
              FROM lab GROUP BY 1),
       idx AS (SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn, day, d, c
               FROM wk),
       tot AS (SELECT CAST(SUM(d + c) AS BIGINT) AS t FROM idx),
       km AS (
         SELECT CAST(0 AS BIGINT) AS rn, t AS n,
                CAST(10000 AS BIGINT) AS s,
                CAST(NULL AS BIGINT) AS day, CAST(0 AS BIGINT) AS d,
                CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS at_risk
         FROM tot
         UNION ALL
         SELECT i.rn, km.n - i.d - i.c,
                CASE WHEN i.d > 0
                     THEN (km.s * (km.n - i.d)) // km.n ELSE km.s END,
                i.day, i.d, i.c, km.n
         FROM km JOIN idx i ON i.rn = km.rn + 1)
       SELECT day, at_risk, d AS deaths, c AS censored, s AS surv_bp
       FROM km WHERE rn >= 1"""

  // --------------------------------------------------------------- e_islands

  /** Gaps-and-islands: per user, maximal runs of CONSECUTIVE active
    * days (a missed day ends the streak), summarized as the streak
    * histogram (length → how many islands, how many distinct users) —
    * the classic SQL islands idiom via the day-index-minus-row-number
    * anchor: within a user, consecutive days share
    * di − row_number() (both step by 1), so one partitioned window +
    * one groupBy finds every island with no self-join. The engagement
    * complement of `g_gapfill` (which fills the gaps; this measures
    * the islands between them). All windows are partitioned by user —
    * no global sort at any scale; the histogram is |distinct lengths|
    * rows. */
  private def eIslands(spark: SparkSession, d: String): DataFrame = {
    val days = Tables.canonEventTs(Tables.events(spark, d))
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    days
      .withColumn("di", expr("CAST(datediff(day, DATE '1970-01-01') AS BIGINT)"))
      .withColumn("anchor", col("di") - row_number().over(w))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("streak_len"))
      .groupBy("streak_len")
      .agg(count(lit(1)).as("n_islands"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("streak_len")
  }

  private val eIslandsSql =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events),
       a AS (SELECT user_id,
               CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT)
                 - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                 AS anchor
             FROM days),
       isl AS (SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT)
                 AS streak_len
               FROM a GROUP BY 1, 2)
       SELECT streak_len, CAST(COUNT(*) AS BIGINT) AS n_islands,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM isl GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- e_dau_mau

  /** DAU / WAU / MAU and stickiness (DAU/MAU in bp) per observed day —
    * the product-analytics headline ratios, exact: every distinct
    * (day, user) pair is exploded to the ≤ 30 trailing-window
    * endpoints it covers (i = 0 → DAU, i ≤ 6 → WAU, i ≤ 29 → MAU) and
    * each endpoint deduplicates users once. The explode is ×30 of the
    * DISTINCT (day, user) table — bounded by activity, not by events —
    * and endpoints join back to observed days only. At 100 TB the
    * exact 30× explode is the cost ceiling; `sk_hll_window`
    * demonstrates the register-merge path that replaces it with
    * |days|·m state when ±2% is acceptable. */
  private def eDauMau(spark: SparkSession, d: String): DataFrame = {
    val du = Tables.canonEventTs(Tables.events(spark, d))
      .select(col("ts").cast("date").as("day0"), col("user_id"))
      .distinct()
    val days = du.select(col("day0").as("day")).distinct()
    du.select(col("day0"), col("user_id"),
        explode(sequence(lit(0), lit(29))).as("i"))
      .select(expr("date_add(day0, i)").as("day"), col("user_id"), col("i"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day")
      .agg(
        countDistinct(when(col("i") === 0, col("user_id"))).as("dau"),
        countDistinct(when(col("i") <= 6, col("user_id"))).as("wau"),
        countDistinct(col("user_id")).as("mau"))
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("(dau * 10000) div mau").as("stickiness_bp"))
      .orderBy("day")
  }

  private val eDauMauSql =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day0, user_id
            FROM events),
       days AS (SELECT DISTINCT day0 AS day FROM du),
       ex AS (SELECT du.day0 + CAST(i AS INT) AS day, user_id, i
              FROM du CROSS JOIN range(0, 30) r(i)),
       w AS (SELECT ex.day, user_id, i FROM ex
             JOIN days ON ex.day = days.day)
       SELECT day,
              CAST(COUNT(DISTINCT CASE WHEN i = 0 THEN user_id END)
                AS BIGINT) AS dau,
              CAST(COUNT(DISTINCT CASE WHEN i <= 6 THEN user_id END)
                AS BIGINT) AS wau,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau,
              CAST((COUNT(DISTINCT CASE WHEN i = 0 THEN user_id END)
                * 10000) // COUNT(DISTINCT user_id) AS BIGINT)
                AS stickiness_bp
       FROM w GROUP BY 1 ORDER BY 1"""

  // ------------------------------------------------------------ st_decompose

  /** Classical additive seasonal decomposition of monthly revenue
    * (the ratio-to-moving-average method, additive form — the
    * pre-STL textbook standard): trend = centered 2×12 moving average
    * ⌊(x_{t−6} + 2Σ_{t−5..t+5} + x_{t+6})/24⌋; seasonal = per
    * month-of-year mean of the detrended series, re-centered so the
    * twelve effects sum to ~0 (both floors); residual = x − trend −
    * seasonal. The first/last 6 months have no centered trend and
    * surface NULLs — honest edges, not extrapolation. Every window
    * runs on the |months| ≈ 84 calendar series (the st_acf post-agg
    * contract); month-of-year means are a 12-row aggregate. Where
    * `g_seasonal_idx` fits a multiplicative month index directly,
    * this separates trend from season first — the decomposition the
    * residual-based monitors want as input. */
  private def stDecompose(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("ym")
    val monthly = Tables.orders(spark, d)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        month(col("o_orderdate")).cast("long").as("moy"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("ym", "moy").agg(sum(col("cents")).as("x"))
    val trended = monthly
      .withColumn("xm6", lag(col("x"), 6).over(w))
      .withColumn("xp6", lead(col("x"), 6).over(w))
      .withColumn("mid", sum(col("x")).over(w.rowsBetween(-5, 5)))
      .withColumn("n_mid", count(col("x")).over(w.rowsBetween(-5, 5)))
      .withColumn("trend_c",
        when(col("xm6").isNotNull && col("xp6").isNotNull &&
          col("n_mid") === 11,
          expr("(xm6 + 2 * mid + xp6) div 24")))
      .withColumn("detr", col("x") - col("trend_c"))
    val seasoned = trended
      .withColumn("s_raw",
        expr("sum(detr) OVER (PARTITION BY moy) div " +
          "count(detr) OVER (PARTITION BY moy)"))
      .withColumn("s_mean",
        // mean of the 12 per-month effects: aggregate the DISTINCT
        // (moy, s_raw) pairs, not the month rows
        expr("""aggregate(array_distinct(
                  collect_list(named_struct('m', moy, 's', s_raw))
                    OVER (PARTITION BY 1)),
                CAST(0 AS BIGINT), (a, p) -> a + p.s,
                a -> a div 12)"""))
      .withColumn("seasonal_c", col("s_raw") - col("s_mean"))
    seasoned
      .select(col("ym"), col("x").as("revenue_c"), col("trend_c"),
        col("seasonal_c"),
        (col("x") - col("trend_c") - col("seasonal_c")).as("resid_c"))
      .orderBy("ym")
  }

  private val stDecomposeSql =
    """WITH monthly AS (
         SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                  AS ym,
                CAST(month(o_orderdate) AS BIGINT) AS moy,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS x
         FROM orders GROUP BY 1, 2),
       tr AS (SELECT ym, moy, x,
                lag(x, 6) OVER w AS xm6,
                lead(x, 6) OVER w AS xp6,
                SUM(x) OVER (ORDER BY ym
                  ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS mid,
                COUNT(x) OVER (ORDER BY ym
                  ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS n_mid
              FROM monthly WINDOW w AS (ORDER BY ym)),
       t2 AS (SELECT ym, moy, x,
                CASE WHEN xm6 IS NOT NULL AND xp6 IS NOT NULL
                          AND n_mid = 11
                     THEN (xm6 + 2 * mid + xp6) // 24 END AS trend_c
              FROM tr),
       t3 AS (SELECT *, x - trend_c AS detr FROM t2),
       sr AS (SELECT *,
                SUM(detr) OVER (PARTITION BY moy)
                  // COUNT(detr) OVER (PARTITION BY moy) AS s_raw
              FROM t3),
       sm AS (SELECT CAST(SUM(s_raw) // 12 AS BIGINT) AS s_mean
              FROM (SELECT DISTINCT moy, s_raw FROM sr))
       SELECT ym, x AS revenue_c, CAST(trend_c AS BIGINT) AS trend_c,
              CAST(s_raw - s_mean AS BIGINT) AS seasonal_c,
              CAST(x - trend_c - (s_raw - s_mean) AS BIGINT) AS resid_c
       FROM sr CROSS JOIN sm ORDER BY ym"""

  // ------------------------------------------------------------ j13_pit_join

  /** Point-in-time join — the data-warehouse temporal join that makes
    * an SCD2 dimension USEFUL: every purchase event is joined to the
    * user's state (their last non-purchase event type, as half-open
    * [from, to) validity windows — the `scd2` build applied to the
    * non-purchase stream) AS OF the purchase timestamp, then rolled up
    * per state. Half-open windows are disjoint per user by
    * construction (same-timestamp changes leave zero-length windows
    * nothing can match), so each purchase matches AT MOST one state
    * row — no fan-out, ever; purchases before a user's first state
    * event survive the left join as '(none)'. The join is an EQUI
    * join on user_id with the range predicates as residual filters —
    * SortMergeJoin, never a cartesian. */
  private def j13PitJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.canonEventTs(Tables.events(spark, d))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val dim = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .select(col("user_id").as("du"), col("event_type").as("state"),
        col("ts").as("eff_from"),
        lead(col("ts"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id")))
          .as("eff_to"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    p.join(dim,
        col("user_id") === col("du") && col("pts") >= col("eff_from") &&
          (col("eff_to").isNull || col("pts") < col("eff_to")),
        "left")
      .groupBy(coalesce(col("state"), lit("(none)")).as("state"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("revenue_c"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("state")
  }

  private val j13PitJoinSql =
    """WITH ev AS (SELECT user_id, ts, event_id, event_type, value
            FROM events),
       c AS (SELECT user_id, ts, event_id, event_type,
               lag(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS prev_type
             FROM ev WHERE event_type <> 'purchase'),
       dim AS (SELECT user_id AS du, event_type AS state,
                 ts AS eff_from,
                 lead(ts, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS eff_to
               FROM c
               WHERE prev_type IS NULL OR prev_type <> event_type),
       p AS (SELECT user_id, ts AS pts,
               CAST(round(value * 100) AS BIGINT) AS cents
             FROM ev WHERE event_type = 'purchase')
       SELECT COALESCE(state, '(none)') AS state,
              CAST(COUNT(*) AS BIGINT) AS n_purchases,
              CAST(SUM(cents) AS BIGINT) AS revenue_c,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM p LEFT JOIN dim
         ON user_id = du AND pts >= eff_from
            AND (eff_to IS NULL OR pts < eff_to)
       GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("st_holt", stHolt, Some(stHoltSql)),
    Q("e_km_survival", eKmSurvival, Some(eKmSurvivalSql)),
    Q("e_islands", eIslands, Some(eIslandsSql)),
    Q("e_dau_mau", eDauMau, Some(eDauMauSql)),
    Q("st_decompose", stDecompose, Some(stDecomposeSql)),
    Q("j13_pit_join", j13PitJoin, Some(j13PitJoinSql)))
}
