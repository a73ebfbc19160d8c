package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series completeness over the events stream: date-spine gap
  * filling (the "every day exists, gaps are explicit zeros" contract
  * reporting layers need) and ordered funnel conversion.
  */
object TimelineQ extends QueryPack {

  /** Per-user daily activity on a contiguous date spine: one row per
    * (user, day) from the user's first to last active day, with explicit
    * zero-activity days, a running event total, and the integer age of
    * the last active day (gap_days = 0 on active days).
    *
    * Scale shape: the raw events collapse to the per-(user, day) grid in
    * ONE partial-agg shuffle; bounds reuse that grid (dim-sized); the
    * spine explode produces Σ_user span rows — the OUTPUT size, nothing
    * larger; the spine↔daily join and the running window are both keyed
    * on user_id, so AQE sees co-partitioned exchanges. No driver
    * collect, no global window. */
  private[graft] def gapFillDaily(ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = daily.groupBy("user_id")
      .agg(min("day").as("mn"), max("day").as("mx"))
    val spine = bounds.select(col("user_id"),
      explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("cum_events", sum("n_events").over(w))
      .withColumn("gap_days",
        datediff(col("day"),
          max(when(col("n_events") > 0, col("day"))).over(w)))
      .select("user_id", "day", "n_events", "cum_events", "gap_days")
      .orderBy("user_id", "day")
  }

  private def gGapfill(spark: SparkSession, d: String): DataFrame =
    gapFillDaily(Tables.events(spark, d))

  private val gGapfillSql =
    """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2),
       b AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1),
       spine AS (SELECT user_id,
                   CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
                 FROM b),
       j AS (SELECT s.user_id, s.day, COALESCE(d.n_events, 0) AS n_events
             FROM spine s LEFT JOIN daily d
               ON s.user_id = d.user_id AND s.day = d.day)
       SELECT user_id, day, n_events,
              CAST(SUM(n_events) OVER (PARTITION BY user_id ORDER BY day) AS BIGINT)
                AS cum_events,
              CAST(day - MAX(CASE WHEN n_events > 0 THEN day END)
                     OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
                AS gap_days
       FROM j ORDER BY user_id, day"""

  /** Ordered funnel: signup → first click within 1 day → first purchase
    * within 1 day of that click. Three conditional-min aggregations,
    * each one partial-agg shuffle keyed on user_id over a TYPE-FILTERED
    * scan (the event_type predicate is pushed to the parquet scan);
    * every join's right side is a per-user 1-row aggregate — dim-sized
    * relative to the raw stream, join strategy left to AQE (no broadcast
    * hint: the user dimension is corpus-dependent, the t_lm_score
    * lesson). Output: one row per funnel step with the surviving user
    * count — monotone non-increasing by construction. */
  private[graft] def funnelWindowed(ev: DataFrame): DataFrame = {
    val s = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(s, Seq("user_id"))
      .filter(col("ts") >= col("s_ts") &&
        col("ts") <= col("s_ts") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") >= col("c_ts") &&
        col("ts") <= col("c_ts") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    def row(df: DataFrame, step: Int, nm: String): DataFrame =
      df.agg(count(lit(1)).as("users"))
        .select(lit(step).as("step"), lit(nm).as("step_name"), col("users"))
    row(s, 1, "signup")
      .unionByName(row(c, 2, "click_within_1d"))
      .unionByName(row(p, 3, "purchase_within_1d"))
      .orderBy("step")
  }

  private def eFunnel(spark: SparkSession, d: String): DataFrame =
    funnelWindowed(Tables.events(spark, d))

  private val eFunnelSql =
    """WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events
              WHERE event_type = 'signup' GROUP BY 1),
       c AS (SELECT e.user_id, MIN(ts) AS c_ts FROM events e JOIN s USING (user_id)
             WHERE event_type = 'click' AND ts >= s_ts
               AND ts <= s_ts + INTERVAL 1 DAY GROUP BY 1),
       p AS (SELECT e.user_id, MIN(ts) AS p_ts FROM events e JOIN c USING (user_id)
             WHERE event_type = 'purchase' AND ts >= c_ts
               AND ts <= c_ts + INTERVAL 1 DAY GROUP BY 1)
       SELECT 1 AS step, 'signup' AS step_name,
              CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS users
       UNION ALL
       SELECT 2, 'click_within_1d', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
       UNION ALL
       SELECT 3, 'purchase_within_1d', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
       ORDER BY step"""

  def queries: Seq[Q] = Seq(
    Q("g_gapfill", gGapfill, Some(gGapfillSql)),
    Q("e_funnel_windowed", eFunnel, Some(eFunnelSql)))
}
