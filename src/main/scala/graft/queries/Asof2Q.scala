package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Sequences
import graft.operators.AsOf

/** Round-9 temporal-join completions (own trailing bench group):
  * the nearest-direction as-of join (closing the backward/forward
  * family in [[graft.operators.AsOf]]) and the peak-concurrency
  * reduction over the sweep-line interval profile. Both oracles
  * replay exactly in DuckDB.
  */
object Asof2Q extends QueryPack {

  private def typed(spark: SparkSession, d: String, t: String): DataFrame =
    Tables.events(spark, d).filter(col("event_type") === t)

  /** Nearest as-of: each signup joined to the same user's click that is
    * CLOSEST in time, in either direction ([[AsOf.nearest]] — one
    * backward + one forward union-window pass, two (|L|+|R|) key
    * shuffles, no range explosion); ties, including a click exactly at
    * the signup ts, resolve backward. `dir` marks which side won —
    * 'b' when click_ts <= ts (the tie lands here by construction). */
  private def ajNearest(spark: SparkSession, d: String): DataFrame = {
    val signups = typed(spark, d, "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = typed(spark, d, "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    AsOf.nearest(signups, clicks, Seq("user_id"), "ts",
        payload = Seq("click_ts", "click_id"),
        tieBreak = Seq("click_id"))
      .withColumn("dir",
        when(col("click_ts").isNull, lit(null).cast("string"))
          .when(col("click_ts") <= col("ts"), lit("b"))
          .otherwise(lit("f")))
      .orderBy("event_id")
  }

  private val ajNearestSql =
    """WITH s AS (SELECT user_id, ts, event_id FROM events
                  WHERE event_type = 'signup'),
       c AS (SELECT * FROM events WHERE event_type = 'click'),
       b AS (SELECT s.event_id, r.ts AS b_ts, r.event_id AS b_id
             FROM s ASOF LEFT JOIN c r
               ON s.user_id = r.user_id AND s.ts >= r.ts),
       f AS (SELECT s.event_id, r.ts AS f_ts, r.event_id AS f_id
             FROM s ASOF LEFT JOIN c r
               ON s.user_id = r.user_id AND s.ts <= r.ts),
       j AS (SELECT s.user_id, s.ts, s.event_id, b_ts, b_id, f_ts, f_id,
               (f_ts IS NULL OR (b_ts IS NOT NULL AND
                 epoch_us(s.ts) - epoch_us(b_ts)
                   <= epoch_us(f_ts) - epoch_us(s.ts))) AS pick_b
             FROM s JOIN b USING (event_id) JOIN f USING (event_id))
       SELECT user_id, ts, event_id,
              CASE WHEN pick_b THEN b_ts ELSE f_ts END AS click_ts,
              CASE WHEN pick_b THEN b_id ELSE f_id END AS click_id,
              CASE WHEN (CASE WHEN pick_b THEN b_ts ELSE f_ts END) IS NULL
                     THEN NULL
                   WHEN (CASE WHEN pick_b THEN b_ts ELSE f_ts END) <= ts
                     THEN 'b' ELSE 'f' END AS dir
       FROM j ORDER BY event_id"""

  /** Monthly peak concurrency: the max count of order-lines in flight
    * (order date → ship date, half-open) within each month, with the
    * FIRST day attaining it. The sweep ([[Sequences.sweepConcurrency]])
    * collapses ±1 deltas to one per-day partial agg before the
    * calendar-bounded cumulative window; the peak pick is a per-month
    * window over that same ~2.5k-row series — the double-reduction
    * shape, never a second pass over the fact. */
  private def ivPeakMonth(spark: SparkSession, d: String): DataFrame = {
    val iv = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderdate"))
      .join(Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
    val active = Sequences.sweepConcurrency(iv, "o_orderdate", "l_shipdate")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("month"))
      .orderBy(col("active").desc, col("day").asc)
    active
      .withColumn("month", trunc(col("day"), "month"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("month"), col("active").as("peak_active"),
        col("day").as("peak_day"))
      .orderBy("month")
  }

  private val ivPeakMonthSql =
    """WITH iv AS (SELECT o_orderdate AS s, l_shipdate AS e
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       d AS (SELECT day, CAST(SUM(dd) AS BIGINT) AS delta FROM (
             SELECT CAST(s AS DATE) AS day, 1 AS dd FROM iv
             UNION ALL
             SELECT CAST(e AS DATE), -1 FROM iv) GROUP BY 1),
       a AS (SELECT day, CAST(SUM(delta) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS active
             FROM d),
       r AS (SELECT CAST(date_trunc('month', day) AS DATE) AS month,
               active, day,
               ROW_NUMBER() OVER (PARTITION BY date_trunc('month', day)
                 ORDER BY active DESC, day ASC) AS rn
             FROM a)
       SELECT month, active AS peak_active, day AS peak_day
       FROM r WHERE rn = 1 ORDER BY month"""

  def queries: Seq[Q] = Seq(
    Q("aj_asof_nearest", ajNearest, Some(ajNearestSql)),
    Q("iv_peak_month", ivPeakMonth, Some(ivPeakMonthSql)))
}
