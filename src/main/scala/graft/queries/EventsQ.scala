package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Cleaning
import graft.util.Exact._

/** Event-stream operator coverage (SURVEY §2.9) run in batch mode so the
  * DuckDB oracle can check it. The streaming library
  * ([[graft.streaming.Relay]]) executes the SAME column logic via
  * readStream/writeStream; these batch twins pin the semantics:
  * Structured Streaming's incremental execution of a plan must equal its
  * batch execution over the full input.
  */
object EventsQ extends QueryPack {

  /** S9-shaped tumbling-hour aggregation (the reference's streaming relay
    * appends to hourly-queryable Delta tables; `src/streaming/writers
    * .py:12-76`). date_trunc on the event time = tumbling window of 1 hour;
    * at scale this is a hash shuffle on (hour, type) with map-side
    * combine, identical in batch and streaming. */
  private def s9HourlyAgg(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sumExact(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  private val s9Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** S10/S11 — MERGE-style "latest wins" upsert result (reference
    * foreachBatch MERGE keyed on FLIGHT_SK, `src/streaming/writers
    * .py:78-132`, `src/incrementatl_processing/incremetal_flights.py:10-19`).
    * Computed via [[Cleaning.latestByKey]]: one hash shuffle on the key +
    * per-key sort — the scalable deduplicating-upsert primitive (no global
    * sort, no driver loop). Tie-break (ts, event_id) makes it
    * deterministic. */
  private def s10UpsertLatest(spark: SparkSession, d: String): DataFrame =
    Cleaning.latestByKey(Seq("user_id"), Seq(col("ts"), col("event_id")))(
        Tables.events(spark, d))
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy("user_id")

  private val s10Sql =
    """SELECT user_id, ts AS last_ts, event_type AS last_type, value AS last_value
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
       WHERE rn = 1 ORDER BY user_id"""

  /** JSON extraction from the props column (driver-side-only in the
    * reference — `bronze_orchestrator.py:74-75` parses JSON in Python; here
    * it's a distributed expression, as it must be at 100 TB). */
  private def fJsonExtract(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))("k")
          .as("prop_k"))
      .groupBy("prop_k")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("prop_k")

  private val fJsonSql =
    """SELECT CAST(props->>'k' AS INT) AS prop_k, COUNT(*) AS n_events
       FROM events GROUP BY 1 ORDER BY 1"""

  /** W4 — monotonically_increasing_id surrogate keys (reference flight_sk,
    * `…fact_flights.ipynb:318`). Values are partition-dependent, so no
    * value oracle exists by design (SURVEY §7.4 risk 2) — the driver
    * records a rows-only check. The invariant check (distinct = total)
    * lives in RelationalSpec. */
  private def w4MonotonicSk(spark: SparkSession, d: String): DataFrame =
    Tables.supplier(spark, d)
      .withColumn("supplier_sk", monotonically_increasing_id())

  /** Ordered funnel (view → click → purchase): per stage, the users whose
    * FIRST qualifying event follows their previous stage's timestamp.
    * Classic event analytics the reference's event tables feed. Scale
    * shape: each stage is one hash join on user_id against the previous
    * stage's (user, ts) aggregate — |users| rows, map-side-combinable
    * mins, no window over the full event stream. */
  private def eFunnel(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).withColumn("stage", lit(name))
    stage(v, "1_view")
      .unionByName(stage(c, "2_click"))
      .unionByName(stage(p, "3_purchase"))
      .select("stage", "n_users")
      .orderBy("stage")
  }

  private val eFunnelSql =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY 1),
       c AS (SELECT e.user_id, MIN(ts) AS t_click
             FROM events e JOIN v ON e.user_id = v.user_id
             WHERE event_type = 'click' AND ts >= t_view GROUP BY 1),
       p AS (SELECT e.user_id, MIN(ts) AS t_purchase
             FROM events e JOIN c ON e.user_id = c.user_id
             WHERE event_type = 'purchase' AND ts >= t_click GROUP BY 1)
       SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
       UNION ALL SELECT '2_click', COUNT(*) FROM c
       UNION ALL SELECT '3_purchase', COUNT(*) FROM p
       ORDER BY stage"""

  /** Weekly cohort retention — the standard product-analytics rollup:
    * users cohorted by first-activity week (Monday-truncated, the house
    * week convention), then per (cohort, week-offset) the distinct
    * active users and the retention rate against the cohort size.
    *
    * Scale shape: one groupBy(user) for cohort assignment, one shuffle
    * join back on user_id (AQE broadcasts it while the user dim is
    * small; stays a hash join at 100 TB), and one (cohort, offset)
    * aggregation with map-side distinct partials. Offsets are exact
    * integer day arithmetic div 7; the rate is a single IEEE divide
    * rounded to 4dp — both engine-portable. */
  private def eCohort(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
    val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        expr("datediff(wk, cohort_week) div 7").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .withColumn("retention_pct", round(
        col("n_active").cast("double") / col("cohort_size").cast("double"), 4))
      .select("cohort_week", "week_offset", "n_active", "cohort_size",
        "retention_pct")
      .orderBy("cohort_week", "week_offset")
  }

  private val eCohortSql =
    """WITH ev AS (SELECT user_id,
                CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
       c AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1),
       sizes AS (SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size
                 FROM c GROUP BY 1),
       act AS (SELECT cohort_week,
                CAST((wk - cohort_week) // 7 AS BIGINT) AS week_offset,
                COUNT(DISTINCT user_id) AS n_active
              FROM ev JOIN c USING (user_id) GROUP BY 1, 2)
       SELECT cohort_week, week_offset, n_active, cohort_size,
              round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 4)
                AS retention_pct
       FROM act JOIN sizes USING (cohort_week)
       ORDER BY cohort_week, week_offset"""

  override def queries: Seq[Q] = Seq(
    Q("s9_hourly_agg", s9HourlyAgg, Some(s9Sql)),
    Q("e_cohort", eCohort, Some(eCohortSql)),
    Q("s10_upsert_latest", s10UpsertLatest, Some(s10Sql)),
    Q("f_json_extract", fJsonExtract, Some(fJsonSql)),
    Q("e_funnel", eFunnel, Some(eFunnelSql)),
    Q("w4_monotonic_sk", w4MonotonicSk, None))
}
