package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Drift

/** Pipeline-health monitoring (engine extension): the drift checks an
  * ingest runs over its own per-period metrics before promoting a batch
  * ([[graft.etl.Drift]]) — a CUSUM change-point scan of the daily event
  * volume and a categorical-mix L1 drift scan of the event types.
  * Integer arithmetic end-to-end; the oracles replay both exactly.
  */
object MonitorQ extends QueryPack {

  /** Daily-volume CUSUM: events per day, reference = floor mean,
    * slack = ref div 100, threshold = ref div 10 (all data-derived
    * integers — ONE 1-row aggregate on the 30-row daily series, the
    * pageRankUntil discipline). The windowed series is the aggregated
    * per-day metric, never the raw events. */
  private def eCusumDrift(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val t = daily.agg(sum(col("x")).as("s"), count(lit(1)).as("n")).head()
    val ref = t.getLong(0) / t.getLong(1)
    Drift.cusumUpper(daily, "day", "x",
        ref = ref, slack = ref / 100L, h = ref / 10L)
      .orderBy("day")
  }

  private val eCusumDriftSql =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
              CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1),
       st AS (SELECT CAST(SUM(x) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
                AS ref FROM daily),
       d2 AS (SELECT day, x, x - ref - (ref // 100) AS d FROM daily, st),
       p AS (SELECT day, x, SUM(d) OVER (ORDER BY day) AS pt FROM d2),
       s AS (SELECT day, x,
               CAST(pt - LEAST(0, MIN(pt) OVER (ORDER BY day)) AS BIGINT)
                 AS s FROM p)
       SELECT day, x, s,
              CAST(CASE WHEN s > (SELECT ref // 10 FROM st)
                   THEN 1 ELSE 0 END AS INT) AS alarm
       FROM s ORDER BY day"""

  /** Daily event-type mix drift: per-day L1 distance (integer basis
    * points) between the day's type shares and the whole-month shares
    * ([[Drift.categoryDrift]] — the engine-exact stand-in for PSI),
    * alarm over 200 bp. */
  private def eCatDrift(spark: SparkSession, d: String): DataFrame =
    Drift.categoryDrift(
        Tables.events(spark, d).select(to_date(col("ts")).as("day"),
          col("event_type")),
        "day", "event_type", thresholdBp = 200L)
      .orderBy("day")

  private val eCatDriftSql =
    """WITH pc AS (SELECT CAST(ts AS DATE) AS day, event_type,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
       pp AS (SELECT day, CAST(SUM(n) AS BIGINT) AS tot FROM pc GROUP BY 1),
       gc AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS gn
              FROM pc GROUP BY 1),
       gt AS (SELECT CAST(SUM(gn) AS BIGINT) AS gtot FROM gc),
       grid AS (SELECT pp.day, pp.tot, gc.event_type, gc.gn
                FROM pp CROSS JOIN gc),
       dv AS (SELECT g.day,
                ABS(COALESCE(pc.n, 0) * 10000 // g.tot
                    - g.gn * 10000 // (SELECT gtot FROM gt)) AS dv
              FROM grid g LEFT JOIN pc
                ON g.day = pc.day AND g.event_type = pc.event_type)
       SELECT day, CAST(SUM(dv) AS BIGINT) AS l1_bp,
              CAST(CASE WHEN SUM(dv) > 200 THEN 1 ELSE 0 END AS INT) AS alarm
       FROM dv GROUP BY 1 ORDER BY day"""

  override def queries: Seq[Q] = Seq(
    Q("e_cusum_drift", eCusumDrift, Some(eCusumDriftSql)),
    Q("e_cat_drift", eCatDrift, Some(eCatDriftSql)))
}
