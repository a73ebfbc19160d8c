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
    Q("e_cat_drift", eCatDrift, Some(eCatDriftSql)),
    Q("e_abtest", eAbtest, Some(eAbtestSql)))

  /** A/B experiment gate ([[Drift.abChiSquare]]): units are users
    * (variant = user_id parity — the deterministic stand-in for an
    * assignment column), success = the user ever purchased. Parity
    * assignment is null-effect by construction, so the fixture
    * exercises the non-significant path; the spec exercises the
    * significant one. One conditional-count aggregate → one row. */
  private def eAbtest(spark: SparkSession, d: String): DataFrame =
    Drift.abChiSquare(
      Tables.events(spark, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1)
          .otherwise(0)).as("succ"))
        .select(pmod(col("user_id"), lit(2)).as("variant"), col("succ")),
      "variant", "succ")

  private val eAbtestSql =
    """WITH u AS (SELECT user_id % 2 AS variant,
                MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS succ
              FROM events GROUP BY user_id),
       ct AS (SELECT
           CAST(SUM(CASE WHEN variant = 0 AND succ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN variant = 0 AND succ = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN variant = 1 AND succ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN variant = 1 AND succ = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
         FROM u)
       SELECT a + b AS n_a, c + d AS n_b, a AS succ_a, c AS succ_b,
              CASE WHEN a + b = 0 THEN 0
                   ELSE (a * 10000) // (a + b) END AS conv_a_bp,
              CASE WHEN c + d = 0 THEN 0
                   ELSE (c * 10000) // (c + d) END AS conv_b_bp,
              CAST(CASE WHEN (a + b) * (c + d) = 0 OR (a + c) * (b + d) = 0
                   THEN 0
                   ELSE (CAST(a + b + c + d AS HUGEINT)
                     * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                     * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                     * 1000000)
                     // (CAST(a + b AS HUGEINT) * (c + d)
                        * (a + c) * (b + d)) END AS BIGINT) AS chi2_micro,
              CASE WHEN CASE WHEN (a + b) * (c + d) = 0 OR (a + c) * (b + d) = 0
                        THEN 0
                        ELSE (CAST(a + b + c + d AS HUGEINT)
                          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                          * 1000000)
                          // (CAST(a + b AS HUGEINT) * (c + d)
                             * (a + c) * (b + d)) END >= 3841459
                   THEN 1 ELSE 0 END AS significant
       FROM ct"""
}
