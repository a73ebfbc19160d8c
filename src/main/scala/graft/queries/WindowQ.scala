package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact._

/** Window-function coverage beyond the reference's surface (SURVEY §2.5
  * lists rank/dense_rank/lag/lead/rangeBetween as absent) — a complete
  * engine ships them, so they're implemented and oracle-checked here.
  * All windows are PARTITIONED (per-customer / per-user), so they scale:
  * one hash shuffle on the partition key, per-key local sort, no global
  * ordering anywhere.
  */
object WindowQ extends QueryPack {

  /** lag/lead + rank/dense_rank over per-customer order history. */
  private def w6LagLeadRank(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        rank().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("price_rank"),
        dense_rank().over(Window.partitionBy("o_custkey")
          .orderBy(col("o_orderpriority"))).as("prio_rank"),
        (col("o_totalprice") -
          lag(col("o_totalprice"), 1).over(w)).as("price_delta"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val w6Sql =
    """SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price,
       CAST(RANK() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank,
       CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
            ORDER BY o_orderpriority) AS INT) AS prio_rank,
       o_totalprice - lag(o_totalprice, 1) OVER w AS price_delta
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ORDER BY o_custkey, o_orderkey"""

  /** Sessionization: per-user session ids from >30-minute inactivity gaps
    * (lag + conditional + running sum — the standard event-sessionization
    * idiom; the streaming equivalent is session windows with watermarks).
    */
  private def w7Sessionize(spark: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val withGap = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
          .otherwise(0))
    val sessions = withGap
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        sumExact(col("value")).as("session_value"))
      .orderBy("user_id", "session_seq")
  }

  private val w7Sql =
    """WITH g AS (
         SELECT user_id, event_id, ts, value,
                lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         FROM events),
       s AS (
         SELECT *, CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
         FROM g),
       seq AS (
         SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_seq
         FROM s)
       SELECT user_id, session_seq, COUNT(*) AS n_events,
              MIN(ts) AS session_start, MAX(ts) AS session_end,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
       FROM seq GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Forward fill (gap repair): error events carry no usable reading, so
    * their value is nulled and repaired with the last non-null value per
    * user — `last(_, ignoreNulls)` over a partitioned running frame. The
    * standard sensor-dropout / sparse-attribute densification idiom: one
    * hash shuffle on user_id, per-key sort, no global ordering. */
  private def w8ForwardFill(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value"))
          .as("reading"))
      .withColumn("reading_filled",
        last(col("reading"), ignoreNulls = true).over(w))
  }

  private val w8Sql =
    """SELECT user_id, event_id, ts,
              CASE WHEN event_type = 'error' THEN NULL ELSE value END AS reading,
              LAST_VALUE(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                         IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS reading_filled
       FROM events"""

  /** SCD Type-2 dimension build from a change feed: per user, consecutive
    * duplicate attribute values collapse, each surviving change opens a
    * versioned row with [effective_from, effective_to) and an is_current
    * flag (lead() closes the interval). This is the medallion silver-dim
    * versioning pattern; both windows share one hash shuffle on user_id. */
  private def scd2Dim(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"), col("event_type"),
        col("ts").as("effective_from"),
        lead(col("ts"), 1).over(w).as("effective_to"))
      .withColumn("is_current", col("effective_to").isNull)
  }

  private val scd2Sql =
    """WITH c AS (
         SELECT user_id, ts, event_id, event_type,
                lag(event_type, 1) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev_type
         FROM events),
       ch AS (SELECT user_id, ts, event_id, event_type FROM c
              WHERE prev_type IS NULL OR prev_type <> event_type)
       SELECT user_id, event_type, ts AS effective_from,
              lead(ts, 1) OVER w AS effective_to,
              lead(ts, 1) OVER w IS NULL AS is_current
       FROM ch
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

  /** Interval RANGE frame: per-customer trailing-30-day spend. Unlike a
    * ROWS frame, the frame is bounded by the ORDER-BY VALUE (all orders
    * within 30 days, however many), and same-day peers are always in
    * frame together — so the result is deterministic under ties without
    * a tie-break column. Ordering is on epoch seconds; the oracle
    * mirrors the identical numeric frame. */
  private def w9RangeFrame(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        count(lit(1)).over(w).as("n_30d"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("spend_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val w9Sql =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
              COUNT(*) OVER w AS n_30d,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                AS spend_30d
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
                    ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
       ORDER BY o_custkey, o_orderkey"""

  /** Distribution windows — ntile/percent_rank/cume_dist per market
    * segment. The unique (acctbal, custkey) tie-break makes every rank
    * function deterministic; the rank arithmetic is exact small-integer
    * division so the doubles match bit-for-bit across engines. */
  private def w10Ntile(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_custkey")
  }

  private val w10Sql =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
              CAST(NTILE(4) OVER w AS INT) AS quartile,
              PERCENT_RANK() OVER w AS pct_rank,
              CUME_DIST() OVER w AS cume
       FROM customer
       WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
       ORDER BY c_custkey"""

  override def queries: Seq[Q] = Seq(
    Q("w6_lag_lead_rank", w6LagLeadRank, Some(w6Sql)),
    Q("w10_ntile", w10Ntile, Some(w10Sql)),
    Q("w7_sessionize", w7Sessionize, Some(w7Sql)),
    Q("w8_ffill", w8ForwardFill, Some(w8Sql)),
    Q("w9_range", w9RangeFrame, Some(w9Sql)),
    Q("scd2", scd2Dim, Some(scd2Sql)))
}
