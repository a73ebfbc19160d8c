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

  override def queries: Seq[Q] = Seq(
    Q("w6_lag_lead_rank", w6LagLeadRank, Some(w6Sql)),
    Q("w7_sessionize", w7Sessionize, Some(w7Sql)))
}
