package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOf, RangeJoin}

/** Temporal-join coverage over `events`: backward/forward as-of joins
  * (oracled against DuckDB's native ASOF JOIN) and a bucketed range join.
  * These operators are beyond the reference's surface (its late-data story
  * is MERGE-by-key) but core to any event-time pipeline at scale.
  */
object AsofQ extends QueryPack {

  private def typed(spark: SparkSession, d: String, t: String): DataFrame =
    Tables.events(spark, d).filter(col("event_type") === t)

  /** Backward as-of: each purchase joined to the same user's latest click
    * at-or-before it. One shuffle on user_id, per-key sort — no range
    * explosion (see [[graft.operators.AsOf]]). */
  private def ajBackward(spark: SparkSession, d: String): DataFrame = {
    val purchases = typed(spark, d, "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val clicks = typed(spark, d, "click")
      .select(col("user_id"), col("ts"), col("ts").as("click_ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    AsOf.backward(purchases, clicks, Seq("user_id"), "ts",
        payload = Seq("click_ts", "click_id", "click_value"),
        tieBreak = Seq("click_id"))
      .orderBy("event_id")
  }

  private val ajBackwardSql =
    """SELECT l.user_id, l.ts, l.event_id, l.value,
              r.ts AS click_ts, r.event_id AS click_id, r.value AS click_value
       FROM (SELECT * FROM events WHERE event_type = 'purchase') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
         ON l.user_id = r.user_id AND l.ts >= r.ts
       ORDER BY l.event_id"""

  /** Forward as-of: each signup joined to the same user's EARLIEST
    * purchase at-or-after it (time-to-first-purchase shape). */
  private def ajForward(spark: SparkSession, d: String): DataFrame = {
    val signups = typed(spark, d, "signup")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = typed(spark, d, "purchase")
      .select(col("user_id"), col("ts"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    AsOf.forward(signups, purchases, Seq("user_id"), "ts",
        payload = Seq("purchase_ts", "purchase_id", "purchase_value"),
        tieBreak = Seq("purchase_id"))
      .orderBy("event_id")
  }

  private val ajForwardSql =
    """SELECT l.user_id, l.ts, l.event_id,
              r.ts AS purchase_ts, r.event_id AS purchase_id,
              r.value AS purchase_value
       FROM (SELECT * FROM events WHERE event_type = 'signup') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts <= r.ts
       ORDER BY l.event_id"""

  /** Bucketed range join: purchases paired with the same user's views in
    * the strictly-preceding hour, counted per purchase. The range predicate
    * rides an EQUI join on (user_id, hour-bucket) — candidates bounded by
    * bucket population, not |same-key pairs| (see
    * [[graft.operators.RangeJoin]]). Inner semantics: purchases with zero
    * preceding views don't appear. */
  private def rjPrecedingViews(spark: SparkSession, d: String): DataFrame = {
    val purchases = typed(spark, d, "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = typed(spark, d, "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    RangeJoin.precedingWithin(purchases, views, Seq("user_id"), "ts",
        payload = Seq("view_id"), windowSec = 3600)
      .groupBy("purchase_id")
      .agg(count(col("view_id")).as("n_views"))
      .orderBy("purchase_id")
  }

  private val rjPrecedingViewsSql =
    """SELECT l.event_id AS purchase_id, CAST(COUNT(*) AS BIGINT) AS n_views
       FROM events l JOIN events r
         ON l.event_type = 'purchase' AND r.event_type = 'view'
        AND l.user_id = r.user_id
        AND r.ts >= l.ts - INTERVAL 3600 SECONDS AND r.ts < l.ts
       GROUP BY 1 ORDER BY 1"""

  /** Forward mirror: clicks in the hour strictly AFTER each signup —
    * post-conversion activity, the other direction of the bucketed range
    * join (probes own + next bucket instead of own + previous). */
  private def rjFollowingClicks(spark: SparkSession, d: String): DataFrame = {
    val signups = typed(spark, d, "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    val clicks = typed(spark, d, "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    RangeJoin.followingWithin(signups, clicks, Seq("user_id"), "ts",
        payload = Seq("click_id"), windowSec = 3600)
      .groupBy("signup_id")
      .agg(count(col("click_id")).as("n_clicks"))
      .orderBy("signup_id")
  }

  private val rjFollowingClicksSql =
    """SELECT l.event_id AS signup_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
       FROM events l JOIN events r
         ON l.event_type = 'signup' AND r.event_type = 'click'
        AND l.user_id = r.user_id
        AND r.ts <= l.ts + INTERVAL 3600 SECONDS AND r.ts > l.ts
       GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("aj_asof_backward", ajBackward, Some(ajBackwardSql)),
    Q("aj_asof_forward", ajForward, Some(ajForwardSql)),
    Q("rj_preceding_views", rjPrecedingViews, Some(rjPrecedingViewsSql)),
    Q("rj_following_clicks", rjFollowingClicks, Some(rjFollowingClicksSql)))
}
