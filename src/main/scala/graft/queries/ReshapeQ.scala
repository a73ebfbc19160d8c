package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Reshaping operators — pivot (long→wide) and explode/unnest (nested→
  * long). Neither appears in the reference's notebooks, but both are
  * table-stakes for an analytics engine and both have scale-correct
  * Spark formulations: pivot with an EXPLICIT value list (no extra
  * distinct-collect job, fixed output schema at plan time) compiles to
  * one hash aggregate; posexplode is a generator inside whole-stage
  * codegen (no shuffle at all).
  */
object ReshapeQ extends QueryPack {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Daily long→wide event-count matrix. The pivot value list is pinned
    * (Spark would otherwise run a distinct job to discover it — an extra
    * scan at 100 TB and a nondeterministic column order); missing
    * (day, type) cells land as 0, not null, matching the FILTER'd counts
    * on the oracle side. */
  private def pvDaily(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .select(col("day") +:
        eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")

  private val pvSql =
    """SELECT date_trunc('day', ts) AS day,
              count(*) FILTER (WHERE event_type = 'click')    AS click,
              count(*) FILTER (WHERE event_type = 'error')    AS error,
              count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
              count(*) FILTER (WHERE event_type = 'signup')   AS signup,
              count(*) FILTER (WHERE event_type = 'view')     AS view
       FROM events GROUP BY 1 ORDER BY 1"""

  /** Ordinal unnest: split each part name and emit one (partkey, pos,
    * word) row per token — posexplode keeps the element index, the
    * schema-stable equivalent of UNNEST WITH ORDINALITY. Runs entirely
    * inside codegen: scan → generate, no exchange. */
  private def xUnnest(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
      .select(col("p_partkey"), col("pos").cast("int").as("pos"), col("word"))

  private val xSql =
    """SELECT p_partkey, CAST(u.pos AS INT) AS pos, u.word
       FROM part,
            UNNEST(list_transform(string_split(p_name, ' '),
                   (x, i) -> {'pos': i - 1, 'word': x})) AS r(u)"""

  /** Wide→long melt (unpivot) — the inverse reshape, composed as
    * melt(pivot(events)): the daily wide matrix stacks back to
    * (day, event_type, n) rows, INCLUDING explicit 0 cells (the pivot
    * round-trip is lossless either way). `stack` is a generator like
    * posexplode — scan → generate inside codegen, no shuffle beyond the
    * pivot's own aggregate. */
  private def pvMelt(spark: SparkSession, d: String): DataFrame =
    pvDaily(spark, d).select(col("day"), expr(
      s"""stack(${eventTypes.size},
          ${eventTypes.map(t => s"'$t', $t").mkString(", ")})
          AS (event_type, n)"""))
      .orderBy("day", "event_type")

  private val pvMeltSql =
    """WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
       cnt AS (SELECT date_trunc('day', ts) AS day, event_type,
                COUNT(*) AS n FROM events GROUP BY 1, 2)
       SELECT day, t.event_type, COALESCE(cnt.n, 0) AS n
       FROM days CROSS JOIN (
         SELECT UNNEST(['click', 'error', 'purchase', 'signup', 'view'])
           AS event_type) t
       LEFT JOIN cnt USING (day, event_type)
       ORDER BY day, event_type"""

  override def queries: Seq[Q] = Seq(
    Q("pv_daily", pvDaily, Some(pvSql)),
    Q("pv_melt", pvMelt, Some(pvMeltSql)),
    Q("x_unnest", xUnnest, Some(xSql)))
}
