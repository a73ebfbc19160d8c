package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch revenue attribution over an events stream — the
  * marketing-analytics twin of the funnel: each purchase's value is
  * attributed to the view/click/signup touches of the SAME user in the
  * `windowSec` before it, under the three standard models at once:
  * first-touch (earliest touch gets 100%), last-touch (latest), and
  * linear (value split equally; integer micro-cents, the remainder
  * dropped identically on any engine). A purchase with no touch in the
  * window is a 'direct' row — the unattributable mass stays visible
  * instead of vanishing. Money is integer cents throughout
  * (CAST(round(value·100))).
  *
  * Scale shape: one equi-join on user_id (the range predicate applies
  * post-join; per-user row counts are bounded), per-purchase windows
  * over ≤|touches-in-window| rows, and a |channels|-row final agg.
  * [[graft.streaming.Relay.attributionStream]] is the incremental twin
  * (StreamingSpec: streaming ≡ batch across a micro-batch boundary).
  */
object Attribution {

  /** Per-touch attribution rows: one row per (purchase, in-window touch)
    * plus one null-channel row per touch-less purchase. Columns:
    * (pid, cents, channel, n, is_first, is_last) — ties on touch
    * timestamp break by event_id, identically in the streaming twin. */
  def touchRows(events: DataFrame, windowSec: Long = 3600L): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("pts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val t = events.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("tchannel"))
    val j = p.as("p").join(t.as("t"),
        col("p.user_id") === col("t.user_id") &&
          col("t.tts") <= col("p.pts") &&
          col("t.tts") > col("p.pts") - expr(s"INTERVAL $windowSec SECOND"),
        "left")
      .select(col("p.pid"), col("p.cents"), col("t.tts"), col("t.tid"),
        col("t.tchannel"))
    val wN = Window.partitionBy("pid")
    val wA = Window.partitionBy("pid").orderBy(col("tts").asc, col("tid").asc)
    val wD = Window.partitionBy("pid").orderBy(col("tts").desc, col("tid").desc)
    j.withColumn("n", count(col("tid")).over(wN))
      .withColumn("ra", row_number().over(wA))
      .withColumn("rd", row_number().over(wD))
      .select(col("pid"), col("cents"), col("tchannel").as("channel"),
        col("n"), (col("ra") === 1).as("is_first"),
        (col("rd") === 1).as("is_last"))
  }

  /** The channel-level report from [[touchRows]]-shaped rows (batch or
    * the streaming twin's output): first/last-touch conserve total
    * purchase cents exactly; linear drops only sub-micro-cent integer
    * remainders (Curate3Spec's conservation laws). */
  def channelReport(rows: DataFrame): DataFrame =
    rows.groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(
        sum(when(col("is_first"), col("cents")).otherwise(0L)).as("ft_cents"),
        sum(when(col("is_last"), col("cents")).otherwise(0L)).as("lt_cents"),
        sum(when(col("n") === 0, col("cents") * 1000000L)
          .otherwise(expr("(cents * 1000000) div n"))).as("lin_micro"))

  /** [[touchRows]] → [[channelReport]], the registered `e_attribution`
    * shape. */
  def report(events: DataFrame, windowSec: Long = 3600L): DataFrame =
    channelReport(touchRows(events, windowSec))
}
