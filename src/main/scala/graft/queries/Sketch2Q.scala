package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sketch.Sketch

/** Round-9 sliding-window sketch pack: trailing-window distinct counts
  * from MERGED per-day HLL registers — the mergeability property that
  * makes sketches the scale answer, exercised across TIME instead of
  * across shards. The exact sliding distinct rides along row-for-row,
  * so the estimate is graded, not asserted (`t_hll_grouped`'s
  * discipline).
  */
object Sketch2Q extends QueryPack {

  private val M = 64
  private val WinDays = 7

  /** Trailing-7-day distinct active users per day: per-day sparse HLL
    * registers (m = 64), each register row contributed to the ≤ 7
    * window endpoints it covers (a bounded ×7 explode of a
    * (days·m)-bounded table — never the event stream), register-MAX
    * merge per (day, bucket), harmonic estimate beside the exact
    * sliding COUNT DISTINCT. At 100 TB the exact side is the cost
    * problem (it re-explodes every (day, user) pair); the register
    * path's state is |days|·m rows total regardless of event volume —
    * that asymmetry is what this query demonstrates. Window endpoints
    * are restricted to OBSERVED days (an empty day has no row on
    * either side). */
  private def skHllWindow(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"),
        col("user_id").cast("string").as("tok"))
    val days = ev.select("day").distinct()
    val merged = Sketch.hllRegistersBy(ev, "tok", "day", m = M)
      .select(col("day"), col("bucket"), col("register"),
        explode(sequence(lit(0), lit(WinDays - 1))).as("i"))
      .select(date_add(col("day"), col("i")).as("day"),
        col("bucket"), col("register"))
      .join(days, "day")
      .groupBy("day", "bucket")
      .agg(max(col("register")).cast("int").as("register"))
    val exact = ev.distinct()
      .select(col("day"), col("tok"),
        explode(sequence(lit(0), lit(WinDays - 1))).as("i"))
      .select(date_add(col("day"), col("i")).as("day"), col("tok"))
      .join(days, "day")
      .distinct()
      .groupBy("day").agg(count(lit(1)).cast("long").as("exact"))
    Sketch.hllEstimateBy(merged, "day", m = M)
      .join(exact, "day")
      .select(col("day"), col("estimate"), col("exact"))
      .orderBy("day")
  }

  private val skHllWindowSql =
    s"""WITH ev AS (SELECT CAST(ts AS DATE) AS day,
                CAST(user_id AS VARCHAR) AS tok FROM events),
       days AS (SELECT DISTINCT day FROM ev),
       h AS (SELECT day, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
             FROM ev),
       r AS (SELECT day, h % $M AS bucket, h // $M AS w FROM h),
       rho AS (SELECT day, bucket,
                 CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho
               FROM r),
       reg AS (SELECT day, bucket, MAX(rho) AS register
               FROM rho GROUP BY 1, 2),
       con AS (SELECT day + CAST(i AS INTEGER) AS day, bucket, register
               FROM reg CROSS JOIN (SELECT unnest(range($WinDays)) AS i) t),
       mrg AS (SELECT c.day, bucket, MAX(register) AS register
               FROM con c JOIN days USING (day) GROUP BY 1, 2),
       s AS (SELECT day,
               SUM(CAST(1 AS BIGINT) << (55 - register))
                 + ($M - COUNT(*)) * (CAST(1 AS BIGINT) << 55) AS s
             FROM mrg GROUP BY 1),
       exd AS (SELECT DISTINCT day, tok FROM ev),
       exc AS (SELECT w.day, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact
               FROM (SELECT day + CAST(i AS INTEGER) AS day, tok
                     FROM exd CROSS JOIN
                          (SELECT unnest(range($WinDays)) AS i) t) w
               JOIN days USING (day) GROUP BY 1)
       SELECT s.day,
              CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
                * CAST(36028797018963968 AS DOUBLE) / CAST(s.s AS DOUBLE)
                AS estimate,
              exact
       FROM s JOIN exc USING (day) ORDER BY s.day"""

  /** Per-language exact heavy tokens (count·30 > language total) via
    * the grouped Misra-Gries pre-filter ([[Sketch.heavyHittersBy]]) —
    * `t_heavy` per group: the candidate build side is |langs|·k·
    * partitions rows by construction, totals are a 4-row aggregate,
    * and the result is bit-identical to the naive per-group plan the
    * oracle replays. */
  private def tHeavyBy(spark: SparkSession, d: String): DataFrame =
    Sketch.heavyHittersBy(
        Tables.documents(spark, d)
          .select(col("lang").as("g"),
            explode(graft.text.Text.tokens(col("text"))).as("tok"))
          .filter(col("tok") =!= ""),
        k = 64, freqDiv = 30L)
      .select(col("g").as("lang"), col("tok"), col("cnt"))
      .orderBy("lang", "tok")

  private val tHeavyBySql =
    """WITH t AS (SELECT lang, tok FROM (
              SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents) WHERE tok <> ''),
       tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS total
               FROM t GROUP BY 1)
       SELECT t.lang AS lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM t JOIN tot ON t.lang = tot.lang
       GROUP BY t.lang, tok, total HAVING COUNT(*) * 30 > total
       ORDER BY t.lang, tok"""

  def queries: Seq[Q] = Seq(
    Q("sk_hll_window", skHllWindow, Some(skHllWindowSql)),
    Q("t_heavy_by", tHeavyBy, Some(tHeavyBySql)))
}
