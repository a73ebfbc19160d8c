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

  // ------------------------------------------------------------- sk_ams_f2

  /** AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996),
    * the full MEDIAN-OF-MEANS construction: F₂ = Σ_k f_k² — the
    * self-join size, THE statistic a join optimizer wants before it
    * picks a plan — estimated by 64 independent ±1-signed sums
    * Z_j = Σ_rows s_j(key) (sign = bit j of the key's 60-bit md5,
    * bits 0..59 then md5 of 'key|2' for the rest), grouped 8×8: the
    * mean of each group's Z² bounds variance, the lower median across
    * groups bounds tail failures — the paper's (ε, δ) recipe, all
    * integer (sort_array pick, no percentile call). Everything is ONE
    * aggregate over the scan: 64 conditional sums, no explode, no
    * per-key state — the sketch is 64 longs and merges by ADDITION
    * across any sharding. The exact F₂ rides along with the error in
    * bp — graded, not asserted. Widths: |rows| ≤ 2³¹ keeps Z² ≤ 2⁶² —
    * BIGINT-safe; past that rescale through DECIMAL(38,0). */
  private def skAmsF2(spark: SparkSession, d: String): DataFrame = {
    val groups = 8
    val perGroup = 8
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey").cast("string").as("key"))
      .withColumn("h1",
        conv(substring(md5(col("key")), 1, 15), 16, 10).cast("long"))
      .withColumn("h2",
        conv(substring(md5(concat(col("key"), lit("|2"))), 1, 15), 16, 10)
          .cast("long"))
    def bit(j: Int) = if (j < 60) s"(h1 >> $j) & 1" else s"(h2 >> ${j - 60}) & 1"
    val copies = groups * perGroup
    val zs = li.agg(
      count(lit(1)).as("n_rows"),
      (0 until copies).map(j =>
        sum(when(expr(bit(j)) === 1, 1L).otherwise(-1L)).as(s"z$j")): _*)
    def mean(g: Int) = (0 until perGroup)
      .map(i => s"z${g * perGroup + i} * z${g * perGroup + i}")
      .mkString("(", " + ", s") div $perGroup")
    val medianExpr = s"sort_array(array(${(0 until groups).map(mean)
      .mkString(", ")}))[${groups / 2 - 1}]"
    val exact = Tables.lineitem(spark, d)
      .groupBy("l_partkey").agg(count(lit(1)).as("f"))
      .agg(sum(expr("f * f")).as("f2_exact"))
    zs.crossJoin(broadcast(exact))
      .select(col("n_rows"), col("f2_exact"),
        expr(medianExpr).as("f2_est"),
        expr(s"(abs($medianExpr - f2_exact) * 10000) div f2_exact")
          .as("err_bp"))
  }

  private val skAmsF2Sql = {
    val groups = 8
    val perGroup = 8
    def bit(j: Int) = if (j < 60) s"(h1 >> $j) & 1" else s"(h2 >> ${j - 60}) & 1"
    val copies = groups * perGroup
    val zCols = (0 until copies).map(j =>
      s"SUM(CASE WHEN ${bit(j)} = 1 THEN 1 ELSE -1 END) AS z$j")
      .mkString(", ")
    def mean(g: Int) = (0 until perGroup)
      .map(i => s"z${g * perGroup + i} * z${g * perGroup + i}")
      .mkString("(", " + ", s") // $perGroup")
    val medianExpr = s"list_sort([${(0 until groups).map(mean)
      .mkString(", ")}])[${groups / 2}]"
    s"""WITH k AS (SELECT
           ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
             AS h1,
           ('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || '|2'), 1, 15))::BIGINT
             AS h2
         FROM lineitem),
       z AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, $zCols FROM k),
       ex AS (SELECT CAST(SUM(f * f) AS BIGINT) AS f2_exact FROM
              (SELECT COUNT(*) AS f FROM lineitem GROUP BY l_partkey))
       SELECT n_rows, f2_exact,
              CAST($medianExpr AS BIGINT) AS f2_est,
              CAST((abs($medianExpr - f2_exact) * 10000) // f2_exact
                AS BIGINT) AS err_bp
       FROM z CROSS JOIN ex"""
  }

  def queries: Seq[Q] = Seq(
    Q("sk_hll_window", skHllWindow, Some(skHllWindowSql)),
    Q("sk_ams_f2", skAmsF2, Some(skAmsF2Sql)),
    Q("t_heavy_by", tHeavyBy, Some(tHeavyBySql)))
}
