package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Profile
import graft.ml.Stats
import graft.sketch.Sketch
import graft.util.Exact

/** Round-9 statistics pack: the KMV bottom-k distinct sketch (global +
  * per-group — the set-operation-capable complement to the HLL pair in
  * [[SketchQ]]) and the one-pass table profiler. Registered as its own
  * trailing bench group so the established groups' round-over-round
  * rows stay apples-to-apples (the r7 bench discipline).
  *
  * Exactness discipline as [[SketchQ]]: md5-derived 60-bit hashes, pure
  * integer state, and the single float step a literal IEEE expression
  * tree — the estimates are approximate w.r.t. the TRUTH but exact
  * w.r.t. the ALGORITHM, which is what the DuckDB gate checks.
  */
object StatsQ extends QueryPack {

  /** Global KMV over the lineitem part keys, k = 256: one row
    * (n_kept, kth, estimate, exact). The sketch is ≤ 256 hash rows at
    * ANY corpus size — the bounded per-partition TreeSet pass collapses
    * each partition before the shuffle ([[Sketch.kmvSketch]]), and the
    * oracle replays the NAIVE distinct-sort-limit plan, which the
    * containment law makes bit-identical. The exact countDistinct rides
    * along for scrutiny, as in `t_hll_distinct`. */
  private def skKmv(spark: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(spark, d)
      .select(col("l_partkey").cast("string").as("tok"))
    Sketch.kmvEstimate(Sketch.kmvSketch(keys, "tok", k = 256), k = 256)
      .crossJoin(keys.agg(count_distinct(col("tok")).as("exact")))
      .select(col("n_kept"), col("kth"), col("estimate"), col("exact"))
  }

  private val skKmvSql =
    """WITH t2 AS (SELECT DISTINCT
                ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM lineitem),
       bot AS (SELECT h FROM t2 ORDER BY h LIMIT 256),
       s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth FROM bot)
       SELECT n_kept, kth,
              CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                   ELSE CAST(255 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                        / CAST(kth AS DOUBLE) END AS estimate,
              (SELECT CAST(COUNT(DISTINCT CAST(l_partkey AS VARCHAR)) AS BIGINT)
               FROM lineitem) AS exact
       FROM s"""

  /** Per-group KMV — distinct part keys per return flag, k = 64: the
    * direct twin of `t_hll_grouped` with the OTHER sketch, so the two
    * estimators are comparable row for row. State is ≤ 64 hashes per
    * group from one bounded-memory pass ([[Sketch.kmvSketchBy]] — a
    * HashMap(group → TreeSet) per partition; the group domain is the
    * 3-value return flag, squarely the dim-sized contract). */
  private def skKmvGrouped(spark: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(spark, d)
      .select(col("l_returnflag").as("g"),
        col("l_partkey").cast("string").as("tok"))
    Sketch.kmvEstimateBy(Sketch.kmvSketchBy(keys, k = 64), k = 64)
      .join(keys.groupBy("g").agg(count_distinct(col("tok")).as("exact")),
        Seq("g"))
      .select(col("g").as("l_returnflag"), col("n_kept"), col("kth"),
        col("estimate"), col("exact"))
      .orderBy("l_returnflag")
  }

  private val skKmvGroupedSql =
    """WITH t2 AS (SELECT DISTINCT l_returnflag AS g,
                ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
              FROM lineitem),
       bot AS (SELECT g, h,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r
               FROM t2),
       s AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(h) AS kth
             FROM bot WHERE r <= 64 GROUP BY g),
       ex AS (SELECT l_returnflag AS g,
                CAST(COUNT(DISTINCT CAST(l_partkey AS VARCHAR)) AS BIGINT) AS exact
              FROM lineitem GROUP BY 1)
       SELECT s.g AS l_returnflag, n_kept, kth,
              CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
                   ELSE CAST(63 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                        / CAST(kth AS DOUBLE) END AS estimate,
              exact
       FROM s JOIN ex ON s.g = ex.g
       ORDER BY l_returnflag"""

  /** One-pass profile of the documents table: per column null count,
    * exact distinct count, min/max as string — |cols| output rows from
    * ONE aggregation over the scan ([[Profile.profile]]). */
  private def prProfile(spark: SparkSession, d: String): DataFrame =
    Profile.profile(Tables.documents(spark, d),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy("col_name")

  private val prProfileSql = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_rows,
            CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
            CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
            CAST(MIN($c) AS VARCHAR) AS min_s,
            CAST(MAX($c) AS VARCHAR) AS max_s
          FROM documents"""
    Seq("doc_id", "text", "lang", "source", "n_chars").map(one)
      .mkString("", " UNION ALL ", " ORDER BY col_name")
  }

  /** Revenue trend per supplier nation: integer-exact OLS slope of
    * line-item revenue (cents) on ship epoch-day ([[Stats.olsSlopeBp]]).
    * Dims broadcast into the fact scan, then ONE moment-sum shuffle on
    * the 25-value nation key with map-side combine. Cents come from the
    * DECIMAL(18,2) canonicalization of the stored double ([[Exact]]), so
    * every moment is an exact integer on both engines. */
  private def stOlsTrend(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .join(broadcast(Tables.supplier(spark, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        datediff(col("l_shipdate"), lit("1970-01-01")).as("ship_day"),
        (Exact.dec2(col("l_extendedprice")) * 100).cast("long").as("price_c"))
    Stats.olsSlopeBp(li, Seq("n_name"), col("ship_day"), col("price_c"))
      .orderBy("n_name")
  }

  private val stOlsTrendSql =
    """WITH base AS (
         SELECT n_name,
                date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                  AS x,
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS y
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey),
       m AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
                    SUM(CAST(x AS HUGEINT)) AS sx,
                    SUM(CAST(y AS HUGEINT)) AS sy,
                    SUM(CAST(x AS HUGEINT) * y) AS sxy,
                    SUM(CAST(x AS HUGEINT) * x) AS sxx
             FROM base GROUP BY 1),
       nd AS (SELECT n_name, n,
                     CAST(n AS HUGEINT) * sxy - sx * sy AS num,
                     CAST(n AS HUGEINT) * sxx - sx * sx AS den
              FROM m)
       SELECT n_name, n,
              CASE WHEN den = 0 THEN NULL
                   WHEN num < 0 THEN CAST(-((10000 * (-num)) // den) AS BIGINT)
                   ELSE CAST((10000 * num) // den AS BIGINT) END AS slope_bp
       FROM nd ORDER BY n_name"""

  /** 3-sigma event-value outliers per event type
    * ([[Stats.sigmaOutliers]]): the integer-exact (n·x−S)² > 9(n·Q−S²)
    * gate — one window shuffle on the 5-value type key, threshold
    * decisions bit-identical across engines because nothing is ever a
    * float. The events value column is exponential-ish (σ ≈ μ), so the
    * gate actually fires — on the uniform TPC-H monetary columns max
    * deviation is 1.73σ and a 3σ detector is vacuous by construction. */
  private def stOutliers(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .select(col("event_type"), col("event_id"),
        (Exact.dec2(col("value")) * 100).cast("long").as("value_c"))
    Stats.sigmaOutliers(e, Seq("event_type"), col("value_c"), sigmas = 3)
      .orderBy("event_type", "event_id")
  }

  private val stOutliersSql =
    """WITH o AS (SELECT event_type, event_id,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS value_c
              FROM events),
       w AS (SELECT event_type, event_id, value_c,
                    CAST(COUNT(*) OVER win AS HUGEINT) AS n,
                    SUM(CAST(value_c AS HUGEINT)) OVER win AS s,
                    SUM(CAST(value_c AS HUGEINT) * value_c) OVER win AS q
             FROM o
             WINDOW win AS (PARTITION BY event_type))
       SELECT event_type, event_id, value_c
       FROM w
       WHERE (n * value_c - s) * (n * value_c - s) > 9 * (n * q - s * s)
       ORDER BY event_type, event_id"""

  /** Robust MAD outliers on the same per-type event values
    * ([[Stats.madOutliers]]): |x − median| > 3·MAD with lower medians —
    * the robust complement to `st_outliers`. On the exponential-ish
    * value column the two detectors genuinely disagree (MAD flags the
    * whole upper tail the σ gate's inflated stddev forgives) — the
    * textbook robustness contrast, asserted by the oracle row counts.
    * Pure integers; two rank windows + two broadcast-sized median
    * joins. */
  private def stMadOutliers(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .select(col("event_type"), col("event_id"),
        (Exact.dec2(col("value")) * 100).cast("long").as("value_c"))
    Stats.madOutliers(e, Seq("event_type"), col("value_c"), k = 3)
      .select("event_type", "event_id", "value_c", "med", "mad", "dev")
      .orderBy("event_type", "event_id")
  }

  private val stMadOutliersSql =
    """WITH o AS (SELECT event_type, event_id,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS value_c
              FROM events),
       r1 AS (SELECT event_type, value_c,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value_c) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM o),
       med AS (SELECT event_type, value_c AS med
               FROM r1 WHERE rn = (n + 1) // 2),
       d AS (SELECT o.event_type, event_id, value_c, med,
                    ABS(value_c - med) AS dev
             FROM o JOIN med USING (event_type)),
       r2 AS (SELECT event_type, dev,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY dev) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM d),
       mad AS (SELECT event_type, dev AS mad
               FROM r2 WHERE rn = (n + 1) // 2)
       SELECT d.event_type, event_id, value_c, med, mad, dev
       FROM d JOIN mad USING (event_type)
       WHERE dev > 3 * mad
       ORDER BY event_type, event_id"""

  def queries: Seq[Q] = Seq(
    Q("sk_kmv", skKmv, Some(skKmvSql)),
    Q("sk_kmv_grouped", skKmvGrouped, Some(skKmvGroupedSql)),
    Q("pr_profile", prProfile, Some(prProfileSql)),
    Q("st_ols_trend", stOlsTrend, Some(stOlsTrendSql)),
    Q("st_outliers", stOutliers, Some(stOutliersSql)),
    Q("st_mad_outliers", stMadOutliers, Some(stMadOutliersSql)))
}
