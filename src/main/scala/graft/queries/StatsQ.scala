package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Profile
import graft.sketch.Sketch

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

  def queries: Seq[Q] = Seq(
    Q("sk_kmv", skKmv, Some(skKmvSql)),
    Q("sk_kmv_grouped", skKmvGrouped, Some(skKmvGroupedSql)),
    Q("pr_profile", prProfile, Some(prProfileSql)))
}
