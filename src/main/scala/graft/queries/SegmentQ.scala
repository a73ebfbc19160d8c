package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Privacy
import graft.util.Exact
import graft.util.Exact.idiv

/** Round-9 segmentation / temporal / audit analytics pack: RFM customer
  * segmentation, a multiplicative seasonal index, the interval-overlap
  * join, per-source quality quantile normalization, a rolling robust
  * median, Benford's-law forensics, and the l-diversity privacy audit.
  * All pure-integer outputs under the house exactness discipline (cents
  * via DECIMAL(18,2), basis points via integral division on
  * non-negative numerators).
  */
object SegmentQ extends QueryPack {

  /** RFM (recency / frequency / monetary) segmentation: per customer the
    * last order day, order count and exact spend aggregate first (ONE
    * groupBy on the customer key), then each metric ranks into quintiles
    * — quintile = ((rank−1)·5) div n + 1 with the customer key as the
    * deterministic tie-break — and the output is the SEGMENT GRID
    * (r,f,m) → customer count + spend, ≤125 rows at any scale.
    *
    * Recency needs no "as of" anchor: ranking last-order days ascending
    * makes quintile 5 the most recent fifth directly. The rank windows
    * sort the aggregated CUSTOMER relation (not orders); at 100 TB the
    * same grid would come from approx-quantile thresholds broadcast into
    * the scan — the documented t_quality_pctl trade — but the exact rank
    * form is the oracle-replayable ground truth. */
  private def eRfm(spark: SparkSession, d: String): DataFrame = {
    val pc = Tables.orders(spark, d)
      .groupBy("o_custkey")
      .agg(
        datediff(max(col("o_orderdate")), lit("1970-01-01")).as("last_day"),
        count(lit(1)).as("n_orders"),
        sum((Exact.dec2(col("o_totalprice")) * 100).cast("long"))
          .cast("long").as("spend_c"))
    val n = count(lit(1)).over(Window.partitionBy())
    def quintile(rank: org.apache.spark.sql.Column) =
      idiv((rank - 1) * 5, col("n")) + 1
    pc.withColumn("rr", row_number().over(
          Window.orderBy(col("last_day"), col("o_custkey"))))
      .withColumn("rf", row_number().over(
          Window.orderBy(col("n_orders"), col("o_custkey"))))
      .withColumn("rm", row_number().over(
          Window.orderBy(col("spend_c"), col("o_custkey"))))
      .withColumn("n", n)
      .select(quintile(col("rr")).cast("long").as("r_q"),
        quintile(col("rf")).cast("long").as("f_q"),
        quintile(col("rm")).cast("long").as("m_q"),
        col("spend_c"))
      .groupBy("r_q", "f_q", "m_q")
      .agg(count(lit(1)).cast("long").as("n_customers"),
        sum("spend_c").cast("long").as("spend_c_sum"))
      .orderBy("r_q", "f_q", "m_q")
  }

  private val eRfmSql =
    """WITH pc AS (SELECT o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(MAX(o_orderdate) AS DATE))
           AS last_day,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS BIGINT) AS spend_c
       FROM orders GROUP BY 1),
       r AS (SELECT spend_c,
               ROW_NUMBER() OVER (ORDER BY last_day, o_custkey) AS rr,
               ROW_NUMBER() OVER (ORDER BY n_orders, o_custkey) AS rf,
               ROW_NUMBER() OVER (ORDER BY spend_c, o_custkey) AS rm,
               COUNT(*) OVER () AS n
             FROM pc),
       q AS (SELECT ((rr - 1) * 5) // n + 1 AS r_q,
                    ((rf - 1) * 5) // n + 1 AS f_q,
                    ((rm - 1) * 5) // n + 1 AS m_q, spend_c
             FROM r)
       SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
              CAST(m_q AS BIGINT) AS m_q,
              CAST(COUNT(*) AS BIGINT) AS n_customers,
              CAST(SUM(spend_c) AS BIGINT) AS spend_c_sum
       FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Multiplicative seasonal index by month-of-year: monthly revenue
    * aggregates per calendar month (year, month), months-of-year average
    * over the years they appear in, and the index is that average over
    * the grand monthly average in basis points —
    * idx_bp = ⌊10⁴·(rev_mo/n_mo)·(n_all/rev_all)⌋, rearranged to a single
    * integral division so nothing is ever a float. 12 output rows; the
    * cross-month totals are windows over the 12-row relation, so the
    * whole plan after the one calendar-month groupBy is constant-sized
    * at any corpus scale. */
  private def gSeasonalIdx(spark: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val monthly = Tables.orders(spark, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("ym"),
        month(col("o_orderdate")).as("mo"))
      .agg(sum((Exact.dec2(col("o_totalprice")) * 100).cast("long"))
        .cast("long").as("rev"))
    val s = monthly.groupBy("mo")
      .agg(count(lit(1)).cast("long").as("n_ym"),
        sum("rev").cast("long").as("rev_c"))
    val all = Window.partitionBy()
    s.withColumn("tot", sum("rev_c").over(all))
      .withColumn("n_tot", sum("n_ym").over(all))
      .select(col("mo").cast("long").as("month"), col("n_ym"), col("rev_c"),
        idiv(lit(10000) * col("rev_c").cast(D) * col("n_tot"),
          col("n_ym").cast(D) * col("tot")).cast("long").as("idx_bp"))
      .orderBy("month")
  }

  private val gSeasonalIdxSql =
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS ym,
            month(o_orderdate) AS mo,
            SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS rev
          FROM orders GROUP BY 1, 2),
       s AS (SELECT mo, CAST(COUNT(*) AS BIGINT) AS n_ym,
                    CAST(SUM(rev) AS BIGINT) AS rev_c
             FROM m GROUP BY 1),
       w AS (SELECT *, SUM(rev_c) OVER () AS tot, SUM(n_ym) OVER () AS n_tot
             FROM s)
       SELECT CAST(mo AS BIGINT) AS month, n_ym, rev_c,
              CAST((10000 * CAST(rev_c AS HUGEINT) * n_tot) //
                   (CAST(n_ym AS HUGEINT) * tot) AS BIGINT) AS idx_bp
       FROM w ORDER BY month"""

  /** Interval-overlap join, keyed: each order's "awaiting first
    * shipment" window [orderdate, min shipdate] (orders whose first
    * shipment predates the order are data noise and drop via s ≤ e),
    * then the pairs of SAME-CUSTOMER orders whose windows overlap, with
    * the overlap length in days.
    *
    * Scale shape: the overlap self-join is EQUI on the customer key —
    * both sides shuffle once on o_custkey and pairs only ever form
    * within a customer's order list (bounded per key), never across the
    * corpus; the range predicates apply inside the co-partition. The
    * keyless variant of this operator is the classic bucketed interval
    * join (map each interval to its covered time buckets, equi-join on
    * bucket, dedup) — same idea with a synthetic co-partition key; the
    * date-spine machinery in [[TimelineQ]] supplies the bucket spine
    * when that form is needed. */
  private def ijOrderOverlap(spark: SparkSession, d: String): DataFrame = {
    val iv = Tables.lineitem(spark, d)
      .groupBy("l_orderkey")
      .agg(min(to_date(col("l_shipdate"))).as("e"))
    val oi = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("s"))
      .join(iv, col("o_orderkey") === col("l_orderkey"))
      .filter(col("s") <= col("e"))
      .select("o_custkey", "o_orderkey", "s", "e")
    oi.alias("a").join(oi.alias("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
        col("a.o_orderkey") < col("b.o_orderkey") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.o_custkey").cast("long").as("custkey"),
        col("a.o_orderkey").as("o1"), col("b.o_orderkey").as("o2"),
        (datediff(least(col("a.e"), col("b.e")),
          greatest(col("a.s"), col("b.s"))) + 1).cast("long")
          .as("overlap_days"))
      .orderBy("custkey", "o1", "o2")
  }

  private val ijOrderOverlapSql =
    """WITH iv AS (SELECT l_orderkey, CAST(MIN(l_shipdate) AS DATE) AS e
         FROM lineitem GROUP BY 1),
       oi AS (SELECT o_custkey, o_orderkey,
                CAST(o_orderdate AS DATE) AS s, e
              FROM orders JOIN iv ON o_orderkey = l_orderkey
              WHERE CAST(o_orderdate AS DATE) <= e)
       SELECT CAST(a.o_custkey AS BIGINT) AS custkey,
              a.o_orderkey AS o1, b.o_orderkey AS o2,
              CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1
                AS BIGINT) AS overlap_days
       FROM oi a JOIN oi b
         ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        AND a.s <= b.e AND b.s <= a.e
       ORDER BY custkey, o1, o2"""

  // ------------------------------------------------------------------ iv_allen

  /** Allen's interval-algebra census over the same per-customer order
    * intervals as `ij_order_overlap` (placement → first ship): every
    * same-customer pair, put in CANONICAL order (by start, end,
    * orderkey — so the inverse relations collapse), classified into
    * the seven canonical Allen relations and counted. Where
    * ij_order_overlap measures HOW MUCH overlapping pairs overlap,
    * this names the temporal RELATIONSHIP of every pair — the full
    * interval algebra, not just intersection. The pair join is the
    * same key-bounded self-join (pairs ∝ per-customer order count²,
    * never global); the histogram is ≤ 7 rows. */
  private def ivAllen(spark: SparkSession, d: String): DataFrame = {
    val iv = Tables.lineitem(spark, d)
      .groupBy("l_orderkey")
      .agg(min(to_date(col("l_shipdate"))).as("e"))
    val oi = Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("s"))
      .join(iv, col("o_orderkey") === col("l_orderkey"))
      .filter(col("s") <= col("e"))
      .select("o_custkey", "o_orderkey", "s", "e")
    oi.alias("a").join(oi.alias("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") =!= col("b.o_orderkey") &&
          // canonical order: (s, e, key) — each unordered pair once
          (col("a.s") < col("b.s") ||
            (col("a.s") === col("b.s") && col("a.e") < col("b.e")) ||
            (col("a.s") === col("b.s") && col("a.e") === col("b.e") &&
              col("a.o_orderkey") < col("b.o_orderkey"))))
      .select(
        // equal-start cases FIRST: a zero-length a = [s,s] against
        // b = [s,e'] has a.e = b.s AND a.s = b.s — under the canonical
        // ordering that pair STARTS (shares the start, a ends first),
        // and testing meets before starts would misname it.
        when(col("a.s") === col("b.s") && col("a.e") === col("b.e"),
            "equals")
          .when(col("a.s") === col("b.s"), "starts")
          .when(col("a.e") < col("b.s"), "precedes")
          .when(col("a.e") === col("b.s"), "meets")
          .when(col("a.e") < col("b.e"), "overlaps")
          .when(col("a.e") === col("b.e"), "finished_by")
          .otherwise("contains").as("relation"))
      .groupBy("relation")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("relation")
  }

  private val ivAllenSql =
    """WITH iv AS (SELECT l_orderkey, CAST(MIN(l_shipdate) AS DATE) AS e
         FROM lineitem GROUP BY 1),
       oi AS (SELECT o_custkey, o_orderkey,
                CAST(o_orderdate AS DATE) AS s, e
              FROM orders JOIN iv ON o_orderkey = l_orderkey
              WHERE CAST(o_orderdate AS DATE) <= e),
       p AS (SELECT CASE
               WHEN a.s = b.s AND a.e = b.e THEN 'equals'
               WHEN a.s = b.s THEN 'starts'
               WHEN a.e < b.s THEN 'precedes'
               WHEN a.e = b.s THEN 'meets'
               WHEN a.e < b.e THEN 'overlaps'
               WHEN a.e = b.e THEN 'finished_by'
               ELSE 'contains' END AS relation
             FROM oi a JOIN oi b
               ON a.o_custkey = b.o_custkey
              AND a.o_orderkey <> b.o_orderkey
              AND (a.s < b.s
                   OR (a.s = b.s AND a.e < b.e)
                   OR (a.s = b.s AND a.e = b.e
                       AND a.o_orderkey < b.o_orderkey)))
       SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
       FROM p GROUP BY 1 ORDER BY 1"""

  /** l-diversity audit over (lang, 500-char length band) → source: the
    * release-safety complement of `t_kanon_audit` ([[Privacy]] scaladoc)
    * — one partial-agg groupBy, flag classes whose sensitive attribute
    * has fewer than 3 distinct values. */
  private def tLdivAudit(spark: SparkSession, d: String): DataFrame =
    Privacy.lDiversityAudit(
        Tables.documents(spark, d)
          .withColumn("chars_band", Privacy.band(col("n_chars"), 500L)),
        Seq("lang", "chars_band"), "source", l = 3L)
      .select(col("lang"), col("chars_band"), col("group_size"),
        col("l_distinct"), col("meets_l"))
      .orderBy("lang", "chars_band")

  private val tLdivAuditSql =
    """SELECT lang, (n_chars // 500) * 500 AS chars_band,
              CAST(COUNT(*) AS BIGINT) AS group_size,
              CAST(COUNT(DISTINCT source) AS BIGINT) AS l_distinct,
              CAST(CASE WHEN COUNT(DISTINCT source) >= 3 THEN 1 ELSE 0 END
                AS BIGINT) AS meets_l
       FROM documents GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Per-source quantile normalization of an integer quality score —
    * the cross-source calibration step before a GLOBAL quality
    * threshold: each document ranks within its source and maps to its
    * source-local decile, so "keep decile ≥ 8" selects the same
    * fraction from every source regardless of how the sources' raw
    * score distributions differ (a web crawl scores lower than curated
    * text everywhere; thresholding raw scores would silently drop the
    * crawl). Score = stopword hits per 1000 tokens (pure integers);
    * decile = ((rank−1)·10) div n_source + 1 with doc_id tie-break.
    * One window per source partition — co-partitioned by construction,
    * no global sort. */
  private def tQualityQnorm(spark: SparkSession, d: String): DataFrame = {
    import graft.text.Text
    val en = Text.langStopwords.head._2
    val b = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        idiv(Text.stopwordHits(col("text"), en).cast("long") * 1000,
          size(Text.tokens(col("text"))).cast("long")).as("score_i"))
    val bySrc = Window.partitionBy("source")
    b.withColumn("rn", row_number().over(
        bySrc.orderBy(col("score_i"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(bySrc))
      .select(col("doc_id"), col("source"), col("score_i"),
        (idiv((col("rn") - 1) * 10, col("n")) + 1).cast("long")
          .as("decile"))
      .orderBy("doc_id")
  }

  private val tQualityQnormSql = {
    val en = graft.text.Text.langStopwords.head._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH b AS (SELECT doc_id, source,
         (1000 * len(list_filter(string_split(text, ' '),
            x -> list_contains($en, x))))
           // len(string_split(text, ' ')) AS score_i
       FROM documents),
       r AS (SELECT *,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY score_i, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
             FROM b)
       SELECT doc_id, source, CAST(score_i AS BIGINT) AS score_i,
              CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile
       FROM r ORDER BY doc_id"""
  }

  /** 7-day rolling LOWER median of daily revenue — the robust trend
    * line a rolling mean can't give (one outlier day drags a mean for a
    * week; the median shrugs it off). Daily revenue aggregates first
    * (ONE groupBy to a |days|-sized relation), then the median comes
    * from an explicit sorted-frame pick: collect the 7-row frame, sort,
    * take element (len+1) div 2 — pure integers, deterministic in both
    * engines, and the window input is calendar-sized (~2.4k rows for
    * the 6½-year testdata) at ANY corpus scale, so the single-partition
    * ordered window is domain-bounded, not data-bounded. */
  private def gRollingMedian(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(spark, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((Exact.dec2(col("o_totalprice")) * 100).cast("long"))
        .cast("long").as("rev_c"))
    val frame = Window.orderBy("day").rowsBetween(-6, 0)
    daily.withColumn("win", collect_list("rev_c").over(frame))
      .select(col("day"), col("rev_c"),
        element_at(sort_array(col("win")),
          (idiv(size(col("win")) + 1, lit(2))).cast("int"))
          .cast("long").as("med7_c"))
      .orderBy("day")
  }

  private val gRollingMedianSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS BIGINT) AS rev_c
       FROM orders GROUP BY 1),
       w AS (SELECT day, rev_c,
               list(rev_c) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS win
             FROM daily)
       SELECT day, rev_c,
              CAST(list_sort(win)[(len(win) + 1) // 2] AS BIGINT) AS med7_c
       FROM w ORDER BY day"""

  /** Benford's-law first-digit audit over order totals (in cents): the
    * classic forensic screen for fabricated or artificially-generated
    * numeric columns — organic multiplicative data leads with digit 1
    * ~30.1% of the time; uniform synthetic data (like this testdata's
    * price column, which the audit duly flags) does not. Output: per
    * leading digit the count, observed share, the hardcoded Benford
    * expectation log₁₀(1+1/d) in basis points, and the absolute
    * deviation. One groupBy to a 9-row histogram; the total is a window
    * over those 9 rows, and the expectation table is a 9-row broadcast
    * literal — everything after the scan is constant-sized. */
  private def stBenford(spark: SparkSession, d: String): DataFrame = {
    val s = spark
    import s.implicits._
    val exp = Seq((1L, 3010L), (2L, 1760L), (3L, 1249L), (4L, 969L),
      (5L, 791L), (6L, 669L), (7L, 579L), (8L, 511L), (9L, 457L))
      .toDF("digit", "exp_bp")
    val h = Tables.orders(spark, d)
      .filter(col("o_totalprice") > 0)
      .select(substring((Exact.dec2(col("o_totalprice")) * 100)
        .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).cast("long").as("n"))
    h.withColumn("tot", sum("n").over(Window.partitionBy()))
      .join(broadcast(exp), Seq("digit"))
      .select(col("digit"), col("n"),
        idiv(col("n") * 10000, col("tot")).as("obs_bp"), col("exp_bp"),
        abs(idiv(col("n") * 10000, col("tot")) - col("exp_bp"))
          .as("dev_bp"))
      .orderBy("digit")
  }

  private val stBenfordSql =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
            AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
            AS BIGINT) AS digit
       FROM orders WHERE o_totalprice > 0),
       h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
             FROM d GROUP BY 1),
       w AS (SELECT digit, n, SUM(n) OVER () AS tot FROM h),
       exp_t(digit, exp_bp) AS (VALUES
         (1, 3010), (2, 1760), (3, 1249), (4, 969), (5, 791),
         (6, 669), (7, 579), (8, 511), (9, 457))
       SELECT w.digit, n, CAST((n * 10000) // tot AS BIGINT) AS obs_bp,
              CAST(exp_bp AS BIGINT) AS exp_bp,
              CAST(abs((n * 10000) // tot - exp_bp) AS BIGINT) AS dev_bp
       FROM w JOIN exp_t ON w.digit = exp_t.digit ORDER BY w.digit"""

  /** percent_rank and cume_dist as exact integers: per market segment,
    * each customer's account-balance percent rank
    * ((rank−1)·10⁴ div (n−1), ties sharing the rank) and cumulative
    * distribution (rows ≤ current value over n — the default RANGE
    * frame of an ordered COUNT window counts ties in, which IS the
    * cume_dist numerator). The float builtins compute the same ratios
    * as doubles; the integer forms make the threshold decisions
    * engine-exact. One window shuffle on the segment key. */
  private def w11PctRank(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"),
        (Exact.dec2(col("c_acctbal")) * 100).cast("long").as("bal_c"))
    val ordered = Window.partitionBy("segment").orderBy("bal_c")
    c.withColumn("rk", rank().over(ordered))
      .withColumn("cnt_le", count(lit(1)).over(ordered))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("segment")))
      .select(col("c_custkey"), col("segment"), col("bal_c"),
        when(col("n") === 1, 0L)
          .otherwise(idiv((col("rk") - 1) * 10000, col("n") - 1))
          .cast("long").as("pr_bp"),
        idiv(col("cnt_le") * 10000, col("n")).cast("long").as("cd_bp"))
      .orderBy("c_custkey")
  }

  private val w11PctRankSql =
    """WITH c AS (SELECT c_custkey, c_mktsegment AS segment,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
       FROM customer),
       w AS (SELECT *,
               RANK() OVER (PARTITION BY segment ORDER BY bal_c) AS rk,
               COUNT(*) OVER (PARTITION BY segment ORDER BY bal_c)
                 AS cnt_le,
               COUNT(*) OVER (PARTITION BY segment) AS n
             FROM c)
       SELECT c_custkey, segment, bal_c,
              CAST(CASE WHEN n = 1 THEN 0
                        ELSE ((rk - 1) * 10000) // (n - 1) END AS BIGINT)
                AS pr_bp,
              CAST((cnt_le * 10000) // n AS BIGINT) AS cd_bp
       FROM w ORDER BY c_custkey"""

  /** Seasonal-expectation outliers: each calendar month's revenue vs
    * what the seasonal index predicts for its month-of-year
    * (expected = grand-monthly-mean · idx div 10⁴), deviation in basis
    * points, flagged over 20%. The residual half of `g_seasonal_idx` —
    * the index explains the recurring shape; what it can't explain is
    * the anomaly list. Calendar-sized relations throughout after the
    * one monthly groupBy; the 12-row index table broadcasts into the
    * per-month join. */
  private def eSeasonalOutliers(spark: SparkSession, d: String)
      : DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val monthly = Tables.orders(spark, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("ym"),
        month(col("o_orderdate")).as("mo"))
      .agg(sum((Exact.dec2(col("o_totalprice")) * 100).cast("long"))
        .cast("long").as("rev"))
    val all = Window.partitionBy()
    val idx = monthly.groupBy("mo")
      .agg(count(lit(1)).cast("long").as("n_ym"),
        sum("rev").cast("long").as("rev_c"))
      .withColumn("tot", sum("rev_c").over(all))
      .withColumn("n_tot", sum("n_ym").over(all))
      .select(col("mo"),
        idiv(lit(10000) * col("rev_c").cast(D) * col("n_tot"),
          col("n_ym").cast(D) * col("tot")).cast("long").as("idx_bp"),
        idiv(col("tot"), col("n_tot")).cast("long").as("grand_c"))
    monthly.join(broadcast(idx), Seq("mo"))
      .withColumn("expected_c",
        idiv(col("grand_c") * col("idx_bp"), lit(10000L)).cast("long"))
      .select(to_date(col("ym")).as("ym"), col("mo").cast("long").as("month"),
        col("rev"), col("expected_c"),
        idiv(abs(col("rev") - col("expected_c")) * 10000,
          col("expected_c")).cast("long").as("dev_bp"))
      .withColumn("flag",
        when(col("dev_bp") > 2000, 1L).otherwise(0L))
      .orderBy("ym")
  }

  private val eSeasonalOutliersSql =
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS ym,
            month(o_orderdate) AS mo,
            CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
              AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1, 2),
       s AS (SELECT mo, CAST(COUNT(*) AS BIGINT) AS n_ym,
                    CAST(SUM(rev) AS BIGINT) AS rev_c
             FROM m GROUP BY 1),
       w AS (SELECT *, SUM(rev_c) OVER () AS tot, SUM(n_ym) OVER () AS n_tot
             FROM s),
       i AS (SELECT mo,
               CAST((10000 * CAST(rev_c AS HUGEINT) * n_tot) //
                    (CAST(n_ym AS HUGEINT) * tot) AS BIGINT) AS idx_bp,
               CAST(tot // n_tot AS BIGINT) AS grand_c
             FROM w),
       j AS (SELECT CAST(ym AS DATE) AS ym, CAST(m.mo AS BIGINT) AS month,
               rev, CAST((grand_c * idx_bp) // 10000 AS BIGINT)
                 AS expected_c
             FROM m JOIN i ON m.mo = i.mo)
       SELECT ym, month, rev, expected_c,
              CAST((abs(rev - expected_c) * 10000) // expected_c AS BIGINT)
                AS dev_bp,
              CAST(CASE WHEN (abs(rev - expected_c) * 10000) // expected_c
                             > 2000
                        THEN 1 ELSE 0 END AS BIGINT) AS flag
       FROM j ORDER BY ym"""

  def queries: Seq[Q] = Seq(
    Q("e_rfm", eRfm, Some(eRfmSql)),
    Q("e_seasonal_outliers", eSeasonalOutliers, Some(eSeasonalOutliersSql)),
    Q("w11_pct_rank", w11PctRank, Some(w11PctRankSql)),
    Q("g_rolling_median", gRollingMedian, Some(gRollingMedianSql)),
    Q("st_benford", stBenford, Some(stBenfordSql)),
    Q("t_quality_qnorm", tQualityQnorm, Some(tQualityQnormSql)),
    Q("g_seasonal_idx", gSeasonalIdx, Some(gSeasonalIdxSql)),
    Q("ij_order_overlap", ijOrderOverlap, Some(ijOrderOverlapSql)),
    Q("iv_allen", ivAllen, Some(ivAllenSql)),
    Q("t_ldiv_audit", tLdivAudit, Some(tLdivAuditSql)))
}
