package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact._

/** Core relational operator coverage (SURVEY §2.1–§2.6) re-expressed over
  * the driver's TPC-H-ish testdata.
  *
  * Operator ids in query names refer to SURVEY.md §2's inventory of the
  * reference (`akin11235/unicargo-medallion-data-pipeline`):
  * S* sources/sinks, P* projection/filter/cleaning, J* joins,
  * A* aggregates, W* windows, O* sorts/limits.
  *
  * Scale notes (100 TB design):
  *  - every query is a declarative DataFrame plan: filters/projections push
  *    to the parquet scan, aggregates run partial+final with map-side
  *    combine, small sides of joins are broadcast;
  *  - ORDER BY is applied on already-reduced outputs (group counts, top-k),
  *    never on the raw fact table, except where the query semantics demand
  *    it — so the global sorts touch KBs, not TBs.
  */
object Relational extends QueryPack {

  /** S1/S2 + P1/P4 — scan with predicate pushdown + column pruning
    * (reference: schema-enforced reads `etl_operations.py:4-10`, cleanse
    * filters `02_silver_unicargo_create_fact_flights.ipynb:42-65`). */
  private def s1ScanFilterProject(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate").cast("date").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  private val s1Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       CAST(l_shipdate AS DATE) AS ship_date
       FROM lineitem
       WHERE l_quantity > 45 AND l_discount >= 0.05
       ORDER BY l_orderkey, l_linenumber"""

  /** A1–A5,A7 — TPC-H-Q1-shaped multi-aggregate (reference: gold groupBy/agg
    * blocks, e.g. `03_gold_unikargo_01_daily_analytics.ipynb:72-78`).
    * Exact decimal sums → bit-stable doubles (see [[graft.util.Exact]]). */
  private def q1Agg(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("count_order"),
        sumExact(col("l_quantity")).as("sum_qty"),
        sumExact(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        avgExact(col("l_quantity")).as("avg_qty"),
        avgExact(col("l_extendedprice")).as("avg_price"),
        avgExact(col("l_discount")).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        stddevExact(col("l_quantity")).as("std_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       SQRT((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE))
            / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0))) AS std_qty
       FROM lineitem
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** J1/J2 — equi inner join fact↔dim then aggregate (reference:
    * `02_silver_unicargo_create_fact_flights.ipynb:218-247`). customer is
    * small → broadcast hash join, no shuffle of orders on the build side. */
  private def j1JoinAgg(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .join(broadcast(Tables.customer(spark, d)),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("order_count"),
        sumExact(col("o_totalprice")).as("total_revenue"),
        avgExact(col("o_totalprice")).as("avg_order_value"))
      .orderBy("c_mktsegment")

  private val j1Sql =
    """SELECT c_mktsegment,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_order_value
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment
       ORDER BY c_mktsegment"""

  /** J5/J6 — USING-style same-name key join (reference gold notebooks,
    * `03_gold_unikargo_01_daily_analytics.ipynb:68-69`): key column is
    * deduplicated in the output. */
  private def j5UsingJoin(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("orderkey"), col("l_quantity"))
    val ord = Tables.orders(spark, d)
      .select(col("o_orderkey").as("orderkey"), col("o_orderstatus"))
    li.join(ord, Seq("orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("line_count"),
        sumExact(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  private val j5Sql =
    """SELECT o_orderstatus, COUNT(*) AS line_count,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderstatus
       ORDER BY o_orderstatus"""

  /** J8 — left anti join (referential-integrity orphan check, reference
    * `02_silver_unicargo_create_fact_flights.ipynb:435-444`): parts never
    * shipped in near-full quantity. */
  private def j8AntiJoin(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .join(Tables.lineitem(spark, d).filter(col("l_quantity") >= 48),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")

  private val j8Sql =
    """SELECT p_partkey, p_name, p_brand FROM part
       WHERE NOT EXISTS (SELECT 1 FROM lineitem
                         WHERE l_partkey = p_partkey AND l_quantity >= 48)
       ORDER BY p_partkey"""

  /** J9 — left outer join with null-producing side (reference
    * `…fact_flights.ipynb:128-140`), plus P8-style null fill downstream. */
  private def j9LeftJoin(spark: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(spark, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, d)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("c_custkey")
  }

  private val j9Sql =
    """SELECT c_custkey, c_mktsegment, COALESCE(n, 0) AS n_orders
       FROM customer LEFT JOIN
         (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) t
         ON c_custkey = o_custkey
       ORDER BY c_custkey"""

  /** J11 — FULL OUTER join (engine-completeness: the one join type the
    * other j* queries don't cover): 1995's daily order counts against
    * daily ship counts — each side contributes days the other lacks, so
    * both null-producing directions are exercised. Coalesced key +
    * zero-filled measures; one sort-merge join on the day key. */
  private def j11FullOuter(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
      .groupBy(col("o_orderdate").cast("date").as("od"))
      .agg(count(lit(1)).as("n_ordered"))
    val shp = Tables.lineitem(spark, d)
      .filter(col("l_shipdate").between("1995-01-01", "1995-12-31"))
      .groupBy(col("l_shipdate").cast("date").as("sd"))
      .agg(count(lit(1)).as("n_shipped"))
    ord.join(shp, col("od") === col("sd"), "full_outer")
      .select(coalesce(col("od"), col("sd")).as("day"),
        coalesce(col("n_ordered"), lit(0L)).as("n_ordered"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
      .orderBy("day")
  }

  private val j11Sql =
    """WITH ord AS (SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS n_ordered
              FROM orders
              WHERE o_orderdate BETWEEN '1995-01-01' AND '1995-12-31'
              GROUP BY 1),
       shp AS (SELECT CAST(l_shipdate AS DATE) AS sd, COUNT(*) AS n_shipped
              FROM lineitem
              WHERE l_shipdate BETWEEN '1995-01-01' AND '1995-12-31'
              GROUP BY 1)
       SELECT COALESCE(od, sd) AS day,
              COALESCE(n_ordered, 0) AS n_ordered,
              COALESCE(n_shipped, 0) AS n_shipped
       FROM ord FULL OUTER JOIN shp ON od = sd
       ORDER BY day"""

  /** A6/A7 — conditional counts + derived rates (reference cancelled/delayed
    * counters, `03_gold_unikargo_01_daily_analytics.ipynb:75-78`). Integer
    * sums then a single double division → bit-stable. */
  private def a6CondRates(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"))
      .withColumn("finished_rate",
        col("n_finished") * lit(100.0) / col("n_orders"))
      .orderBy("o_orderpriority")

  private val a6Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 100.0 / COUNT(*) AS finished_rate
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** A8/A10 — exact distinct counts (reference `countDistinct` usages,
    * `03_gold_unikargo_03_route_analytics.ipynb:78-109`). At 100 TB these
    * become approx_count_distinct; exact here because the oracle is exact. */
  private def a8CountDistinct(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  private val a8Sql =
    """SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_lines
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** A9 — two-level aggregation (reference flights/aircraft/day →
    * per-airline, `03_gold_unikargo_07_operational_efficiency_analytics
    * .ipynb:70-76`): orders per customer, then stats per market segment.
    * Level-1 output is already partitioned by the level-2 join key's
    * source table, so the second shuffle moves only 1.5k rows/SF. */
  private def a9TwoLevel(spark: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(spark, d)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, d)
      .join(perCust, col("c_custkey") === col("o_custkey"), "inner")
      .groupBy("c_mktsegment")
      .agg(
        sum(col("n_orders")).as("total_orders"),
        max(col("n_orders")).as("max_orders_per_cust"),
        countDistinct(col("c_custkey")).as("n_customers"),
        (sum(col("n_orders")).cast("double") / countDistinct(col("c_custkey")))
          .as("avg_orders_per_cust"))
      .orderBy("c_mktsegment")
  }

  private val a9Sql =
    """SELECT c_mktsegment,
       CAST(SUM(n) AS BIGINT) AS total_orders,
       MAX(n) AS max_orders_per_cust,
       COUNT(DISTINCT c_custkey) AS n_customers,
       CAST(SUM(n) AS DOUBLE) / COUNT(DISTINCT c_custkey) AS avg_orders_per_cust
       FROM customer JOIN
         (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) t
         ON c_custkey = o_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** W1 — surrogate-key assignment via global row_number (reference dim SK,
    * `02_silver_unicargo_create_dim_airlines.ipynb:103`). Acceptable ONLY
    * for small dims (this single-partition sort is the documented scale
    * trap, SURVEY §4); the scalable path is [[graft.silver.SurrogateKeys]].
    */
  private def w1SurrogateKey(spark: SparkSession, d: String): DataFrame =
    Tables.supplier(spark, d)
      .withColumn("supplier_sk",
        row_number().over(Window.orderBy(col("s_name"), col("s_suppkey")))
          .cast("long"))
      .select("supplier_sk", "s_suppkey", "s_name", "s_nationkey")
      .orderBy("supplier_sk")

  private val w1Sql =
    """SELECT ROW_NUMBER() OVER (ORDER BY s_name, s_suppkey) AS supplier_sk,
       s_suppkey, s_name, s_nationkey
       FROM supplier ORDER BY supplier_sk"""

  /** W2 — 7-row rolling frame over a pre-aggregated daily series
    * (reference 7-day rolling OTP, `03_gold_unikargo_07_…ipynb:98-108`).
    * The window runs on the ~2.5k-row daily aggregate, not the fact table,
    * so the unpartitioned ORDER BY is cheap at any fact scale. Rolling sums
    * stay decimal inside the frame → exact. */
  private def w2Rolling(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.lineitem(spark, d)
      .groupBy(col("l_shipdate").cast("date").as("ship_date"))
      .agg(sum(dec2(col("l_extendedprice"))).as("rev_dec"),
        count(lit(1)).as("n_lines"))
    val w = Window.orderBy("ship_date").rowsBetween(-6, 0)
    daily.select(
        col("ship_date"),
        col("rev_dec").cast("double").as("daily_rev"),
        sum(col("rev_dec")).over(w).cast("double").as("rev_7d"),
        sum(col("n_lines")).over(w).as("lines_7d"))
      .orderBy("ship_date")
  }

  private val w2Sql =
    """WITH daily AS (
         SELECT CAST(l_shipdate AS DATE) AS ship_date,
                SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec,
                COUNT(*) AS n_lines
         FROM lineitem GROUP BY 1)
       SELECT ship_date,
              CAST(rev_dec AS DOUBLE) AS daily_rev,
              CAST(SUM(rev_dec) OVER (ORDER BY ship_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d,
              CAST(SUM(n_lines) OVER (ORDER BY ship_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS lines_7d
       FROM daily ORDER BY ship_date"""

  /** W3 — grand-total window → percentage-of-total (reference
    * `03_gold_unikargo_06_delay_analytics.ipynb:80`). Runs on the tiny
    * grouped output (one row per flag), so the single-partition window is
    * free. */
  private def w3PctOfTotal(spark: SparkSession, d: String): DataFrame = {
    val grouped = Tables.lineitem(spark, d)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_lines"))
    grouped.select(
        col("l_returnflag"), col("n_lines"),
        (col("n_lines") * lit(100.0) /
          sum(col("n_lines")).over(Window.partitionBy())).as("pct_of_total"))
      .orderBy("l_returnflag")
  }

  private val w3Sql =
    """SELECT l_returnflag, COUNT(*) AS n_lines,
       COUNT(*) * 100.0 / SUM(COUNT(*)) OVER () AS pct_of_total
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** P6 + O2/O4 — post-aggregation HAVING + desc sort + top-k (reference
    * `03_gold_unikargo_03_route_analytics.ipynb:80-131`). Top-k compiles to
    * TakeOrderedAndProject: each partition keeps k rows, driver merges —
    * no global sort of the aggregate. Tie-break on the unique key makes the
    * limit deterministic. */
  private def o4TopK(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sumExact(col("o_totalprice")).as("revenue"))
      .filter(col("n_orders") >= 5)
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(10)

  private val o4Sql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM orders GROUP BY o_custkey
       HAVING COUNT(*) >= 5
       ORDER BY revenue DESC, o_custkey ASC LIMIT 10"""

  /** P7 — key-subset deduplication (reference `dropDuplicates([subset])`,
    * `02_silver_unicargo_create_fact_flights.ipynb:65`). Projected to the
    * dedup key so survivor choice is deterministic; at scale this is a
    * hash-shuffle on the key, same as groupBy. */
  private def p7Dedup(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select("user_id", "event_type")
      .dropDuplicates(Seq("user_id", "event_type"))
      .orderBy("user_id", "event_type")

  private val p7Sql =
    """SELECT DISTINCT user_id, event_type FROM events
       ORDER BY user_id, event_type"""

  override def queries: Seq[Q] = Seq(
    Q("s1_scan_filter_project", s1ScanFilterProject, Some(s1Sql)),
    Q("q1_agg", q1Agg, Some(q1Sql)),
    Q("j1_join_agg", j1JoinAgg, Some(j1Sql)),
    Q("j5_using_join", j5UsingJoin, Some(j5Sql)),
    Q("j8_anti_join", j8AntiJoin, Some(j8Sql)),
    Q("j9_left_join", j9LeftJoin, Some(j9Sql)),
    Q("j11_full_outer", j11FullOuter, Some(j11Sql)),
    Q("a6_cond_rates", a6CondRates, Some(a6Sql)),
    Q("a8_count_distinct", a8CountDistinct, Some(a8Sql)),
    Q("a9_two_level", a9TwoLevel, Some(a9Sql)),
    Q("w1_surrogate_key", w1SurrogateKey, Some(w1Sql)),
    Q("w2_rolling", w2Rolling, Some(w2Sql)),
    Q("w3_pct_of_total", w3PctOfTotal, Some(w3Sql)),
    Q("o4_topk", o4TopK, Some(o4Sql)),
    Q("p7_dedup", p7Dedup, Some(p7Sql)))
}
