package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.silver.Star
import graft.util.Exact._

/** Remaining gold-notebook shapes (SURVEY §2.3 J6/J7, §2.4 A12, §2.6 O1)
  * and set operations (§2.7 — absent in the reference, included for
  * library completeness).
  */
object GoldQ extends QueryPack {

  /** J6 — aliased dimension join with qualified group-by columns
    * (reference `dim_date.alias("dd")` then group on `dd.day_of_week`,
    * `03_gold_unikargo_02_airline_performance.ipynb:121-123`). The date
    * dim is broadcast; grouping is on the dim attribute, not the fact key.
    */
  private def j6AliasedDimJoin(spark: SparkSession, d: String): DataFrame = {
    val dd = Star.dimDate(spark).alias("dd")
    Tables.orders(spark, d)
      .withColumn("order_date", col("o_orderdate").cast("date"))
      .join(broadcast(dd), col("order_date") === col("dd.full_date"), "inner")
      .groupBy(col("dd.day_of_week").as("day_of_week"),
        col("dd.day_name").as("day_name"))
      .agg(count(lit(1)).as("n_orders"),
        sumExact(col("o_totalprice")).as("revenue"))
      .orderBy("day_of_week")
  }

  private val j6Sql =
    """SELECT CAST(isodow(o_orderdate) AS INT) AS day_of_week,
       dayname(CAST(o_orderdate AS DATE)) AS day_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM orders GROUP BY 1, 2 ORDER BY day_of_week"""

  /** J7 + P6 + O1/O4 — post-aggregation enrichment joins ×2 then top-k
    * (reference route analytics: aggregate by route, then join origin and
    * destination airport dims onto the AGGREGATE,
    * `03_gold_unikargo_03_route_analytics.ipynb:111-131`). Joining dims
    * after the aggregate moves the join from |fact| rows to |groups| rows
    * — the 100 TB-correct order. */
  private def j7RouteEnrich(spark: SparkSession, d: String): DataFrame = {
    val routeAgg = Tables.lineitem(spark, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("n_shipments"),
        sumExact(col("l_extendedprice")).as("revenue"))
      .filter(col("n_shipments") >= 3)
    routeAgg
      .join(broadcast(Tables.part(spark, d).select(
        col("p_partkey"), col("p_name"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, d).select(
        col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_name"), col("p_brand"), col("s_name"),
        col("n_shipments"), col("revenue"))
      .orderBy(col("revenue").desc, col("p_name"), col("s_name"))
      .limit(20)
  }

  private val j7Sql =
    """SELECT p_name, p_brand, s_name, n_shipments, revenue FROM (
         SELECT l_partkey, l_suppkey, COUNT(*) AS n_shipments,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) >= 3) r
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       ORDER BY revenue DESC, p_name, s_name LIMIT 20"""

  /** A12 — whole-table scalar aggregate row (reference
    * `select(min(full_date), max(full_date))` verify cells). */
  private def a12ScalarMinmax(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(
        min(col("o_orderdate").cast("date")).as("first_order"),
        max(col("o_orderdate").cast("date")).as("last_order"),
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))

  private val a12Sql =
    """SELECT MIN(CAST(o_orderdate AS DATE)) AS first_order,
       MAX(CAST(o_orderdate AS DATE)) AS last_order,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
       FROM orders"""

  /** §2.7 — set operations (absent in the reference; engine-complete
    * here): nation keys present among customers vs suppliers. */
  private def u1Union(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(spark, d).select(col("s_nationkey").as("nationkey")))
      .distinct().orderBy("nationkey")

  private val u1Sql =
    """SELECT c_nationkey AS nationkey FROM customer
       UNION SELECT s_nationkey FROM supplier ORDER BY nationkey"""

  private def u2Intersect(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(spark, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  private val u2Sql =
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""

  private def u3Except(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d).select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(spark, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  private val u3Sql =
    """SELECT c_nationkey AS nationkey FROM customer
       EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey"""

  /** J-extension — the SALTED join under the correctness gate: the skew
    * mitigation ([[graft.etl.Skew.saltedJoin]]: hot keys split over
    * `salts` reducers, small side replicated ×salts) must produce results
    * identical to the plain join, so its oracle IS the plain SQL join.
    * The salt never reaches the output; the aggregate collapses the
    * per-salt partials. */
  private def j10SaltedJoin(spark: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(spark, d).select(
      col("l_suppkey").as("suppkey"), col("l_extendedprice"),
      col("l_orderkey"), col("l_linenumber"))
    val small = Tables.supplier(spark, d).select(
      col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.etl.Skew.saltedJoin(big, small, Seq("suppkey"), salts = 8,
        saltSource = Seq("l_orderkey", "l_linenumber"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        sumExact(col("l_extendedprice")).as("revenue"))
      .orderBy("s_nationkey")
  }

  private val j10Sql =
    """SELECT s_nationkey, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY 1 ORDER BY 1"""

  /** Schema-evolution union: two event projections with DIFFERENT columns
    * combined via unionByName(allowMissingColumns) — absent columns fill
    * with null, alignment is by NAME (positional union would silently
    * mis-pair). The aggregate then separates the two branches with
    * non-null counts. */
  private def u4ByName(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value").as("purchase_value"))
    clicks.unionByName(purchases, allowMissingColumns = true)
      .groupBy("user_id")
      .agg(count(col("click_value")).as("n_clicks"),
        sumExact(col("click_value")).as("click_total"),
        count(col("purchase_value")).as("n_purchases"),
        sumExact(col("purchase_value")).as("purchase_total"))
      .orderBy("user_id")
  }

  private val u4Sql =
    """SELECT user_id,
              COUNT(click_value) AS n_clicks,
              CAST(SUM(CAST(click_value AS DECIMAL(18,2))) AS DOUBLE) AS click_total,
              COUNT(purchase_value) AS n_purchases,
              CAST(SUM(CAST(purchase_value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_total
       FROM (SELECT user_id, value AS click_value FROM events
             WHERE event_type = 'click'
             UNION ALL BY NAME
             SELECT user_id, value AS purchase_value FROM events
             WHERE event_type = 'purchase')
       GROUP BY 1 ORDER BY 1"""

  /** Array aggregation made deterministic: collect_list's order is
    * partition-dependent, so the contract is sort_array BEFORE any
    * downstream use — here rendered to a CSV string so the oracle
    * compares a scalar. */
  private def a13ArrayAgg(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        concat_ws(",", sort_array(collect_list(col("o_orderkey"))))
          .as("order_keys"))
      .orderBy("o_custkey")

  private val a13Sql =
    """SELECT o_custkey, COUNT(*) AS n_orders,
              string_agg(CAST(o_orderkey AS VARCHAR), ','
                         ORDER BY o_orderkey) AS order_keys
       FROM orders GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("j6_aliased_dim_join", j6AliasedDimJoin, Some(j6Sql)),
    Q("j7_route_enrich", j7RouteEnrich, Some(j7Sql)),
    Q("j10_salted_join", j10SaltedJoin, Some(j10Sql)),
    Q("a12_scalar_minmax", a12ScalarMinmax, Some(a12Sql)),
    Q("a13_arrayagg", a13ArrayAgg, Some(a13Sql)),
    Q("u1_union", u1Union, Some(u1Sql)),
    Q("u2_intersect", u2Intersect, Some(u2Sql)),
    Q("u3_except", u3Except, Some(u3Sql)),
    Q("u4_byname", u4ByName, Some(u4Sql)))
}
