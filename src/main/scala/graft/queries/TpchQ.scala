package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact._

/** TPC-H-shaped multi-join analytics — beyond the reference's 2-3-table
  * joins, these exercise 3-to-6-way join planning: mixed broadcast +
  * shuffle joins, AQE join-order/strategy selection, selective filters
  * pushed below the joins. Decimal-exact revenue math throughout.
  */
object TpchQ extends QueryPack {

  /** Q3 shape — shipping priority: 3-way join, pre-join filters on both
    * fact sides, revenue top-10. */
  private def q3ShippingPriority(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < "1998-01-01")
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > "1998-01-01")
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast("date").as("order_date"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  private val q3Sql =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY 1, 2
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q5 shape — local supplier volume: 6-way join through customer →
    * orders → lineitem → supplier → nation → region with the
    * same-nation constraint, revenue per nation. */
  private def q5LocalSupplier(spark: SparkSession, d: String): DataFrame =
    Tables.region(spark, d)
      .filter(col("r_name") === "ASIA")
      .join(Tables.nation(spark, d), col("r_regionkey") === col("n_regionkey"))
      .join(Tables.supplier(spark, d), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.lineitem(spark, d), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))

  private val q5Sql =
    """SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
       FROM region
       JOIN nation ON r_regionkey = n_regionkey
       JOIN supplier ON n_nationkey = s_nationkey
       JOIN lineitem ON s_suppkey = l_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       WHERE r_name = 'ASIA'
       GROUP BY 1 ORDER BY revenue DESC, n_name"""

  /** Q10 shape — returned-item reporting: 4-way join, return-flag filter,
    * per-customer revenue, top 20. */
  private def q10ReturnedItems(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_returned_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql =
    """SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_returned_lines
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON o_orderkey = l_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
       GROUP BY 1, 2, 3
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** Q18 shape — large-volume orders: a high-cardinality aggregate
    * (per-order quantity) feeds a SEMI-join filter on itself, then the
    * surviving orders re-join lineitem/customer for reporting. Exercises
    * the agg→semi-join→re-join planning pattern: the HAVING aggregate is
    * computed once and only qualifying orderkeys flow into the wide join
    * (at 100 TB the qualifying set is tiny, so AQE turns the re-join's
    * build side into a broadcast at runtime). */
  private def q18LargeOrders(spark: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, d)
      .groupBy("l_orderkey")
      .agg(sumExact(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    Tables.orders(spark, d)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        dec2(col("o_totalprice")).cast("double").as("total_price"),
        col("total_qty"))
      .orderBy(col("total_price").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       total_qty
       FROM orders
       JOIN (SELECT l_orderkey,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             FROM lineitem GROUP BY 1
             HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) big
         ON o_orderkey = l_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY total_price DESC, o_orderkey LIMIT 100"""

  /** Q6 shape — revenue forecast, run through the spark.sql() API over a
    * temp view (every other query uses the DataFrame DSL; this pins the
    * SQL entry point end-to-end: parsing, view resolution, and the same
    * decimal-exact discipline). Double literals are cast explicitly on
    * the oracle side too — DuckDB parses bare 0.05 as DECIMAL and a
    * DOUBLE-vs-DECIMAL comparison can flip boundary rows. */
  private def q6Forecast(spark: SparkSession, d: String): DataFrame = {
    Tables.lineitem(spark, d).createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                COUNT(*) AS n_lines
         FROM lineitem_v
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount >= CAST(0.05 AS DOUBLE)
           AND l_discount <= CAST(0.07 AS DOUBLE)
           AND l_quantity < 24""")
  }

  private val q6Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount >= CAST(0.05 AS DOUBLE)
         AND l_discount <= CAST(0.07 AS DOUBLE)
         AND l_quantity < 24"""

  /** Q4 shape — order-priority checking via LEFT SEMI join (the EXISTS
    * pattern): orders in a half-year with at least one RETURNED lineitem
    * (the testdata's late-ness signal — it has no commit/receipt dates),
    * counted per priority. Completes the join-type inventory under the
    * oracle gate (inner/left/anti are covered elsewhere; this is the
    * semi). Semi joins at scale shuffle only the probe side's keys and
    * short-circuit on first match — cheaper than a join+distinct. */
  private def q4OrderPriority(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-07-01")
      .join(Tables.lineitem(spark, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders o
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-07-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o.o_orderkey
                       AND l_returnflag = 'R')
       GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("q3_shipping_priority", q3ShippingPriority, Some(q3Sql)),
    Q("q4_order_priority", q4OrderPriority, Some(q4Sql)),
    Q("q6_revenue_forecast", q6Forecast, Some(q6Sql)),
    Q("q5_local_supplier", q5LocalSupplier, Some(q5Sql)),
    Q("q10_returned_items", q10ReturnedItems, Some(q10Sql)),
    Q("q18_large_orders", q18LargeOrders, Some(q18Sql)))
}
