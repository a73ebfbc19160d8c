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

  /** Q14 shape — promo revenue share: lineitem⋈part with the small dim
    * broadcast, one ship-month window, conditional (CASE) aggregation.
    * The ratio is computed double÷double FROM the two exact decimal sums,
    * so both engines produce the identical IEEE result. At scale the part
    * dim broadcasts (no shuffle of lineitem) and the month filter is
    * pushed to the parquet scan. */
  private def q14Promo(spark: SparkSession, d: String): DataFrame = {
    val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= "1997-09-01" && col("l_shipdate") < "1997-10-01")
      .join(broadcast(Tables.part(spark, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0)))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  private val q14Sql =
    """SELECT promo_revenue, total_revenue,
              100.0 * promo_revenue / total_revenue AS promo_pct
       FROM (SELECT
               CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                             ELSE 0 END) AS DOUBLE) AS promo_revenue,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE l_shipdate >= TIMESTAMP '1997-09-01'
               AND l_shipdate < TIMESTAMP '1997-10-01')"""

  /** Q17 shape — small-quantity revenue: the correlated-aggregate-subquery
    * pattern (lines with quantity below 20% of their part's average),
    * planned Spark-first as agg-then-rejoin: the per-part average is ONE
    * aggregate over the filtered fact, re-joined on partkey — at 100 TB
    * both sides shuffle-partition on l_partkey and AQE broadcasts the
    * per-part averages (|parts| rows) when they fit. The average is
    * derived from an exact decimal sum so the 0.2×avg threshold is
    * bit-identical across engines. */
  private def q17SmallQty(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .join(broadcast(
        Tables.part(spark, d).filter(col("p_brand") === "Brand#23")
          .select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
        .as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sumExact(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  private val q17Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                AS avg_yearly,
              COUNT(*) AS n_lines
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN (SELECT l_partkey AS a_partkey,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(*) AS avg_qty
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE p_brand = 'Brand#23'
             GROUP BY 1) a ON l_partkey = a_partkey
       WHERE p_brand = 'Brand#23'
         AND l_quantity < 0.2 * avg_qty"""

  /** Q19 shape — disjunctive multi-attribute predicates spanning both
    * join sides: three (brand, size-range, quantity-range) arms OR'd
    * together. Catalyst extracts the common join key (partkey equi join,
    * part broadcast) and evaluates the residual disjunction post-join;
    * the per-side conjuncts that appear in every arm would be pushed to
    * the scans. */
  private def q19Disjunct(spark: SparkSession, d: String): DataFrame = {
    val arm1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d)), col("l_partkey") === col("p_partkey"))
      .filter(arm1 || arm2 || arm3)
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val q19Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30)"""

  /** Q22 shape — idle rich customers: a global scalar aggregate (average
    * positive balance) gates the detail rows, plus a LEFT ANTI join
    * against recent orders (customers with no order since 2000 — every
    * testdata customer has SOME order, so the classic "never ordered"
    * arm would be vacuously empty). The scalar is a one-row DataFrame
    * cross-joined in (broadcast — no driver collect); the anti join
    * shuffles only the filtered custkeys. */
  private def q22IdleCust(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1)))
        .as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, d)
          .filter(col("o_orderdate") >= "2000-01-01").select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sumExact(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q22Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_cust,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
       FROM customer c
       WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                 / COUNT(*)
                          FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c.c_custkey
                           AND o_orderdate >= TIMESTAMP '2000-01-01')
       GROUP BY 1 ORDER BY 1"""

  /** Q7 shape — two-nation trade volume: the nation dim plays TWO roles
    * (supplier side and customer side) under different aliases, with a
    * symmetric pair predicate and per-year revenue.
    *
    * The pair disjunction spans both join branches, so Catalyst cannot
    * push it below the fact joins on its own; written naively, lineitem
    * shuffles through supplier, orders, and customer in full before a
    * ~99%-selective filter. Here the single-side implication of the
    * disjunction (each side's nation ∈ {N1,N2}) is derived by hand and
    * applied to the broadcast nation dims BEFORE they touch a fact:
    * lineitem ⋈ broadcast(two-nation suppliers) prunes the fact with no
    * shuffle, orders ⋈ two-nation customers prunes the other branch, and
    * only the residual pair disjunction (drops the (N1,N1)/(N2,N2)
    * combos) remains above the one surviving fact⋈fact shuffle. */
  private def q7Volume(spark: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = Tables.nation(spark, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, d).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, d)
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(spark, d)
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .select(col("c_custkey"), col("cust_nation"))
    // orders is pruned by the customer branch before meeting lineitem;
    // AQE may turn this into a broadcast at small SF, while at scale it
    // stays a shuffle join over the ~2/|nation| surviving fraction.
    val ord = Tables.orders(spark, d)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(spark, d)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(year(l_shipdate) AS INT) AS l_year,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
              COUNT(*) AS n_lines
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Q21 shape — sole-problem suppliers (the testdata has no
    * receipt/commit dates, so "problem" = returned lines): a supplier
    * qualifies per order when the order has OTHER suppliers (the EXISTS
    * arm) but none of THEM returned (the NOT EXISTS arm — the oracle SQL
    * states both correlated subqueries literally). The Spark plan
    * collapses both probes into ONE pass: aggregate (orderkey, suppkey)
    * pairs once with a has-return flag, then per-order window counts —
    * EXISTS ⟺ n_supp > 1, NOT EXISTS ⟺ n_returning = 1 (only self).
    * One hash shuffle on orderkey serves the aggregate AND both windows,
    * vs three for the literal semi/anti-join formulation. At sf0.1 the
    * shared pair-aggregate dominates, so the measured gain is ~12%
    * (1.24s vs 1.41s isolated); the eliminated shuffles are the part
    * that grows with data, which is what matters at 100 TB. */
  private def q21SoleProblem(spark: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_returning", sum(col("has_r")).over(w))
      .filter(col("has_r") === 1 && col("n_supp") > 1 && col("n_returning") === 1)
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("suppkey"))
      .limit(20)
  }

  private val q21Sql =
    """WITH r AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                  WHERE l_returnflag = 'R'),
       a AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
       SELECT r.l_suppkey AS suppkey, COUNT(*) AS n_orders
       FROM r
       WHERE EXISTS (SELECT 1 FROM a
                     WHERE a.l_orderkey = r.l_orderkey
                       AND a.l_suppkey <> r.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM r r2
                         WHERE r2.l_orderkey = r.l_orderkey
                           AND r2.l_suppkey <> r.l_suppkey)
       GROUP BY 1 ORDER BY n_orders DESC, suppkey LIMIT 20"""

  /** Q8 shape — national market share: the deepest join in the suite
    * (lineitem through part, supplier, orders, customer, nation ×2,
    * region — 7 relations), with a conditional-share aggregate: NATION_5
    * suppliers' fraction of PROMO-part revenue sold into EUROPE, per
    * order year. Every dimension side broadcasts; the share divides two
    * exact decimal sums in double. */
  private def q8MarketShare(spark: SparkSession, d: String): DataFrame = {
    val rev = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d).filter(col("p_type") === "PROMO")
        .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
        col("c_nationkey") === col("cn_key"))
      .join(broadcast(Tables.region(spark, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables.nation(spark, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0)))
          .cast("double").as("nation_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
      .orderBy("o_year")
  }

  private val q8Sql =
    """SELECT o_year, nation_revenue, total_revenue,
              nation_revenue / total_revenue AS mkt_share
       FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                             THEN CAST(l_extendedprice AS DECIMAL(18,2))
                                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                             ELSE 0 END) AS DOUBLE) AS nation_revenue,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS total_revenue
             FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
             WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
             GROUP BY 1)
       ORDER BY o_year"""

  /** Q9 shape — product-line profit by nation and year (the testdata has
    * no partsupp, so unit cost is the part's retail price — same join
    * topology and arithmetic shape as the official query). Profit =
    * Σ(revenue − cost·qty) in exact decimals; the p_name filter prunes
    * the broadcast part side before the fact join. */
  private def q9Profit(spark: SparkSession, d: String): DataFrame = {
    val profit = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))) -
      dec2(col("p_retailprice")) * dec2(col("l_quantity"))
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d).filter(col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(profit).cast("double").as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       - CAST(p_retailprice AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit,
              COUNT(*) AS n_lines
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%red%'
       GROUP BY 1, 2 ORDER BY nation, o_year DESC"""

  // ───── partsupp family (q2 / q11 / q15 / q16 / q20 shapes) ─────
  //
  // The testdata ships no partsupp table, so the engine derives one
  // deterministically from part × {0..3} — TPC-H's four-suppliers-per-part
  // shape — with modular-arithmetic availqty and integer-cent supply cost.
  // The DuckDB oracles replay the identical derivation (psCte), so both
  // engines query the same relation; all comparisons stay in exact
  // integer/decimal arithmetic. The supplier count enters as a broadcast
  // one-row aggregate (no driver collect), exactly like q22's scalar.
  // The four per-part suppkeys (i·13 mod |S|) are distinct for every
  // supplier count whose gcd with 13 is 1 — true at both test scales.

  private def partsupp(spark: SparkSession, d: String): DataFrame = {
    val nSupp = broadcast(Tables.supplier(spark, d).agg(count(lit(1)).as("n_supp")))
    val quads = broadcast(spark.range(4).toDF("i"))
    Tables.part(spark, d).select("p_partkey")
      .crossJoin(quads).crossJoin(nSupp)
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 7 + col("i") * 13) % col("n_supp")).as("ps_suppkey"),
        ((col("p_partkey") * 17 + col("i") * 31) % 9999 + 1).as("ps_availqty"),
        ((col("p_partkey") * 29 + col("i") * 37) % 100000).as("ps_cost_cents"))
  }

  private val psCte =
    """ps AS (SELECT p_partkey AS ps_partkey,
              (p_partkey * 7 + i * 13) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey,
              (p_partkey * 17 + i * 31) % 9999 + 1 AS ps_availqty,
              (p_partkey * 29 + i * 37) % 100000 AS ps_cost_cents
         FROM part CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i))"""

  /** Q2 shape — min-cost supplier: for each qualifying part, the EUROPE
    * supplier(s) achieving the minimum supply cost. The correlated
    * min-subquery becomes a per-part aggregate joined back on
    * (partkey, cost) — two shuffles on the same key that AQE co-locates —
    * and the part filter semi-prunes partsupp BEFORE the min, which is
    * sound because the minimum is per-part. */
  private def q2MinCost(spark: SparkSession, d: String): DataFrame = {
    val euroSupp = broadcast(Tables.supplier(spark, d)
      .join(Tables.nation(spark, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    val parts = broadcast(Tables.part(spark, d)
      .filter(col("p_type") === "ECONOMY" && col("p_size") % 5 === 0)
      .select("p_partkey"))
    val cand = partsupp(spark, d)
      .join(parts, col("ps_partkey") === col("p_partkey"))
      .join(euroSupp, col("ps_suppkey") === col("s_suppkey"))
    val minCost = cand.groupBy(col("ps_partkey").as("mk"))
      .agg(min("ps_cost_cents").as("min_cents"))
    cand.join(minCost,
        col("ps_partkey") === col("mk") && col("ps_cost_cents") === col("min_cents"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("ps_partkey").as("p_partkey"),
        (col("ps_cost_cents").cast("double") / lit(100.0)).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
  }

  private val q2Sql =
    s"""WITH $psCte,
        eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
               FROM supplier JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE r_name = 'EUROPE'),
        cand AS (SELECT * FROM ps
                 JOIN part ON ps_partkey = part.p_partkey
                 JOIN eu ON ps_suppkey = s_suppkey
                 WHERE p_type = 'ECONOMY' AND p_size % 5 = 0)
        SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
               CAST(ps_cost_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS supply_cost
        FROM cand c
        WHERE ps_cost_cents = (SELECT MIN(ps_cost_cents) FROM cand m
                               WHERE m.ps_partkey = c.ps_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey"""

  /** Q11 shape — important stock: per-part inventory value held by one
    * region's suppliers, kept when a part's value exceeds 1/200 of the
    * regional total. The global total is a broadcast one-row aggregate;
    * the threshold compare is pure int64 (value·200 > total), exact in
    * both engines. */
  private def q11Stock(spark: SparkSession, d: String): DataFrame = {
    val euroSupp = broadcast(Tables.supplier(spark, d)
      .join(Tables.nation(spark, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")))
    val held = partsupp(spark, d)
      .join(euroSupp, col("ps_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("ps_partkey"),
        (col("ps_cost_cents") * col("ps_availqty")).as("v"))
    val total = held.agg(sum("v").as("total_v"))
    held.groupBy("ps_partkey").agg(sum("v").as("value_cents"))
      .crossJoin(broadcast(total))
      .filter(col("value_cents") * 200 > col("total_v"))
      .select(col("ps_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("ps_partkey"))
  }

  private val q11Sql =
    s"""WITH $psCte,
        held AS (SELECT ps_partkey, ps_cost_cents * ps_availqty AS v
                 FROM ps
                 WHERE ps_suppkey IN
                   (SELECT s_suppkey FROM supplier
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
                    WHERE r_name = 'EUROPE'))
        SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
        FROM held GROUP BY 1
        HAVING SUM(v) * 200 > (SELECT SUM(v) FROM held)
        ORDER BY value_cents DESC, ps_partkey"""

  /** Q15 shape — top supplier: quarterly revenue per supplier, keep the
    * max. The classic scalar-subquery-vs-max: the max enters as a
    * broadcast one-row aggregate and the tie-safe compare happens on the
    * EXACT decimal revenue (double only at the output edge). */
  private def q15TopSupplier(spark: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      .groupBy(col("l_suppkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .as("rev_exact"))
    rev.crossJoin(broadcast(rev.agg(max("rev_exact").as("max_rev"))))
      .filter(col("rev_exact") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_exact").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Sql =
    """WITH rev AS (SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_exact
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'
         GROUP BY 1)
       SELECT s_suppkey, s_name, CAST(rev_exact AS DOUBLE) AS total_revenue
       FROM rev JOIN supplier ON l_suppkey = s_suppkey
       WHERE rev_exact = (SELECT MAX(rev_exact) FROM rev)
       ORDER BY s_suppkey"""

  /** Q16 shape — parts/supplier relationship: distinct suppliers able to
    * supply each (brand, type, size), excluding negative-balance
    * suppliers (the testdata's stand-in for the comment-flagged ones).
    * Both exclusion filters prune broadcast sides before the count. */
  private def q16SupplierCnt(spark: SparkSession, d: String): DataFrame = {
    val okSupp = broadcast(Tables.supplier(spark, d)
      .filter(col("s_acctbal") >= 0).select(col("s_suppkey")))
    partsupp(spark, d)
      .join(okSupp, col("ps_suppkey") === col("s_suppkey"), "left_semi")
      .join(broadcast(Tables.part(spark, d)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
          .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("ps_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql =
    s"""WITH $psCte
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM ps JOIN part ON ps_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND ps_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q20 shape — potential part promotion: suppliers holding more than
    * half a year's shipped quantity of any red part. The nested
    * aggregate-vs-stock compare is pure integers (2·availqty > qty);
    * red parts semi-prune BOTH the fact scan and partsupp. */
  private def q20PromoSupp(spark: SparkSession, d: String): DataFrame = {
    val redParts = broadcast(Tables.part(spark, d)
      .filter(col("p_name").startsWith("red")).select("p_partkey"))
    val shipped = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("qty"))
    partsupp(spark, d)
      .join(redParts, col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") * 2 > col("qty"))
      .select("ps_suppkey").distinct()
      .join(broadcast(Tables.supplier(spark, d)
          .join(Tables.nation(spark, d), col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name", "n_name")),
        col("ps_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  private val q20Sql =
    s"""WITH $psCte,
        shipped AS (SELECT l_partkey, l_suppkey,
                           CAST(SUM(l_quantity) AS BIGINT) AS qty
                    FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                      AND l_shipdate < TIMESTAMP '1997-01-01'
                      AND l_partkey IN (SELECT p_partkey FROM part
                                        WHERE p_name LIKE 'red%')
                    GROUP BY 1, 2)
        SELECT DISTINCT s_suppkey, s_name, n_name
        FROM ps
        JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE ps_availqty * 2 > qty
        ORDER BY s_suppkey"""

  /** Q12 shape — shipping-mode priority audit. The testdata lineitem has
    * no shipmode/commitdate/receiptdate, so all three derive
    * deterministically from (l_orderkey, l_linenumber) — same replayed-
    * derivation contract as the partsupp family: mode = key-mod pick of
    * the seven TPC-H modes; commit = shipdate ±30 days; receipt =
    * shipdate + 1..30 days. The late-commit/receipt predicates then
    * select exactly like the official query, and the priority buckets
    * are conditional sums pushed into one scan-side aggregation. */
  private def q12ShipMode(spark: SparkSession, d: String): DataFrame = {
    val modes = Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
    val mode = modes.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (m, i)) =>
        when((col("l_orderkey") + col("l_linenumber")) % 7 === i, lit(m))
          .otherwise(acc)
    }
    val ship = col("l_shipdate").cast("date")
    val commit = date_add(ship,
      ((col("l_orderkey") * 3 + col("l_linenumber")) % 61 - 30).cast("int"))
    val receipt = date_add(ship,
      ((col("l_orderkey") * 5 + col("l_linenumber") * 7) % 30 + 1).cast("int"))
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), mode.as("l_shipmode"),
        ship.as("ship"), commit.as("commit"), receipt.as("receipt"))
      .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
        col("commit") < col("receipt") && col("ship") < col("commit") &&
        col("receipt") >= "1996-01-01" && col("receipt") < "1997-01-01")
      .join(Tables.orders(spark, d).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_shipmode")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
          .otherwise(1)).as("low_line_count"))
      .orderBy("l_shipmode")
  }

  private val q12Sql = {
    val modes = Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
    val modeCase = modes.zipWithIndex
      .map { case (m, i) => s"WHEN (l_orderkey + l_linenumber) % 7 = $i THEN '$m'" }
      .mkString("CASE ", " ", " END")
    s"""WITH li AS (
          SELECT l_orderkey, $modeCase AS l_shipmode,
                 CAST(l_shipdate AS DATE) AS ship,
                 CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey * 3 + l_linenumber) % 61 - 30 AS INTEGER)
                   AS commit,
                 CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey * 5 + l_linenumber * 7) % 30 + 1 AS INTEGER)
                   AS receipt
          FROM lineitem)
        SELECT l_shipmode,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM li JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipmode IN ('MAIL', 'SHIP')
          AND commit < receipt AND ship < commit
          AND receipt >= DATE '1996-01-01' AND receipt < DATE '1997-01-01'
        GROUP BY 1 ORDER BY 1"""
  }

  /** Q13 shape — customer order-count distribution: LEFT join with the
    * filter INSIDE the join condition (so no-recent-order customers
    * survive with count 0), then a second aggregation over the counts.
    * Both shuffles hash on their natural keys; the histogram is tiny. */
  private def q13CustDist(spark: SparkSession, d: String): DataFrame = {
    val perCust = Tables.customer(spark, d).select("c_custkey")
      .join(Tables.orders(spark, d)
          .filter(col("o_orderdate") >= "2000-01-01")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             FROM customer
             LEFT JOIN orders ON c_custkey = o_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01'
             GROUP BY c_custkey)
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC"""

  override def queries: Seq[Q] = Seq(
    Q("q2", q2MinCost, Some(q2Sql)),
    Q("q12", q12ShipMode, Some(q12Sql)),
    Q("q13", q13CustDist, Some(q13Sql)),
    Q("q11", q11Stock, Some(q11Sql)),
    Q("q15", q15TopSupplier, Some(q15Sql)),
    Q("q16", q16SupplierCnt, Some(q16Sql)),
    Q("q20", q20PromoSupp, Some(q20Sql)),
    Q("q7", q7Volume, Some(q7Sql)),
    Q("q8", q8MarketShare, Some(q8Sql)),
    Q("q9", q9Profit, Some(q9Sql)),
    Q("q21", q21SoleProblem, Some(q21Sql)),
    Q("q14", q14Promo, Some(q14Sql)),
    Q("q17", q17SmallQty, Some(q17Sql)),
    Q("q19", q19Disjunct, Some(q19Sql)),
    Q("q22", q22IdleCust, Some(q22Sql)),
    Q("q3_shipping_priority", q3ShippingPriority, Some(q3Sql)),
    Q("q4_order_priority", q4OrderPriority, Some(q4Sql)),
    Q("q6_revenue_forecast", q6Forecast, Some(q6Sql)),
    Q("q5_local_supplier", q5LocalSupplier, Some(q5Sql)),
    Q("q10_returned_items", q10ReturnedItems, Some(q10Sql)),
    Q("q18_large_orders", q18LargeOrders, Some(q18Sql)))
}
