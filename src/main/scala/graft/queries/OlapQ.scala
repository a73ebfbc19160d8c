package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact._

/** Multi-dimensional aggregation coverage the reference's gold layer stops
  * short of (SURVEY §2.4 lists rollup/cube/grouping-sets and percentiles
  * as absent): ROLLUP, CUBE, GROUPING SETS, and exact interpolated
  * percentiles — each a single shuffle in Spark (grouping-set expansion
  * happens map-side via the Expand operator, so partial aggregation still
  * applies before the exchange; this is the 100 TB-safe formulation, not
  * N separate groupBys unioned).
  *
  * Grouping indicators are `grouping(col)` cast to INT and every null
  * ordering is pinned on both sides so hashes match.
  */
object OlapQ extends QueryPack {

  /** ROLLUP (l_returnflag, l_linestatus): detail, per-flag subtotal, and
    * grand total in one pass. */
  private def olRollup(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"),
        sumExact(col("l_quantity")).as("sum_qty"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag"), col("l_linestatus"))

  private val olRollupSql =
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
              CAST(GROUPING(l_linestatus) AS INT) AS g_status,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY g_flag, g_status, l_returnflag, l_linestatus"""

  /** CUBE (l_returnflag, ship_year): all four grouping combinations in
    * one Expand + single shuffle. */
  private def olCube(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .withColumn("ship_year", year(col("l_shipdate")))
      .cube(col("l_returnflag"), col("ship_year"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("ship_year")).cast("int").as("g_year"),
        count(lit(1)).as("n"),
        sumExact(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("g_flag"), col("g_year"),
        col("l_returnflag"), col("ship_year"))

  private val olCubeSql =
    """SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year,
              CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
              CAST(GROUPING(year(l_shipdate)) AS INT) AS g_year,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
       FROM lineitem
       GROUP BY CUBE (l_returnflag, year(l_shipdate))
       ORDER BY g_flag, g_year, l_returnflag, ship_year"""

  /** GROUPING SETS ((flag), (status)): two independent summaries from one
    * scan + one shuffle (what two separate groupBys would cost double). */
  private def olGroupingSets(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        count(lit(1)).as("n"),
        sumExact(col("l_discount")).as("sum_disc"))
      .orderBy(col("g_flag"), col("l_returnflag"), col("l_linestatus"))

  private val olGroupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       ORDER BY g_flag, l_returnflag, l_linestatus"""

  /** Exact interpolated percentiles per return flag (Spark `percentile`
    * = DuckDB `quantile_cont`, both (n-1)·p linear interpolation); rounded
    * to 4dp to absorb cross-engine ulp drift in the interpolation
    * arithmetic. Exact percentile sorts each group — the scale path is
    * approx_percentile (t-digest, mergeable map-side), asserted within
    * tolerance in OlapSpec. */
  private def olPercentiles(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.95)"), 4).as("p95_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_price"))
      .orderBy("l_returnflag")

  private val olPercentilesSql =
    """SELECT l_returnflag,
              round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
              round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
              round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("ol_rollup", olRollup, Some(olRollupSql)),
    Q("ol_cube", olCube, Some(olCubeSql)),
    Q("ol_grouping_sets", olGroupingSets, Some(olGroupingSetsSql)),
    Q("ol_percentiles", olPercentiles, Some(olPercentilesSql)))
}
