package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Exact._

/** Scalar-function coverage (SURVEY §2.8) — the complete distinct-function
  * inventory of the reference: date/time extraction, string building
  * (concat/lpad), conditional bucketing (when/otherwise + isin), casts and
  * column arithmetic. All row-level single-op expressions, so whole-stage
  * codegen fuses them into the scan; no shuffle except the final
  * presentation sort on reduced output.
  */
object Functions extends QueryPack {

  /** Date/time functions (reference: flight_date synthesis + dim_date parts,
    * `02_silver_unicargo_create_fact_flights.ipynb:46-61`,
    * `02_silver_unicargo_create_dim_date.ipynb:85-108`). ISO day-of-week is
    * derived as ((dayofweek+5) % 7) + 1 — the same Monday=1 convention the
    * reference hand-adjusts at `…fact_flights.ipynb:418-424`. */
  private def fDatetime(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .select(
        col("o_orderkey"), col("order_date"),
        year(col("order_date")).as("yr"),
        month(col("order_date")).as("mo"),
        dayofmonth(col("order_date")).as("dom"),
        quarter(col("order_date")).as("qtr"),
        weekofyear(col("order_date")).as("iso_week"),
        (((dayofweek(col("order_date")) + lit(5)) % lit(7)) + lit(1)).as("iso_dow"),
        date_format(col("order_date"), "yyyy-MM").as("year_month"))
      .orderBy("o_orderkey")

  private val fDatetimeSql =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
       CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS mo,
       CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS dom,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
       CAST(isodow(CAST(o_orderdate AS DATE)) AS INT) AS iso_dow,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS year_month
       FROM orders ORDER BY o_orderkey"""

  /** String functions (reference ISO-date building via concat+lpad,
    * `…fact_flights.ipynb:48-58`). */
  private def fString(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .select(
        col("c_custkey"),
        concat(col("c_name"), lit("-"), col("c_mktsegment")).as("name_seg"),
        lpad(col("c_nationkey").cast("string"), 4, "0").as("nation_code"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_mktsegment"), "A", "@").as("seg_masked"))
      .orderBy("c_custkey")

  private val fStringSql =
    """SELECT c_custkey,
       c_name || '-' || c_mktsegment AS name_seg,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_code,
       substr(c_name, 1, 8) AS name_prefix,
       upper(c_mktsegment) AS seg_upper,
       lower(c_mktsegment) AS seg_lower,
       CAST(length(c_name) AS INT) AS name_len,
       regexp_replace(c_mktsegment, 'A', '@', 'g') AS seg_masked
       FROM customer ORDER BY c_custkey"""

  /** Conditional bucketing: when/otherwise chains + isin (reference delay
    * buckets `03_gold_unikargo_06_delay_analytics.ipynb:68-73`, season
    * buckets + isin `…05_time_based_analytics.ipynb:69-73`). Buckets feed a
    * groupBy so the output is small and order-stable. */
  private def fBuckets(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .withColumn("qty_bucket",
        when(col("l_quantity") <= 10, "0-10")
          .when(col("l_quantity") <= 25, "11-25")
          .when(col("l_quantity") <= 40, "26-40")
          .otherwise("41+"))
      .withColumn("season",
        when(month(col("l_shipdate")).isin(12, 1, 2), "Winter")
          .when(month(col("l_shipdate")).isin(3, 4, 5), "Spring")
          .when(month(col("l_shipdate")).isin(6, 7, 8), "Summer")
          .otherwise("Fall"))
      .groupBy("qty_bucket", "season")
      .agg(count(lit(1)).as("n_lines"),
        sumExact(col("l_extendedprice")).as("revenue"))
      .orderBy("qty_bucket", "season")

  private val fBucketsSql =
    """SELECT CASE WHEN l_quantity <= 10 THEN '0-10'
                   WHEN l_quantity <= 25 THEN '11-25'
                   WHEN l_quantity <= 40 THEN '26-40'
                   ELSE '41+' END AS qty_bucket,
              CASE WHEN month(l_shipdate) IN (12, 1, 2) THEN 'Winter'
                   WHEN month(l_shipdate) IN (3, 4, 5) THEN 'Spring'
                   WHEN month(l_shipdate) IN (6, 7, 8) THEN 'Summer'
                   ELSE 'Fall' END AS season,
              COUNT(*) AS n_lines,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Casts + column arithmetic (reference measure casts
    * `…fact_flights.ipynb:318-360`, arithmetic `…06_delay_analytics
    * .ipynb:104-112`). Row-level double ops are single IEEE operations —
    * deterministic across engines without the decimal detour. */
  private def fCastArith(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_quantity").cast("string").as("qty_str"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        (col("l_tax") + col("l_discount")).as("tax_plus_disc"),
        (col("l_quantity") > 25).cast("int").as("is_bulk"))
      .orderBy("l_orderkey", "l_linenumber")

  private val fCastArithSql =
    """SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INT) AS qty_int,
       CAST(CAST(l_quantity AS DECIMAL(18,1)) AS VARCHAR) AS qty_str,
       l_extendedprice * (1.0 - l_discount) AS net_price,
       l_extendedprice / l_quantity AS unit_price,
       l_tax + l_discount AS tax_plus_disc,
       CAST(l_quantity > 25 AS INT) AS is_bulk
       FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  /** O3 — custom-key sort via when-expression (reference season ordering,
    * `03_gold_unikargo_05_time_based_analytics.ipynb:82-86`). */
  private def o3CustomSort(spark: SparkSession, d: String): DataFrame = {
    val seasonRank = when(col("season") === "Winter", 1)
      .when(col("season") === "Spring", 2)
      .when(col("season") === "Summer", 3)
      .otherwise(4)
    Tables.lineitem(spark, d)
      .withColumn("season",
        when(month(col("l_shipdate")).isin(12, 1, 2), "Winter")
          .when(month(col("l_shipdate")).isin(3, 4, 5), "Spring")
          .when(month(col("l_shipdate")).isin(6, 7, 8), "Summer")
          .otherwise("Fall"))
      .groupBy("season")
      .agg(count(lit(1)).as("n_lines"))
      .withColumn("season_rank", seasonRank)
      .orderBy("season_rank")
  }

  private val o3Sql =
    """SELECT season, n_lines,
              CASE season WHEN 'Winter' THEN 1 WHEN 'Spring' THEN 2
                          WHEN 'Summer' THEN 3 ELSE 4 END AS season_rank
       FROM (
         SELECT CASE WHEN month(l_shipdate) IN (12, 1, 2) THEN 'Winter'
                     WHEN month(l_shipdate) IN (3, 4, 5) THEN 'Spring'
                     WHEN month(l_shipdate) IN (6, 7, 8) THEN 'Summer'
                     ELSE 'Fall' END AS season,
                COUNT(*) AS n_lines
         FROM lineitem GROUP BY 1) t
       ORDER BY season_rank"""

  override def queries: Seq[Q] = Seq(
    Q("f_datetime", fDatetime, Some(fDatetimeSql)),
    Q("f_string", fString, Some(fStringSql)),
    Q("f_buckets", fBuckets, Some(fBucketsSql)),
    Q("f_cast_arith", fCastArith, Some(fCastArithSql)),
    Q("o3_custom_sort", o3CustomSort, Some(o3Sql)))
}
