package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.silver.Star
import graft.util.Exact._

/** Gold-layer analytics over the conformed star — the reference's eight
  * gold notebooks (12+ tables, `unicargo_etl/notebooks/03_gold/`)
  * re-expressed as named DataFrame programs over [[Star.factLineitem]].
  *
  * Every function takes the fact (so callers build it once and fan out,
  * like the reference's notebooks all reading the same silver fact) and
  * returns a small aggregate: gold tables are orders of magnitude smaller
  * than the fact, so the only fact-sized work is the shared groupBys —
  * windows and enrichment joins run on grouped output.
  */
object Analytics {

  /** Daily summary (reference `03_gold_unikargo_01_daily_analytics`):
    * per-day counts, exact sums, conditional rates. */
  def dailySummary(fact: DataFrame): DataFrame =
    fact.groupBy("ship_date")
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("customer_sk")).as("n_customers"),
        sumExact(col("quantity")).as("sum_qty"),
        sumExact(col("extended_price")).as("revenue"),
        sum(when(col("return_flag") === "R", 1).otherwise(0)).as("n_returned"),
        (sum(when(col("return_flag") === "R", 1).otherwise(0)) * lit(100.0) /
          count(lit(1))).as("return_rate"))
      .orderBy("ship_date")

  /** Weekly summary (reference weekly cells, `…01_daily_analytics
    * .ipynb:103-110`): ISO year×week grain with min/max extremes. */
  def weeklySummary(fact: DataFrame): DataFrame =
    fact.groupBy(
        year(col("ship_date")).as("year"),
        weekofyear(col("ship_date")).as("week"))
      .agg(
        count(lit(1)).as("n_lines"),
        sumExact(col("extended_price")).as("revenue"),
        min(col("quantity")).as("min_qty"),
        max(col("quantity")).as("max_qty"),
        stddevExact(col("quantity")).as("std_qty"))
      .orderBy("year", "week")

  /** Monthly summary (reference monthly trends): yyyy-MM grain. */
  def monthlySummary(fact: DataFrame): DataFrame =
    fact.groupBy(date_format(col("ship_date"), "yyyy-MM").as("year_month"))
      .agg(
        count(lit(1)).as("n_lines"),
        countDistinct(col("customer_sk")).as("n_customers"),
        sumExact(col("extended_price")).as("revenue"),
        avgExact(col("extended_price")).as("avg_price"))
      .orderBy("year_month")

  /** Quantity-distribution buckets with share-of-total (reference delay
    * buckets + grand-total window, `03_gold_unikargo_06_delay_analytics
    * .ipynb:68-80`). Window runs on ≤5 grouped rows. */
  def quantityBuckets(fact: DataFrame): DataFrame = {
    val bucketed = fact
      .withColumn("qty_bucket",
        when(col("quantity") <= 10, "0-10")
          .when(col("quantity") <= 25, "11-25")
          .when(col("quantity") <= 40, "26-40")
          .otherwise("41+"))
      .groupBy("qty_bucket")
      .agg(count(lit(1)).as("n_lines"),
        sumExact(col("extended_price")).as("revenue"))
    bucketed.select(col("qty_bucket"), col("n_lines"), col("revenue"),
        (col("n_lines") * lit(100.0) /
          sum(col("n_lines")).over(Window.partitionBy())).as("pct_of_lines"))
      .orderBy("qty_bucket")
  }

  /** 7-day rolling revenue per return-flag (reference 7-day rolling OTP
    * per airline, `03_gold_unikargo_07_…ipynb:98-108`): window over the
    * per-(flag, day) aggregate, partitioned by flag. */
  def rollingRevenue(fact: DataFrame): DataFrame = {
    val daily = fact.groupBy(col("return_flag"), col("ship_date"))
      .agg(sum(dec2(col("extended_price"))).as("rev_dec"))
    val w = Window.partitionBy("return_flag").orderBy("ship_date")
      .rowsBetween(-6, 0)
    daily.select(col("return_flag"), col("ship_date"),
        col("rev_dec").cast("double").as("daily_rev"),
        sum(col("rev_dec")).over(w).cast("double").as("rev_7d"))
      .orderBy("return_flag", "ship_date")
  }

  /** Build the fact once and materialize every gold table (the reference's
    * notebook-DAG equivalent, one action per table). */
  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    val fact = Star.factLineitem(spark, sfDir)
    Map(
      "daily_summary" -> dailySummary(fact),
      "weekly_summary" -> weeklySummary(fact),
      "monthly_summary" -> monthlySummary(fact),
      "quantity_buckets" -> quantityBuckets(fact),
      "rolling_revenue" -> rollingRevenue(fact))
  }
}
