package graft.silver

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Cleaning
import graft.io.Sources
import graft.util.Exact._

/** Surrogate-key strategies (SURVEY §2.5 W1/W4 + §7.3's scalable
  * alternative).
  */
object SurrogateKeys {

  /** W1 — dense ranked SK via a GLOBAL window (reference dim pattern,
    * `02_silver_unicargo_create_dim_airlines.ipynb:103`). Serializes to a
    * single partition — acceptable ONLY for small dims (documented scale
    * trap, SURVEY §4); prefer [[hashSk]] beyond ~10⁶ rows. */
  def windowSk(orderCols: Seq[Column]): Column =
    row_number().over(Window.orderBy(orderCols: _*)).cast("long")

  /** Scalable deterministic SK: 60 bits of md5 over the natural key.
    * No sort, no shuffle, no driver coordination — computable
    * independently on any partition of any size, and reproducible across
    * engines (DuckDB: ('0x' || substr(md5(k),1,15))::BIGINT). Not dense;
    * collision probability over n keys ≈ n²/2⁶¹ (≪1 for n ≤ 10⁹). */
  def hashSk(naturalKey: Column*): Column =
    conv(substring(md5(concat_ws("|", naturalKey: _*)), 1, 15), 16, 10)
      .cast("long")
}

/** Dimensional model over the testdata — the reference's silver layer
  * (EP3: `02_silver_unicargo_create_fact_flights.ipynb`) re-expressed
  * Spark-first on the TPC-H-ish star: dims with surrogate keys, a cleansed
  * conformed fact, RI checks, and a gold daily summary.
  *
  * 100 TB shape: dims are small → broadcast joins (explicitly hinted);
  * the fact is never globally sorted; SKs are hash-based (no global
  * window); each join is preceded by an explicit projection so the scan
  * reads only needed columns.
  */
object Star {

  /** dim_date spanning the testdata's order/ship dates (reference
    * dim_date: 2015–2030 span, built driver-side; here generated
    * distributed, SURVEY §4 known-inefficiency (d) fixed). */
  def dimDate(spark: SparkSession): DataFrame =
    Sources.dateDim(spark, "1995-01-01", "2001-12-31")

  /** dim_customer: dedup on natural key then hash SK (reference dim
    * pattern: dedup → SK → select, `…create_dim_airlines.ipynb:101-103`).
    */
  def dimCustomer(spark: SparkSession, d: String): DataFrame =
    Cleaning.removeDuplicates(Seq("c_custkey"))(Tables.customer(spark, d))
      .select(
        SurrogateKeys.hashSk(lit("cust"), col("c_custkey")).as("customer_sk"),
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"))

  def dimPart(spark: SparkSession, d: String): DataFrame =
    Cleaning.removeDuplicates(Seq("p_partkey"))(Tables.part(spark, d))
      .select(
        SurrogateKeys.hashSk(lit("part"), col("p_partkey")).as("part_sk"),
        col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))

  def dimSupplier(spark: SparkSession, d: String): DataFrame =
    Cleaning.removeDuplicates(Seq("s_suppkey"))(Tables.supplier(spark, d))
      .select(
        SurrogateKeys.hashSk(lit("supp"), col("s_suppkey")).as("supplier_sk"),
        col("s_suppkey"), col("s_name"), col("s_nationkey"))

  /** Conformed fact (EP3's cleanse → join dims → SK → typed select,
    * `…create_fact_flights.ipynb:42-360`):
    *  - cleanse: required-key null filters + theta sanity filter +
    *    composite-key dedup BEFORE any join (filter-early, SURVEY §4);
    *  - each dim joined via broadcast on its natural key, natural key
    *    dropped after (role-played projections for the date dim);
    *  - measures cast to double in the final typed select.
    */
  /** Session-scoped cache so the five gold queries (and RI checks) share
    * one fact build instead of five — the build-once-fan-out pattern the
    * reference's notebook DAG gets by persisting silver. MEMORY_AND_DISK:
    * the fact is ~10% of lineitem bytes after projection. */
  private val factCache = graft.util.ManagedCaches.register()

  /** Unpersist and drop every cached fact for `spark` — call when a
    * session's work is done (test suites, notebook teardown). */
  def clearFactCache(spark: SparkSession): Unit =
    graft.util.ManagedCaches.clear(factCache, spark)

  def factLineitem(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(factCache, spark, d)(
      buildFactLineitem(spark, d))

  private def buildFactLineitem(spark: SparkSession, d: String): DataFrame = {
    // Dedup must be DETERMINISTIC: the synthetic lineitem has duplicate
    // (orderkey, linenumber) pairs whose other columns differ, and
    // dropDuplicates picks an arbitrary survivor. latestByKey with a total
    // ordering over the remaining columns picks the same survivor on any
    // engine/partitioning (and is what a MERGE-keyed silver layer does).
    val cleansed = Cleaning.latestByKey(
      Seq("l_orderkey", "l_linenumber"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate", "l_partkey",
        "l_suppkey").map(col))(
      Tables.lineitem(spark, d)
        .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull &&
          col("l_suppkey").isNotNull && col("l_shipdate").isNotNull)
        .filter(col("l_partkey") =!= col("l_suppkey")))
      .withColumn("ship_date", col("l_shipdate").cast("date"))
    val orders = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate").cast("date").as("order_date"))
    val dDate = dimDate(spark).select(col("date_sk"), col("full_date"))
    val dCust = dimCustomer(spark, d).select(col("customer_sk"), col("c_custkey"))
    val dPart = dimPart(spark, d).select(col("part_sk"), col("p_partkey"))
    val dSupp = dimSupplier(spark, d).select(col("supplier_sk"), col("s_suppkey"))
    cleansed
      .join(orders, col("l_orderkey") === col("o_orderkey"), "inner")
      .join(broadcast(dDate.select(col("date_sk").as("ship_date_sk"),
        col("full_date").as("__sd"))), col("ship_date") === col("__sd"), "inner")
      .drop("__sd")
      .join(broadcast(dDate.select(col("date_sk").as("order_date_sk"),
        col("full_date").as("__od"))), col("order_date") === col("__od"), "inner")
      .drop("__od")
      .join(broadcast(dCust), col("o_custkey") === col("c_custkey"), "inner")
      .join(broadcast(dPart), col("l_partkey") === col("p_partkey"), "inner")
      .join(broadcast(dSupp), col("l_suppkey") === col("s_suppkey"), "inner")
      .select(
        SurrogateKeys.hashSk(lit("li"), col("l_orderkey"), col("l_linenumber"))
          .as("lineitem_sk"),
        col("ship_date_sk"), col("order_date_sk"),
        col("customer_sk"), col("part_sk"), col("supplier_sk"),
        col("o_orderstatus"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_extendedprice").cast("double").as("extended_price"),
        col("l_discount").cast("double").as("discount"),
        col("l_tax").cast("double").as("tax"),
        col("l_returnflag").as("return_flag"),
        col("ship_date"))
  }

  /** RI orphan check (reference anti-join QA,
    * `…fact_flights.ipynb:435-444`): counts of fact rows whose SKs don't
    * resolve — all zero on healthy builds. One job per dim, tiny. */
  def riOrphans(fact: DataFrame, dim: DataFrame, sk: String): Long =
    fact.join(dim, Seq(sk), "left_anti").count()

}
