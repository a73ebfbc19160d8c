package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.Cleaning
import graft.util.Exact._

/** Cleaning-operator coverage (SURVEY §2.2 P8–P11) exercised through the
  * [[graft.etl.Cleaning]] library — the queries run the actual library
  * functions so the oracle validates the engine code, not a reimplementation
  * inline in the query.
  */
object CleaningQ extends QueryPack {

  /** P8 — type-dispatched null fill (reference `handle_null_values`,
    * `cleaning.py:89-130`). Customers without finished orders get NULL
    * stats from the left join; handleNulls fills numerics with 0 and
    * strings with 'Unknown'. */
  private def p8Fillna(spark: SparkSession, d: String): DataFrame = {
    val fOrders = Tables.orders(spark, d)
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_finished"),
        sumExact(col("o_totalprice")).as("finished_rev"),
        max(col("o_orderpriority")).as("top_priority"))
    val joined = Tables.customer(spark, d)
      .join(fOrders, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("n_finished"), col("finished_rev"),
        col("top_priority"))
    Cleaning.handleNulls()(joined).orderBy("c_custkey")
  }

  private val p8Sql =
    """SELECT c_custkey,
       COALESCE(n_finished, 0) AS n_finished,
       COALESCE(finished_rev, 0.0) AS finished_rev,
       COALESCE(top_priority, 'Unknown') AS top_priority
       FROM customer LEFT JOIN (
         SELECT o_custkey, COUNT(*) AS n_finished,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS finished_rev,
                MAX(o_orderpriority) AS top_priority
         FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) t
       ON c_custkey = o_custkey
       ORDER BY c_custkey"""

  /** P10 — pipeline-metadata injection (reference `add_pipeline_metadata`,
    * `df_transform_utils.py:5-35`): MapType lineage column; the query
    * projects map lookups (the nondeterministic processed_timestamp is
    * excluded from the oracle compare). */
  private def p10Metadata(spark: SparkSession, d: String): DataFrame =
    Cleaning.addPipelineMetadata("pl_gold", "run_001", "tsk_region")(
        Tables.region(spark, d))
      .select(
        col("r_regionkey"), col("r_name"),
        col("metadata")("pipeline_id").as("pipeline_id"),
        col("metadata")("run_id").as("run_id"),
        col("metadata")("task_id").as("task_id"),
        map_keys(col("metadata")).getItem(0).as("first_meta_key"))
      .orderBy("r_regionkey")

  private val p10Sql =
    """SELECT r_regionkey, r_name,
       'pl_gold' AS pipeline_id, 'run_001' AS run_id, 'tsk_region' AS task_id,
       'pipeline_id' AS first_meta_key
       FROM region ORDER BY r_regionkey"""

  /** P11/A11 — single-pass null audit (reference does N jobs, one per
    * column, `bronze_orchestrator.py:185-192`; [[Cleaning.nullAuditDf]]
    * folds all counts into ONE aggregate — the 100 TB-correct shape).
    * NULLIF synthesizes nulls since the testdata is fully populated. */
  private def p11NullAudit(spark: SparkSession, d: String): DataFrame = {
    val withNulls = Tables.lineitem(spark, d).select(
      nullif(col("l_discount"), lit(0.0)).as("discount_or_null"),
      nullif(col("l_tax"), lit(0.0)).as("tax_or_null"),
      nullif(col("l_returnflag"), lit("N")).as("flag_or_null"))
    Cleaning.nullAuditDf(withNulls)
  }

  private val p11Sql =
    """SELECT COUNT(*) AS row_count,
       CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_discount_or_null,
       CAST(SUM(CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_tax_or_null,
       CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_flag_or_null
       FROM lineitem"""

  /** P3 — config-driven column drop with existence check (reference
    * `drop_columns`, `cleaning.py:28-58`): drops one real column and
    * silently skips a nonexistent one. */
  private def p3DropColumns(spark: SparkSession, d: String): DataFrame =
    Cleaning.dropColumns(Seq("s_acctbal", "not_a_column"))(
        Tables.supplier(spark, d))
      .orderBy("s_suppkey")

  private val p3Sql =
    """SELECT s_suppkey, s_name, s_nationkey FROM supplier ORDER BY s_suppkey"""

  /** P7 variant — all-column dedup through the library (reference
    * `remove_duplicates` no-subset path, `cleaning.py:60-87`). Projection
    * first so duplicates actually exist. */
  private def p7DedupAll(spark: SparkSession, d: String): DataFrame =
    Cleaning.removeDuplicates()(
        Tables.orders(spark, d).select("o_orderstatus", "o_orderpriority"))
      .orderBy("o_orderstatus", "o_orderpriority")

  private val p7AllSql =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
       ORDER BY o_orderstatus, o_orderpriority"""

  /** Single-pass numeric data profile: per column, null count, exact
    * distinct count, min/max — ONE aggregate job over the table (Spark
    * plans the multi-distinct via Expand), then an inline unpivot to the
    * narrow (column, stats) shape. At 100 TB the same shape swaps the
    * exact distincts for approx_count_distinct; the oracle pins the
    * exact variant. */
  private def p12Profile(spark: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    def m(c: String) =
      struct(
        sum(col(c).isNull.cast("long")).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v")).as(s"__$c")
    graft.Tables.lineitem(spark, d)
      .agg(count(lit(1)).as("n_rows"), m(cols.head), m(cols(1)), m(cols(2)))
      .select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"__$c.n_null"), col(s"__$c.n_distinct"),
          col(s"__$c.min_v"), col(s"__$c.max_v"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n_rows"), col("p.n_null"),
        col("p.n_distinct"), col("p.min_v"), col("p.max_v"))
      .orderBy("col_name")
  }

  private val p12Sql =
    """SELECT 'l_discount' AS col_name, COUNT(*) AS n_rows,
              COUNT(*) - COUNT(l_discount) AS n_null,
              COUNT(DISTINCT l_discount) AS n_distinct,
              CAST(MIN(l_discount) AS DOUBLE) AS min_v,
              CAST(MAX(l_discount) AS DOUBLE) AS max_v
       FROM lineitem
       UNION ALL
       SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
              COUNT(DISTINCT l_extendedprice),
              CAST(MIN(l_extendedprice) AS DOUBLE),
              CAST(MAX(l_extendedprice) AS DOUBLE)
       FROM lineitem
       UNION ALL
       SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
              COUNT(DISTINCT l_quantity),
              CAST(MIN(l_quantity) AS DOUBLE), CAST(MAX(l_quantity) AS DOUBLE)
       FROM lineitem
       ORDER BY col_name"""

  override def queries: Seq[Q] = Seq(
    Q("p3_drop_columns", p3DropColumns, Some(p3Sql)),
    Q("p7_dedup_all", p7DedupAll, Some(p7AllSql)),
    Q("p8_fillna", p8Fillna, Some(p8Sql)),
    Q("p10_metadata", p10Metadata, Some(p10Sql)),
    Q("p11_null_audit", p11NullAudit, Some(p11Sql)),
    Q("p12", p12Profile, Some(p12Sql)))
}
