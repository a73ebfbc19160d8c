package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch sources (SURVEY §2.1 S1–S4) — Spark-native re-expression of the
  * reference's read helpers (`unicargo_etl/scripts/01_bronze/
  * etl_operations.py:4-10`, `src/io_utils/read_utils`).
  *
  * Schemas are always EXPLICIT (never inferred): inference costs an extra
  * full scan at 100 TB and silently drifts types; the reference made the
  * same call (`etl_operations.py:7-10`).
  */
object Sources {

  /** S1 — schema-enforced, header-skipping CSV read (reference
    * `read_csv_data`, `etl_operations.py:4-10`). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S1-extension — CSV read with corrupt-row quarantine: PERMISSIVE
    * parsing rescues rows that fail the schema (wrong arity, bad casts)
    * into a `_corrupt_record` column instead of silently nulling fields
    * or aborting the job — the bronze-ingest DQ pattern (bad rows land
    * in a quarantine table for triage; clean rows flow on). */
  def readCsvQuarantine(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  private val quarantineCache = graft.util.ManagedCaches.register()

  /** Split a quarantine read into (clean, quarantined). Materializes
    * first: Spark disallows filtering a CSV relation on only the
    * internal corrupt-record column, and the cache also makes this one
    * parse pass instead of two. The cache is REGISTERED (keyed on the
    * input's canonicalized plan — exprId-normalized, so the key is
    * collision-free AND two reads of the same source share one entry;
    * an identity hash here could collide across GC'd plans and hand a
    * second ingest the first one's rows) so ManagedCaches.clearAll
    * releases it — an anonymous .cache() here would leak a persisted
    * block per ingest in a long-lived session. */
  def splitQuarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val canon = df.queryExecution.logical.canonicalized
    val m = graft.util.ManagedCaches.cache(quarantineCache, df.sparkSession,
      s"${canon.semanticHash()}:${canon.toString}")(df)
    (m.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      m.filter(col("_corrupt_record").isNotNull))
  }

  /** S2 — managed-table read (reference `spark.read.table`). */
  def readTable(spark: SparkSession, name: String): DataFrame =
    spark.read.table(name)

  /** S3 — path-based columnar read (reference Delta-path read,
    * `bronze_orchestrator.py:230`; parquet is the offline stand-in). */
  def readPath(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S-extension — schema-enforced JSON-lines read (the other raw-landing
    * format a bronze layer meets; explicit schema for the same reason as
    * [[readCsv]] — schema inference is a full extra pass over the data
    * and non-deterministic under sampling at scale). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S-extension — ORC read (the other mainstream columnar format;
    * Spark's ORC source carries the same predicate-pushdown and
    * column-pruning machinery as parquet, so everything in the engine
    * that relies on scan pruning works unchanged over ORC lakes). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S4 — generated date dimension, replacing the reference's driver-side
    * Python row loop (`02_silver_unicargo_create_dim_date.ipynb:85-108`,
    * 5,844 rows built in pandas) with a distributed `spark.range` — no
    * driver materialization, scales to any span, and every derived column
    * is a codegen'd expression.
    *
    * Day-of-week follows the reference's Monday=1 convention
    * (`…create_dim_date.ipynb:92`; the ISO adjustment the reference makes
    * at `…fact_flights.ipynb:418-424`). */
  def dateDim(spark: SparkSession, start: String, endInclusive: String): DataFrame = {
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(start), java.time.LocalDate.parse(endInclusive)) + 1
    spark.range(nDays)
      .select(date_add(lit(start).cast("date"), col("id").cast("int")).as("full_date"))
      .select(
        (year(col("full_date")) * 10000 + month(col("full_date")) * 100 +
          dayofmonth(col("full_date"))).as("date_sk"),
        col("full_date"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        dayofmonth(col("full_date")).as("day_of_month"),
        (((dayofweek(col("full_date")) + lit(5)) % lit(7)) + lit(1)).as("day_of_week"),
        date_format(col("full_date"), "EEEE").as("day_name"),
        date_format(col("full_date"), "MMMM").as("month_name"),
        (((dayofweek(col("full_date")) + lit(5)) % lit(7)) + lit(1) >= 6)
          .as("is_weekend"))
  }
}
