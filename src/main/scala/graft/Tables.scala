package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loading for the driver's deterministic testdata (TESTDATA.md).
  *
  * Mirrors the reference's managed-table read surface (SURVEY §2.1 S2,
  * reference `02_silver_unicargo_create_fact_flights.ipynb:25`): callers ask
  * for a table by name; physical layout (parquet path) is resolved here, so
  * query code never hard-codes paths. At cluster scale the same API would be
  * backed by a catalog (`spark.table`) instead of a path.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one testdata table. Column pruning + predicate pushdown reach the
    * parquet scan because this returns the raw lazy scan (no caching, no
    * materialization). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  /** Canonicalize an events-shaped frame's `ts` to session-zone TIMESTAMP,
    * whatever physical type the parquet writer chose:
    *  - TIMESTAMP(NANOS) arrives as a long (sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, [[graft.Sessions]]);
    *    truncating integer division to micros matches DuckDB's
    *    nanos→micros truncation exactly;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TIMESTAMP_NTZ; the session timezone is pinned to UTC, so the
    *    cast re-labels the same wall-clock micros as the same instant —
    *    bit-identical to what the nanos path produced;
    *  - TIMESTAMP passes through.
    * Works on batch and streaming frames alike (pure schema dispatch). */
  def canonEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def events(spark: SparkSession, d: String): DataFrame =
    canonEventTs(load(spark, d, "events"))
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
