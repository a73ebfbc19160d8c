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
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * refuses to read natively; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.Sessions]])
    * so it arrives as a long. Truncating integer division to micros matches
    * DuckDB's nanos→micros truncation exactly. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = load(spark, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
