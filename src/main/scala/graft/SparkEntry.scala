package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY.md §2
  * (or an LLM-data-pipeline extension) over the driver's testdata; the
  * paired [[oracleSql]] is the DuckDB-runnable equivalent used as the
  * correctness oracle.
  */
object SparkEntry {

  /** All registered query packs. Order matters only for readability. */
  private val packs: Seq[QueryPack] = Seq(
    Relational, Functions, CleaningQ, EventsQ,
    TextQ, DedupQ, SimQ, MultimodalQ, StarQ, GoldQ, WindowQ, TpchQ,
    AsofQ, OlapQ)

  private lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size,
      s"duplicate query names: ${qs.map(_.name).diff(qs.map(_.name).distinct)}")
    qs
  }

  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full EP3 medallion path: cleanse → conformed star fact
    * (hash surrogate keys, 6 broadcast dim joins) → gold daily summary. */
  def entry(spark: SparkSession): DataFrame =
    queries("ep3_star_gold")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
