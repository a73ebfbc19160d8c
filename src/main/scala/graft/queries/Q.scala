package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation and (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Keeping them adjacent prevents column-name / semantics drift —
  * the driver's compare sorts columns BY NAME before hashing, so every
  * computed column is aliased identically on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryPack {
  def queries: Seq[Q]
}
