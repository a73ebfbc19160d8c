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

  /** Named cache-build steps for this pack's managed caches, timed by
    * Bench as their own rows BEFORE the pack's member queries each pass.
    * Without this, the group-boundary cache teardown bills the whole
    * shared build to whichever member query runs first (alphabetically)
    * — a measurement-attribution artifact, not a plan cost. Warm steps
    * are bench-only: they never join the correctness registry (no oracle
    * to drift) and their fn simply returns the cache-backed DataFrame so
    * Bench's count() materializes it. */
  def warms: Seq[Q] = Nil
}
