package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of session-scoped managed DataFrame caches.
  *
  * Pattern shared by the similarity corpus cache, the silver fact cache,
  * and the flight-domain fact cache: a (session, key)-keyed persisted
  * DataFrame that Spark's CacheManager substitutes into any later plan
  * containing the identical subtree — build-once-fan-out without plumbing.
  *
  * The lifecycle discipline lives HERE so no cache can be forgotten:
  * every cache constructed through [[cache]] is released by
  * [[clearAll]](spark) — which Bench calls at cache-scope group
  * boundaries and suites call in teardown — and entries belonging to
  * stopped sessions are pruned on every access.
  */
object ManagedCaches {

  private val caches = scala.collection.mutable.ListBuffer
    .empty[scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]]

  /** Create a registered cache map. Call once per cache site (a val). */
  def register(): scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame] = {
    val m = scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
    caches.synchronized { caches += m }
    m
  }

  /** Get-or-build a persisted entry in `m` for (spark, key). */
  def cache(m: scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame],
      spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)
    m.getOrElseUpdate((spark, key),
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Get-or-build a lineage-TRUNCATED entry in `m` for (spark, key).
    *
    * Like [[cache]], but via `localCheckpoint`: the data materializes to
    * executor-local blocks AND the plan collapses to a bare RDD scan.
    * Use it for a derived fact shared by many downstream queries — a
    * persist-based entry still carries the full build subtree in every
    * consumer plan, and Catalyst re-optimizes that subtree on each query
    * (measured ~0.1 s per fd_* gold query against the flight fact);
    * the checkpointed plan is a few nodes. This mirrors the medallion
    * discipline at scale: a silver fact is MATERIALIZED once, and gold
    * reads the materialization, not the recipe. [[clear]]'s unpersist is
    * a no-op for these; dropping the map reference lets the
    * ContextCleaner release the checkpoint blocks. */
  def checkpointCache(m: scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame],
      spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)
    m.getOrElseUpdate((spark, key), build.localCheckpoint())
  }

  /** Unpersist and drop one cache's entries for `spark`. */
  def clear(m: scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame],
      spark: SparkSession): Unit =
    m.keys.filter(_._1 eq spark).foreach { k =>
      m.remove(k).foreach { df =>
        if (!spark.sparkContext.isStopped) df.unpersist(blocking = false)
      }
    }

  /** Unpersist and drop every registered cache entry for `spark`. */
  def clearAll(spark: SparkSession): Unit =
    caches.synchronized(caches.toList).foreach(clear(_, spark))
}
