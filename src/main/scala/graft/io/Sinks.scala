package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Cleaning

/** Batch sinks (SURVEY §2.1 S5/S6/S11) — Spark-native re-expression of the
  * reference's write helpers (`src/io_utils/write_to_table_utils.py:12-140`,
  * `src/incrementatl_processing/incremetal_flights.py:1-19`).
  *
  * Offline stand-ins: managed parquet tables instead of Delta
  * (SURVEY §7.4 risk 1); `overwrite` drops & recreates, so the reference's
  * `overwriteSchema` semantics fall out naturally. The upsert keeps the
  * reference's MERGE contract (`existing.SK = new.SK → update else insert`)
  * via a latest-wins key rewrite.
  */
object Sinks {

  /** S5 — batch managed-table sink (reference `save_to_table`,
    * `write_to_table_utils.py:12-48`): modes `overwrite` (default) and
    * `append`. */
  def saveToTable(df: DataFrame, table: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).saveAsTable(table)

  /** S6 — partitioned path sink with bounded retry (reference
    * `write_partitioned_table`, `write_to_table_utils.py:99-140`: 3
    * attempts, 2 s delay). Partition columns drive partition pruning for
    * every downstream read — the reference prescribes silver partitioning
    * by date and gold by business dims (`README.md:64-68`). */
  def savePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: String = "append", format: String = "parquet",
      retries: Int = 3, retryDelayMs: Long = 2000): Unit = {
    var attempt = 0
    var done = false
    var last: Throwable = null
    while (!done && attempt < retries) {
      try {
        df.write.mode(mode).partitionBy(partitionCols: _*).format(format).save(path)
        done = true
      } catch {
        case e: Throwable =>
          last = e; attempt += 1
          if (attempt < retries) Thread.sleep(retryDelayMs)
      }
    }
    if (!done) throw last
  }

  /** S11 (scale path) — partition-scoped keyed upsert (reference Delta
    * MERGE, `incremetal_flights.py:10-19`: whenMatchedUpdateAll /
    * whenNotMatchedInsertAll). The target is partitioned by
    * `partitionCol`, which MUST be one of `keys` (so a key's row can only
    * ever live in one partition — the invariant that makes a
    * partition-scoped rewrite equal to a whole-table MERGE). Only the
    * partitions present in `updates` are read, merged (latest wins), and
    * rewritten via dynamic partition overwrite; untouched partitions are
    * never read OR written (spec asserts their files stay byte-identical).
    *
    * This matches the file-granular cost model of Delta's MERGE: work
    * scales with the update's partition footprint, not the table, and the
    * commit has no staging-swap crash window — each rewritten partition
    * is swapped by the committer, and untouched data is never at risk.
    * The reference's flights merge keys on (flight_id, flight_date) with
    * date-partitioned silver — exactly this shape.
    */
  def upsertByKeyPartitioned(spark: SparkSession, updates: DataFrame,
      targetPath: String, keys: Seq[String], partitionCol: String): Unit = {
    require(keys.contains(partitionCol),
      s"partitionCol $partitionCol must be one of the merge keys ${keys.mkString(",")} " +
        "— otherwise a matched key could live outside the rewritten partitions")
    if (!new java.io.File(targetPath).exists()) {
      updates.write.mode("overwrite").partitionBy(partitionCol).parquet(targetPath)
    } else {
      val existing = spark.read.parquet(targetPath)
      val touched = updates.select(partitionCol).distinct()
      // left-semi on the broadcast partition list → partition pruning at
      // the scan (only touched partition dirs are read)
      val existingTouched = existing
        .join(broadcast(touched), Seq(partitionCol), "left_semi")
      val all = existingTouched.withColumn("__upd", lit(0))
        .unionByName(updates.withColumn("__upd", lit(1)))
      Cleaning.latestByKey(keys, Seq(col("__upd")))(all).drop("__upd")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCol)
        .parquet(targetPath)
    }
  }

  /** Small-files compaction — the operational companion of streaming
    * sinks and partition-scoped upserts at scale: micro-batches and
    * per-batch merges accrete many small parquet files, and at 100 TB
    * scan cost is dominated by file-open overhead once files fall below
    * ~100 MB. Unpartitioned targets are rewritten into
    * ceil(bytes/targetFileBytes) files; partitioned targets are rewritten
    * into `filesPerPartition` files per partition dir (default 1 — the
    * right shape for date-partitioned silver; raise it for skewed
    * partitions so one hot date doesn't become a single straggler task
    * writing one oversized file) via dynamic partition overwrite, so the
    * swap is per-partition-atomic. `targetFileBytes` applies only to the
    * unpartitioned path — per-partition byte sizing would need a listing
    * pass per partition, which a table format's OPTIMIZE does.
    *
    * Data-identical by construction (same rows, new layout); spec asserts
    * row equality and the file-count drop. */
  def compact(spark: SparkSession, path: String,
      partitionCols: Seq[String] = Nil,
      targetFileBytes: Long = 128L * 1024 * 1024,
      filesPerPartition: Int = 1): Unit = {
    val df = spark.read.parquet(path)
    if (partitionCols.isEmpty) {
      val bytes = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) f.length() else 0L
        walk(new java.io.File(path))
      }
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val staging = path + ".compacting"
      df.repartition(nFiles).write.mode("overwrite").parquet(staging)
      swapInto(staging, path)
    } else {
      // one task per (partition value, salt): filesPerPartition=1 → one
      // file per partition dir; >1 spreads a hot partition over that many
      // tasks/files (salt derived from the row hash, never written out)
      val parts = partitionCols.map(col) ++
        (if (filesPerPartition > 1)
          Seq(pmod(xxhash64(df.columns.map(col): _*), lit(filesPerPartition.toLong)))
        else Nil)
      df.repartition(parts: _*)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCols: _*)
        .parquet(path)
    }
  }

  /** Replace `targetPath` with `stagingPath` (single-FS move; loud on
    * failure). Object stores need a manifest commit — that is what a
    * table format's transaction log provides. */
  private def swapInto(stagingPath: String, targetPath: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    def deleteRecursively(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(c => deleteRecursively(c)) finally children.close()
      }
      Files.deleteIfExists(p)
    }
    val target = Paths.get(targetPath)
    if (Files.exists(target)) {
      val old = Paths.get(targetPath + ".old")
      deleteRecursively(old)
      Files.move(target, old)
    }
    Files.move(Paths.get(stagingPath), target)
  }

  // ───── file-granular MERGE on a non-partition key (min/max manifest) ─────

  private def manifestPath(targetPath: String): String = targetPath + "/_manifest"

  /** Per-file key-range manifest of `dataPath`'s parquet files, computed
    * by scanning ONLY those files: (file leaf name, kmin, kmax, rows).
    * Leading-underscore paths are invisible to Spark's parquet reads, so
    * the manifest can live INSIDE the table dir with native key types. */
  private def manifestEntries(spark: SparkSession, dataPath: String,
      keyCol: String): DataFrame =
    spark.read.parquet(dataPath)
      .select(col(keyCol).as("k"), col("_metadata.file_path").as("fp"))
      .groupBy(element_at(split(col("fp"), "/"), -1).as("file"))
      .agg(min("k").as("kmin"), max("k").as("kmax"), count(lit(1)).as("rows"))

  /** Write `df` as a manifest-tracked table: range-partitioned on
    * `keyCol` into `nFiles` files — disjoint per-file key ranges are what
    * make the min/max manifest selective — plus the `_manifest` sidecar.
    * This is the layout [[upsertByKeyManifest]] merges into. */
  def writeWithManifest(spark: SparkSession, df: DataFrame, targetPath: String,
      keyCol: String, nFiles: Int = 8): Unit = {
    df.repartitionByRange(nFiles, col(keyCol))
      .write.mode("overwrite").parquet(targetPath)
    manifestEntries(spark, targetPath, keyCol)
      .coalesce(1).write.mode("overwrite").parquet(manifestPath(targetPath))
  }

  /** S11 (file-granular, NON-partition key) — keyed MERGE whose work
    * scales with the files that actually contain matched keys, not the
    * table: the Delta data-skipping cost model without a table format.
    *
    * The `_manifest` sidecar holds each file's key min/max; incoming
    * keys range-join the broadcast manifest to select the touched files,
    * which alone are read, merged (latest wins) with ALL the updates
    * (unmatched keys insert into the rewritten files), and replaced.
    * Untouched files are never read, written, or renamed — byte-identical
    * after the merge, spec-asserted — and the manifest is spliced
    * incrementally (old untouched entries + entries scanned from the new
    * files only), so no step is O(table).
    *
    * Like [[upsertByKey]]'s staging swap, the final file moves + manifest
    * rewrite are not transactional against concurrent readers — the
    * commit-log piece is exactly what a table format provides on an
    * object store (README scope note). */
  def upsertByKeyManifest(spark: SparkSession, updates: DataFrame,
      targetPath: String, keyCol: String): Unit = {
    import java.nio.file.{Files, Paths}
    if (!new java.io.File(targetPath).exists()) {
      writeWithManifest(spark, updates, targetPath, keyCol)
      return
    }
    val manifest = spark.read.parquet(manifestPath(targetPath))
    val touched = updates.select(col(keyCol).as("k")).distinct()
      .join(broadcast(manifest),
        col("k") >= col("kmin") && col("k") <= col("kmax"))
      .select("file").distinct()
      .collect().map(_.getString(0)).toSet
    val existingTouched =
      if (touched.isEmpty) updates.filter(lit(false))
      else spark.read.parquet(touched.map(f => s"$targetPath/$f").toSeq: _*)
        .drop("_metadata")
    val all = existingTouched.withColumn("__upd", lit(0))
      .unionByName(updates.withColumn("__upd", lit(1)))
    val merged = Cleaning.latestByKey(Seq(keyCol), Seq(col("__upd")))(all)
      .drop("__upd")
    val staging = targetPath + ".merge-staging"
    merged.repartitionByRange(math.max(1, touched.size), col(keyCol))
      .write.mode("overwrite").parquet(staging)
    // splice the manifest BEFORE moving files (the scan is lazy; collect
    // forces it while the staging dir still exists)
    val newEntries = manifestEntries(spark, staging, keyCol).collect().toSeq
    val keptEntries = manifest.filter(!col("file").isin(touched.toSeq: _*)).collect().toSeq
    val stagingDir = new java.io.File(staging)
    val dataFiles = stagingDir.listFiles().filter(_.getName.endsWith(".parquet"))
    // staged part names carry fresh UUIDs — no collision with live files
    dataFiles.foreach(f =>
      Files.move(f.toPath, Paths.get(s"$targetPath/${f.getName}")))
    touched.foreach { f =>
      Files.deleteIfExists(Paths.get(s"$targetPath/$f"))
      // local-FS hidden checksum sibling; stale ones are harmless but messy
      Files.deleteIfExists(Paths.get(s"$targetPath/.$f.crc"))
    }
    stagingDir.listFiles().foreach(f => Files.deleteIfExists(f.toPath))
    Files.deleteIfExists(stagingDir.toPath)
    spark.createDataFrame(
        spark.sparkContext.parallelize(keptEntries ++ newEntries, 1),
        manifest.schema)
      .write.mode("overwrite").parquet(manifestPath(targetPath))
  }

  /** S11 (generic fallback) — keyed upsert for UNPARTITIONED targets:
    * union existing+updates, keep the update row per key (latest wins via
    * the `isUpdate` flag), rewrite atomically via a staging path + swap.
    *
    * Scale note: this rewrites the table — correct but O(table). Prefer
    * [[upsertByKeyPartitioned]] (the Delta-MERGE cost model) whenever a
    * key-derived partition column exists; this fallback is for small
    * dimension-style tables where a full rewrite is the honest cost.
    */
  def upsertByKey(spark: SparkSession, updates: DataFrame, targetPath: String,
      keys: Seq[String]): Unit = {
    val fs = new java.io.File(targetPath)
    val merged =
      if (!fs.exists()) updates
      else {
        val existing = spark.read.parquet(targetPath)
        val all = existing.withColumn("__upd", lit(0))
          .unionByName(updates.withColumn("__upd", lit(1)))
        Cleaning.latestByKey(keys, Seq(col("__upd")))(all).drop("__upd")
      }
    val staging = targetPath + ".staging"
    merged.write.mode("overwrite").parquet(staging)
    // Files.move throws on failure, unlike File.renameTo, so a failed
    // swap can never silently leave the target missing or stale.
    swapInto(staging, targetPath)
  }
}
