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
          Seq(pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*),
            lit(filesPerPartition.toLong)))
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

  // ── file-granular MERGE + time travel (versioned min/max manifest) ──
  //
  // A minimal immutable-files + delta-log table: data files are never
  // mutated; each commit is a version dir holding only the DELTA of
  // manifest entries — `add` rows (file, key min/max, rows) for files the
  // commit wrote, `remove` rows for files it superseded — so commit cost
  // is O(merge footprint), never O(table files). The live file set of any
  // version is the fold of the chain ([[manifestAt]]), bounded by
  // checkpoints ([[compactManifest]] writes the folded set as `ckpt=N`,
  // Delta's log-checkpoint analogy). Commits are ATOMIC and optimistic-
  // concurrency-safe: a version is committed by renaming a staged dir to
  // `v=N+1`, which fails if a concurrent writer took N+1 first — the
  // loser recomputes its merge against the new version and retries
  // ([[upsertByKeyManifest]]), so no update is ever silently lost.
  // Reads of a versioned table go through [[readVersioned]]; after
  // [[vacuum]](keep=1) the dir is also plain-parquet-readable again
  // (only live files remain). The remaining scope cut vs a real table
  // format: rename-as-commit needs a filesystem with atomic rename (any
  // POSIX FS / HDFS; an object store needs a log-store service).

  private def manifestRoot(targetPath: String): String = targetPath + "/_manifest"
  private def versionDir(targetPath: String, v: Long): String =
    s"${manifestRoot(targetPath)}/v=$v"
  private def ckptDir(targetPath: String, v: Long): String =
    s"${manifestRoot(targetPath)}/ckpt=$v"

  private def listIds(targetPath: String, prefix: String): Seq[Long] = {
    val root = new java.io.File(manifestRoot(targetPath))
    if (!root.exists()) Nil
    else root.listFiles().filter(_.isDirectory).map(_.getName).toSeq
      .collect { case s if s.startsWith(prefix) => s.drop(prefix.length).toLong }
  }

  /** Latest committed version of a manifest-tracked table (0 = none). */
  def currentVersion(targetPath: String): Long =
    listIds(targetPath, "v=").foldLeft(0L)(math.max)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(c => deleteRecursively(c)) finally children.close()
    }
    Files.deleteIfExists(p)
  }

  /** Per-file key-range manifest entries of `dataPath`'s parquet files,
    * computed by scanning ONLY those files: (file leaf, kmin, kmax, rows).
    * Leading-underscore paths are invisible to Spark's parquet reads, so
    * the manifest tree can live INSIDE the table dir with native key
    * types. */
  private def manifestEntries(spark: SparkSession, dataPath: String,
      keyCol: String): DataFrame =
    spark.read.parquet(dataPath)
      .select(col(keyCol).as("k"), col("_metadata.file_path").as("fp"))
      .groupBy(element_at(split(col("fp"), "/"), -1).as("file"))
      .agg(min("k").as("kmin"), max("k").as("kmax"), count(lit(1)).as("rows"))

  /** Write `df` (forcing its scan NOW — callers stage manifests while
    * their data staging dirs still exist) into a hidden staging dir under
    * the manifest root; returns the staged path for [[tryCommit]]. */
  private def stageManifest(df: DataFrame, targetPath: String): String = {
    val staged =
      s"${manifestRoot(targetPath)}/staging-${java.util.UUID.randomUUID()}"
    df.coalesce(1).write.mode("overwrite").parquet(staged)
    staged
  }

  /** THE commit point: atomically rename a staged manifest dir to its
    * version (or checkpoint) dir. Returns false — after cleaning up the
    * staged dir — iff the destination already exists, i.e. a concurrent
    * writer committed this version first (optimistic-concurrency
    * conflict). Any other failure propagates loudly. */
  private def tryCommit(stagedPath: String, dest: String): Boolean = {
    import java.nio.file.{Files, Paths}
    try { Files.move(Paths.get(stagedPath), Paths.get(dest)); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        deleteRecursively(Paths.get(stagedPath)); false
    }
  }

  /** Move staged parquet data files into the live table dir (fresh-UUID
    * part names — no collision with live files) and drop the staging
    * dir. */
  private def adoptStagedFiles(stagingPath: String, targetPath: String): Unit = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(targetPath))
    val dir = new java.io.File(stagingPath)
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f =>
      Files.move(f.toPath, Paths.get(s"$targetPath/${f.getName}")))
    dir.listFiles().foreach(f => Files.deleteIfExists(f.toPath))
    Files.deleteIfExists(dir.toPath)
  }

  /** Write `df` as version 1 of a manifest-tracked table:
    * range-partitioned on `keyCol` into `nFiles` files — disjoint
    * per-file key ranges are what make the min/max manifest selective.
    * Explicit table (re)creation: any existing content is overwritten. */
  def writeWithManifest(spark: SparkSession, df: DataFrame, targetPath: String,
      keyCol: String, nFiles: Int = 8, preclustered: Boolean = false): Unit = {
    // preclustered: the caller already laid `df` out (e.g. Z-ordered via
    // [[Zorder.zorderBy]]) — re-range-partitioning on the single key
    // would DESTROY that layout, so write it as-is; the manifest's
    // per-file [kmin, kmax] just gets wider ranges (single-key pruning
    // degrades exactly as much as the caller's layout choice implies).
    (if (preclustered) df else df.repartitionByRange(nFiles, col(keyCol)))
      .write.mode("overwrite").parquet(targetPath)
    val adds = manifestEntries(spark, targetPath, keyCol)
      .withColumn("action", lit("add"))
    val staged = stageManifest(adds, targetPath)
    require(tryCommit(staged, versionDir(targetPath, 1L)),
      s"concurrent writer raced an explicit writeWithManifest on $targetPath")
  }

  /** Live manifest entries (file, kmin, kmax, rows) of `targetPath` as of
    * `version` (default: latest): reads the newest checkpoint at or below
    * the version plus the delta chain above it, keeps the latest action
    * per file, and returns the files still `add`-live. The chain length
    * is bounded by the checkpoint cadence, so resolution cost is
    * O(live files + recent deltas) regardless of table age. */
  def manifestAt(spark: SparkSession, targetPath: String,
      version: Long = -1L): DataFrame = {
    val v = if (version > 0) version else currentVersion(targetPath)
    require(v > 0, s"$targetPath has no committed manifest versions")
    val ckpts = listIds(targetPath, "ckpt=").filter(_ <= v)
    val deltas = listIds(targetPath, "v=").filter(_ <= v)
    require(deltas.contains(v) || ckpts.contains(v),
      s"version $v of $targetPath is not committed (or was vacuumed)")
    val start = ckpts.foldLeft(0L)(math.max)
    val parts =
      (if (start > 0)
        Seq(spark.read.parquet(ckptDir(targetPath, start))
          .withColumn("__v", lit(start)))
      else Nil) ++
        deltas.filter(_ > start).sorted.map(d =>
          spark.read.parquet(versionDir(targetPath, d))
            .withColumn("__v", lit(d)))
    // Deltas written before data-file compaction / deletion vectors
    // existed carry no data_change / dv_file columns; normalize (every
    // pre-OPTIMIZE action changed data; no DV) so mixed chains union
    // cleanly.
    val normalized = parts.map { df0 =>
      val df1 =
        if (df0.columns.contains("data_change")) df0
        else df0.withColumn("data_change", lit(true))
      if (df1.columns.contains("dv_file")) df1
      else df1.withColumn("dv_file", lit(null).cast("string"))
    }
    val chain = normalized.reduce(_.unionByName(_))
    // Liveness and deletion vectors resolve SEPARATELY: add/remove
    // latest-wins decides which files are live (dv actions must not
    // shade an add), while add/dv latest-wins decides each file's
    // current DV (an add row is the "no DV yet" baseline — or, from a
    // checkpoint, the folded snapshot's dv_file). File names are
    // fresh UUIDs per write, so an add is always a file's oldest row.
    val live = Cleaning.latestByKey(Seq("file"), Seq(col("__v")))(
        chain.filter(col("action").isin("add", "remove")))
      .filter(col("action") === "add")
      .drop("action", "__v", "data_change", "dv_file")
    val dvs = Cleaning.latestByKey(Seq("file"), Seq(col("__v")))(
        chain.filter(col("action").isin("add", "dv")))
      .select(col("file"), col("dv_file"))
    live.join(dvs, Seq("file"), "left")
  }

  /** Fold the delta chain at `version` (default: latest) into a full
    * checkpoint (`ckpt=N`) — Delta's log checkpoint: later [[manifestAt]]
    * resolutions read the checkpoint plus only the deltas above it.
    * Idempotent, and safe under concurrency (a racing compactor's commit
    * simply wins; content is identical either way). Reads are
    * byte-identical before and after (spec-asserted) — a checkpoint
    * changes resolution cost, never content. */
  def compactManifest(spark: SparkSession, targetPath: String,
      version: Long = -1L): Unit = {
    val v = if (version > 0) version else currentVersion(targetPath)
    require(v > 0, s"$targetPath has no committed manifest versions")
    if (new java.io.File(ckptDir(targetPath, v)).exists()) return
    val full = manifestAt(spark, targetPath, v).withColumn("action", lit("add"))
    val staged = stageManifest(full, targetPath)
    tryCommit(staged, ckptDir(targetPath, v))
    ()
  }

  /** Delta-style OPTIMIZE — DATA-file compaction (the sibling of
    * [[compactManifest]], which compacts the LOG): bin-pack the current
    * version's small live files (rows < `targetRows`) into few large
    * ones and commit the rewrite as `v=N+1`.
    *
    * Why it exists: [[appendWithManifest]] is O(appended data) per
    * commit, so a streaming/incremental pipeline accretes many small
    * files — the classic small-files problem. At 100 TB that kills scan
    * throughput (per-file open cost, tiny row groups, no effective
    * column-chunk compression) and degrades the min/max manifest's
    * pruning selectivity as generations of overlapping key ranges pile
    * up. Compaction restores both: bins are formed over the kmin-sorted
    * live entries, so each output file covers one contiguous key range.
    *
    * Semantics: every action in the commit is `data_change = false` —
    * compaction rewrites bytes, it changes NO rows. [[readChanges]]
    * recognizes version ranges whose every action is data_change=false
    * and returns an empty change feed without reading any data file
    * (Delta CDF's treatment of OPTIMIZE commits); mixed ranges fall back
    * to the row-level diff, where rewrite churn cancels in the
    * exceptAlls.
    *
    * Concurrency: the rewritten files' CONTENT is version-independent
    * (pure repack of the observed bins), so data files are staged +
    * adopted once and only the manifest commit retries against a moving
    * head. Before each retry the source files are re-validated against
    * the new head's live set: if a concurrent merge rewrote or removed
    * any of them, this compaction is stale and aborts as a no-op (0) —
    * its adopted-but-never-committed output files are orphans that
    * [[vacuum]] reclaims, exactly like a crashed merge attempt's.
    *
    * Returns the number of small files compacted away (0 = nothing to
    * do, table already compact, or lost to a conflicting writer). Driver
    * work is O(live files) — the same file-list bound every manifest op
    * here has. */
  def optimizeTable(spark: SparkSession, targetPath: String, keyCol: String,
      targetRows: Long = 1L << 20, maxAttempts: Int = 5): Int = {
    import spark.implicits._
    val cur = currentVersion(targetPath)
    require(cur > 0, s"$targetPath is not manifest-tracked")
    val entries = manifestAt(spark, targetPath, cur)
      .orderBy("kmin")
      .collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("rows"),
        Option(r.getAs[String]("dv_file"))))
    // Greedy adjacent bin-packing over the kmin-sorted small files: a
    // large file (>= targetRows) breaks the run so no bin straddles it
    // (its key range would swallow the bin's pruning selectivity).
    // A file CARRYING A DELETION VECTOR is always rewritten — even a
    // large or solitary one — with its DV applied, so the replacement
    // file is DV-free: this is the fold that makes post-OPTIMIZE reads
    // byte-identical to the eager-merge path (Delta's REORG/PURGE).
    val bins = scala.collection.mutable
      .ArrayBuffer[Vector[(String, Option[String])]]()
    var open = Vector.empty[(String, Option[String])]
    var openRows = 0L
    def flush(): Unit = {
      if (open.size >= 2 || open.exists(_._2.nonEmpty)) bins += open
      open = Vector.empty; openRows = 0L
    }
    entries.foreach { case (f, rows, dv) =>
      if (rows >= targetRows && dv.isEmpty) flush()
      else {
        open :+= ((f, dv)); openRows += rows
        if (openRows >= targetRows) flush()
      }
    }
    flush()
    if (bins.isEmpty) return 0
    val sources = bins.flatten.map(_._1).toSet
    val adds = bins.toVector.flatMap { bin =>
      val staging = s"$targetPath.opt-staging-${java.util.UUID.randomUUID()}"
      applyDv(spark, targetPath,
          spark.read.option("mergeSchema", "true")
            .parquet(bin.map(p => s"$targetPath/${p._1}"): _*), bin)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val a = manifestEntries(spark, staging, keyCol).collect().toVector
      adoptStagedFiles(staging, targetPath)
      a
    }
    // Schema-only analysis of the entry projection (no execution) so the
    // collected add rows and their createDataFrame schema always agree.
    val addSchema = manifestEntries(spark, targetPath, keyCol).schema
    val kType = addSchema("kmin").dataType
    val addsDf = spark.createDataFrame(
        new java.util.ArrayList(
          scala.jdk.CollectionConverters.SeqHasAsJava(adds).asJava),
        addSchema)
      .withColumn("action", lit("add"))
      .withColumn("data_change", lit(false))
      .withColumn("dv_file", lit(null).cast("string"))
    val removesDf = sources.toSeq.sorted.toDF("file").select(col("file"),
      lit(null).cast(kType).as("kmin"), lit(null).cast(kType).as("kmax"),
      lit(null).cast("bigint").as("rows"), lit("remove").as("action"),
      lit(false).as("data_change"), lit(null).cast("string").as("dv_file"))
    var attempt = 0
    while (true) {
      attempt += 1
      if (attempt > maxAttempts)
        throw new java.util.ConcurrentModificationException(
          s"optimizeTable lost the commit race on $targetPath " +
            s"$maxAttempts times — giving up loudly")
      val head = currentVersion(targetPath)
      // Stale iff any source file is no longer live OR its deletion
      // vector moved (a concurrent DV commit after our rewrite read
      // would otherwise be silently folded away — resurrected rows).
      val headPairs = livePairs(spark, targetPath, head).toMap
      val sourcePairs = bins.flatten.toMap
      val stale = sourcePairs.exists { case (f, dv) =>
        !headPairs.get(f).contains(dv)
      }
      if (stale) return 0 // conflicting rewrite/DV commit → stale
      val staged = stageManifest(addsDf.unionByName(removesDf), targetPath)
      if (tryCommit(staged, versionDir(targetPath, head + 1)))
        return sources.size
    }
    -1 // unreachable
  }

  /** Snapshot read: the table exactly as committed at `version`
    * (default: latest) — the reference README's "restore guidance"
    * becomes a query-time choice. Resolves the version's manifest to its
    * file list and reads only those files. */
  private def dvDir(targetPath: String): String = targetPath + "/_dv"

  /** Apply the deletion vectors referenced by `pairs` — the live
    * (file, dv_file) rows of a resolved manifest — to `base`, a read of
    * exactly those data files (merge-on-read): base rows ANTI-join on
    * (source-file leaf, key value) against the union of the referenced
    * DV parquets' pairs. A DV parquet holds (file, <keyCol>) rows —
    * the key's column NAME is its schema, so readers need no side
    * channel — and is CUMULATIVE per data file (each new DV for a file
    * unions the prior one), so the pairs a version's referenced DV
    * parquets hold for their referencing files are exactly that
    * version's deleted set. DV size ∝ deleted keys, the anti-join side
    * broadcasts, and the no-DV fast path is `base` untouched — zero
    * extra plan nodes. */
  private[io] def applyDv(spark: SparkSession, targetPath: String,
      base: DataFrame, pairs: Seq[(String, Option[String])]): DataFrame = {
    val dvRefs = pairs.collect { case (f, Some(d)) => (f, d) }
    if (dvRefs.isEmpty) return base
    import spark.implicits._
    def leaf = element_at(split(col("_metadata.file_path"), "/"), -1)
    val dvRaw = spark.read.parquet(
      dvRefs.map(_._2).distinct.map(d => s"${dvDir(targetPath)}/$d"): _*)
    val keyName = dvRaw.columns.filter(_ != "file").head
    val dvRows = dvRaw.select(col("file"), col(keyName).as("__dvk"),
      leaf.as("__dv_src"))
    // keep only the (data file → dv parquet) pairs this version references
    val valid = dvRefs.toDF("file", "__dv_src")
    val dvSet = dvRows
      .join(broadcast(valid), Seq("file", "__dv_src"), "left_semi")
      .select(col("file").as("__dv_f"), col("__dvk"))
    base.withColumn("__src", leaf)
      .join(dvSet, col("__src") === col("__dv_f") &&
        col(keyName) === col("__dvk"), "left_anti")
      .drop("__src")
  }

  /** The live (file, dv_file) pairs of a version — the driver-side
    * file list every reader resolves (O(live files), as before DVs). */
  private[io] def livePairs(spark: SparkSession, targetPath: String,
      version: Long): Seq[(String, Option[String])] =
    manifestAt(spark, targetPath, version)
      .select("file", "dv_file").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq

  def readVersioned(spark: SparkSession, targetPath: String,
      version: Long = -1L): DataFrame = {
    val pairs = livePairs(spark, targetPath, version)
    // mergeSchema: after a schema-evolving merge, a version can span
    // files written before and after the widening; old files surface the
    // new columns as null, exactly like Delta's evolved reads.
    val base = spark.read.option("mergeSchema", "true")
      .parquet(pairs.map(p => s"$targetPath/${p._1}"): _*)
    applyDv(spark, targetPath, base, pairs)
  }

  /** Change-data-feed read: the row-level difference between two
    * committed versions, as Delta CDF's insert/delete stream — an
    * update surfaces as delete(old row) + insert(new row).
    *
    * Resolution is file-granular against the manifest (files added vs
    * removed across the version range), then row-level: a merge
    * rewrites whole hit files, so unchanged rows appear in BOTH the
    * added and removed sets — the two `exceptAll`s cancel that rewrite
    * churn, leaving the minimal exact change set. Cost is O(changed-file
    * rows), never O(table): only files whose liveness flipped are read,
    * and the exceptAll shuffle carries just those rows. Schema-evolving
    * ranges align on the union schema (old-side rows surface new
    * columns as null, like [[readVersioned]]).
    *
    * Returns the table columns + `_change_type` ("insert" | "delete").
    * Both endpoints must still be committed (not vacuumed) — same
    * loud-failure contract as [[readVersioned]]. */
  def readChanges(spark: SparkSession, targetPath: String,
      fromVersion: Long, toVersion: Long = -1L): DataFrame = {
    val to = if (toVersion > 0) toVersion else currentVersion(targetPath)
    require(fromVersion >= 1 && to >= fromVersion,
      s"bad change range $fromVersion..$to for $targetPath")
    // Maintenance-only fast path: if every commit in (from, to] carries
    // only data_change=false actions (pure OPTIMIZE range), the change
    // feed is empty BY CONSTRUCTION — return it from the O(deltas)
    // manifest metadata without opening a single data file. Mixed
    // ranges fall through to the row-level diff, where compaction's
    // rewrite churn cancels in the exceptAlls anyway.
    val rangeDeltas = listIds(targetPath, "v=")
      .filter(v => v > fromVersion && v <= to)
    val maintenanceOnly = rangeDeltas.nonEmpty && rangeDeltas.forall { v =>
      val d = spark.read.parquet(versionDir(targetPath, v))
      d.columns.contains("data_change") &&
        d.filter(col("data_change") === true).head(1).isEmpty
    }
    if (maintenanceOnly)
      return readVersioned(spark, targetPath, to).limit(0)
        .withColumn("_change_type", lit(""))
    // Diff granularity is (file, dv_file) PAIRS, not files: a DV commit
    // changes a still-live file's rows without flipping its liveness, so
    // a file whose DV changed joins BOTH sides (before-rows with the old
    // DV applied, after-rows with the new), and the exceptAlls cancel
    // everything but the newly-deleted keys — exact row-level CDF under
    // merge-on-read.
    val beforePairs = livePairs(spark, targetPath, fromVersion).toSet
    val afterPairs = livePairs(spark, targetPath, to).toSet
    def readPairs(ps: Set[(String, Option[String])]): DataFrame = {
      val sorted = ps.toSeq.sortBy(_._1)
      if (sorted.isEmpty) readVersioned(spark, targetPath, to).limit(0)
      else applyDv(spark, targetPath,
        spark.read.option("mergeSchema", "true")
          .parquet(sorted.map(p => s"$targetPath/${p._1}"): _*), sorted)
    }
    val addedRows = readPairs(afterPairs -- beforePairs)
    val removedRows = readPairs(beforePairs -- afterPairs)
    // A column on BOTH sides with different types (a type-changing
    // evolution inside the range) cannot be aligned — last-wins in the
    // dtype map would pick one arbitrarily and exceptAll/unionByName
    // would then fail at analysis with an unrelated-looking error.
    val typeConflicts = addedRows.schema
      .filter(f => removedRows.columns.contains(f.name))
      .filter(f => removedRows.schema(f.name).dataType != f.dataType)
    require(typeConflicts.isEmpty,
      s"type-changing evolution unsupported in change ranges: column(s) " +
        s"${typeConflicts.map(_.name).mkString(", ")} have different types " +
        s"across versions $fromVersion..$to of $targetPath — read the " +
        "endpoints via readVersioned and diff explicitly instead")
    val dtypes = (addedRows.schema ++ removedRows.schema)
      .map(f => f.name -> f.dataType).toMap
    val cols = (addedRows.columns ++ removedRows.columns).distinct.toSeq
    def align(df: DataFrame): DataFrame =
      df.select(cols.map(c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(dtypes(c)).as(c)): _*)
    align(addedRows).exceptAll(align(removedRows))
      .withColumn("_change_type", lit("insert"))
      .unionByName(
        align(removedRows).exceptAll(align(addedRows))
          .withColumn("_change_type", lit("delete")))
  }

  /** Key-range snapshot read with manifest data skipping — the SELECT
    * side of the same manifest the MERGE uses: files whose [kmin, kmax]
    * cannot intersect [lo, hi] are never opened (assert with
    * `df.inputFiles`), and the residual filter re-applies the bounds
    * row-level. At scale this is Delta's file pruning for key lookups
    * and range scans over a non-partition column. */
  def readVersionedKeyRange(spark: SparkSession, targetPath: String,
      keyCol: String, lo: Any, hi: Any, version: Long = -1L): DataFrame = {
    // Second pruning source: if a Z-order stats sidecar exists and
    // carries keyCol, intersect its per-file [min, max] with the
    // manifest's — on a Z-table whose manifest key ranges overlap
    // across files (the z-curve interleaves the key), the sidecar is
    // usually the sharper of the two. Files absent from the sidecar
    // (post-write upserts) pass through on the manifest bound alone.
    val zstats = zSidecarStats(spark, targetPath, keyCol)
    val zOverlap = (f: String) => zstats.forall(_.get(f).forall {
      case (vmin, vmax) =>
        !(LongBound(hi).exists(_ < vmin) || LongBound(lo).exists(_ > vmax))
    })
    val pairs = manifestAt(spark, targetPath, version)
      .filter(!(col("kmax") < lit(lo) || col("kmin") > lit(hi)))
      .select("file", "dv_file").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
      .filter(p => zOverlap(p._1))
    if (pairs.isEmpty) readVersioned(spark, targetPath, version).filter(lit(false))
    else {
      val base = spark.read.option("mergeSchema", "true")
        .parquet(pairs.map(p => s"$targetPath/${p._1}"): _*)
      applyDv(spark, targetPath, base, pairs)
        .filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi))
    }
  }

  /** The numeric value of a range bound for sidecar pruning, or None if
    * it isn't an integral type (sidecar stats are longs; a non-integral
    * bound disables the sidecar cut, never the manifest one). */
  private def LongBound(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** Per-file [min, max] of `c` from the `_zstats` sidecar a
    * [[Zorder.writeZTableDims]] write leaves beside the table, or None
    * when there is no sidecar / the sidecar doesn't cover `c`. Driver
    * work is O(files) — the same bound as the manifest itself. */
  private def zSidecarStats(spark: SparkSession, targetPath: String,
      c: String): Option[Map[String, (Long, Long)]] = {
    // [[optimizeZTable]] refreshes the sidecar with an atomic two-rename
    // swap (old dir aside, new dir in). A reader landing exactly between
    // the renames sees no dir for a few milliseconds — retry through the
    // window instead of misreporting "table has no sidecar". The retry
    // is GATED on evidence of an in-flight swap (a sibling `.tmp-*` /
    // `.old-*` dir): a table that legitimately has no sidecar returns
    // None immediately instead of paying 300 ms of sleeps on every
    // colRange read, and the catch is narrowed to read-path failures so
    // genuine sidecar corruption surfaces instead of being retried away.
    var attempt = 0
    while (attempt < 3) {
      attempt += 1
      val dir = new java.io.File(Zorder.zstatsDir(targetPath))
      try {
        if (dir.exists()) {
          val stats = spark.read.parquet(dir.toString)
          val (mn, mx) = (s"${c}__min", s"${c}__max")
          if (!stats.columns.contains(mn)) return None
          return Some(stats.select(col("file"), col(mn), col(mx)).collect()
            .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap)
        }
        if (!zSwapInFlight(dir)) return None
        Thread.sleep(50L * attempt)
      } catch {
        case e @ (_: java.io.IOException
            | _: org.apache.spark.sql.AnalysisException) =>
          // dir vanished between exists() and the read (swap window) —
          // retry; rethrow once the retries are spent
          if (attempt >= 3) throw e
          Thread.sleep(50L * attempt)
      }
    }
    None
  }

  /** Evidence that an [[optimizeZTable]] sidecar swap is mid-flight: a
    * sibling `_zstats.tmp-*` (new sidecar being staged) or
    * `_zstats.old-*` (old sidecar moved aside) directory. */
  private def zSwapInFlight(zstatsDir: java.io.File): Boolean = {
    val base = zstatsDir.getName
    val sib = Option(zstatsDir.getParentFile).map(_.list()).flatMap(Option(_))
      .getOrElse(Array.empty[String])
    sib.exists(n => n.startsWith(s"$base.tmp-") || n.startsWith(s"$base.old-"))
  }

  /** Snapshot range read pruned by the Z-ORDER STATS SIDECAR: the
    * general-reader twin of [[readVersionedKeyRange]] for any clustered
    * dimension that is NOT the manifest key — the manifest's kmin/kmax
    * serve only its one key, but a [[Zorder.writeZTableDims]] table
    * carries per-file [min, max] for EVERY clustered column, so a
    * predicate on any of them skips files here exactly as Delta's
    * multi-column file stats do. Files missing from the sidecar
    * (post-write upserts through the normal manifest/DV paths) are
    * conservatively read; deletion vectors are applied the same as
    * every other versioned read; the residual filter re-applies the
    * bounds row-level. Fails loudly if no sidecar covers `c` — a silent
    * full-scan fallback would read as "pruned" in a benchmark. */
  def readVersionedColRange(spark: SparkSession, targetPath: String,
      c: String, lo: Long, hi: Long, version: Long = -1L): DataFrame = {
    val stats = zSidecarStats(spark, targetPath, c).getOrElse(
      throw new IllegalArgumentException(
        s"$targetPath has no z-stats sidecar covering $c — use " +
          "readVersionedKeyRange for the manifest key, or filter a " +
          "readVersioned scan"))
    val v = if (version > 0) version else currentVersion(targetPath)
    val keep = livePairs(spark, targetPath, v).filter { case (f, _) =>
      stats.get(f) match {
        case Some((vmin, vmax)) => !(vmax < lo || vmin > hi)
        case None => true // unskippable newcomer — read conservatively
      }
    }
    if (keep.isEmpty) readVersioned(spark, targetPath, v).filter(lit(false))
    else {
      val base = spark.read.option("mergeSchema", "true")
        .parquet(keep.map(p => s"$targetPath/${p._1}"): _*)
      applyDv(spark, targetPath, base, keep)
        .filter(col(c) >= lit(lo) && col(c) <= lit(hi))
    }
  }

  /** Incremental OPTIMIZE ZORDER — re-cluster ONLY the live files that
    * data skipping cannot serve: files missing from the z-stats sidecar
    * (post-write appends/upserts through the normal manifest paths) and
    * files carrying a deletion vector (rewritten with the DV folded, so
    * the replacement is DV-free — [[optimizeTable]]'s REORG semantics).
    * Already-clustered DV-free files are untouched, so the cost is
    * O(unclustered + DV'd data), NOT O(table) — what makes periodic
    * re-clustering viable at 100 TB, where a classic full-rewrite
    * OPTIMIZE ZORDER is a 100 TB shuffle. The trade: each incremental
    * batch forms its own z-grid whose file rectangles overlap the
    * original layout's (slightly weaker selectivity than one global
    * re-layout), but every live file is sidecar-covered again, so
    * [[readVersionedColRange]] prunes on EVERY clustered dimension.
    *
    * The commit carries data_change = false on every action (rows are
    * re-laid, never changed), so [[readChanges]] returns an empty feed
    * across it without opening a data file. Concurrency follows
    * [[optimizeTable]]: data files are staged + adopted once; only the
    * manifest commit retries against a moving head, and if any source
    * file was concurrently rewritten or re-DV'd the whole pass aborts
    * as a stale no-op (returns 0; its adopted files are orphans that
    * [[vacuum]] reclaims). The sidecar refresh (retained rows of
    * untouched files + fresh stats of the new files) happens after the
    * successful commit via an ATOMIC two-rename swap (tmp dir in, old
    * dir aside) — a concurrent reader sees the old sidecar or the new
    * one whole, never a half-written dir; with the old sidecar the new
    * files are simply uncovered and read unskipped (the sidecar stays
    * a conservative cache).
    *
    * Returns the number of files re-clustered away (0 = already fully
    * clustered, or lost to a conflicting writer). */
  def optimizeZTable(spark: SparkSession, targetPath: String,
      dims: Seq[(String, Long, Long)], nFiles: Int = 4,
      maxAttempts: Int = 5): Int = {
    import spark.implicits._
    require(dims.nonEmpty, "need at least one z dimension")
    val cur = currentVersion(targetPath)
    require(cur > 0, s"$targetPath is not manifest-tracked")
    val statCols = dims.flatMap(d => Seq(s"${d._1}__min", s"${d._1}__max"))
    val sidecarDir = new java.io.File(Zorder.zstatsDir(targetPath))
    // Reclaim swap garbage from CRASHED prior runs: a writer dying
    // mid-swap leaves `_zstats.tmp-<uuid>` / `_zstats.old-<uuid>` dirs
    // that nothing else tracks (vacuum reclaims data files, not these).
    // Age-gated so a concurrent optimize's seconds-wide in-flight swap
    // is never yanked out from under it.
    val staleMs = 10L * 60L * 1000L
    Option(sidecarDir.getParentFile).map(_.listFiles())
      .flatMap(Option(_)).getOrElse(Array.empty[java.io.File])
      .filter { f =>
        val n = f.getName
        (n.startsWith(s"${sidecarDir.getName}.tmp-") ||
          n.startsWith(s"${sidecarDir.getName}.old-")) &&
          System.currentTimeMillis() - f.lastModified() > staleMs
      }
      .foreach(f => deleteRecursively(f.toPath))
    // The sidecar's stat columns must match this call's dims EXACTLY.
    // A superset would pass a forall-subset check and then be rewritten
    // with only this call's columns — silently and permanently dropping
    // the other dims' stats for the whole table (later colRange reads on
    // a dropped dim would throw). A mismatch in either direction means
    // the table's clustered dims are changing → full rewrite, after
    // which the sidecar accurately covers every live file for `dims`.
    val oldStats: Option[DataFrame] =
      if (!sidecarDir.exists()) None
      else {
        val s = spark.read.parquet(sidecarDir.toString)
        val sidecarStatCols = s.columns.toSet - "file" - "rows"
        if (sidecarStatCols == statCols.toSet) Some(s) else None
      }
    val covered: Set[String] = oldStats
      .map(_.select("file").collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)
    val pairs = livePairs(spark, targetPath, cur)
    val rewrite = pairs.filter { case (f, dv) => dv.nonEmpty || !covered(f) }
    if (rewrite.isEmpty) return 0
    val rewriteNames = rewrite.map(_._1)
    val keyCol = dims.head._1
    // Retained sidecar rows collect BEFORE the refresh overwrites the
    // dir they're read from (O(live files) driver rows, like every
    // manifest op here).
    val statsOrder = Seq("file") ++ statCols :+ "rows"
    val keepRows = oldStats.map(
        _.select(statsOrder.map(col): _*)
          .filter(!col("file").isin(rewriteNames: _*))
          .collect().toVector)
      .getOrElse(Vector.empty)
    val staging = s"$targetPath.zopt-staging-${java.util.UUID.randomUUID()}"
    val base = spark.read.option("mergeSchema", "true")
      .parquet(rewriteNames.map(f => s"$targetPath/$f"): _*)
    Zorder.zorderByDims(applyDv(spark, targetPath, base, rewrite), dims,
        nFiles)
      .write.mode("overwrite").parquet(staging)
    val addRows = manifestEntries(spark, staging, keyCol).collect().toVector
    val newStats =
      Zorder.statsFor(spark.read.parquet(staging), dims)
        .select(statsOrder.map(col): _*)
    val statsSchema = newStats.schema
    val newStatRows = newStats.collect().toVector
    adoptStagedFiles(staging, targetPath)
    val addSchema = manifestEntries(spark, targetPath, keyCol).schema
    val kType = addSchema("kmin").dataType
    import scala.jdk.CollectionConverters.SeqHasAsJava
    val addsDf = spark.createDataFrame(
        new java.util.ArrayList(SeqHasAsJava(addRows).asJava), addSchema)
      .withColumn("action", lit("add"))
      .withColumn("data_change", lit(false))
      .withColumn("dv_file", lit(null).cast("string"))
    val removesDf = rewriteNames.sorted.toDF("file").select(col("file"),
      lit(null).cast(kType).as("kmin"), lit(null).cast(kType).as("kmax"),
      lit(null).cast("bigint").as("rows"), lit("remove").as("action"),
      lit(false).as("data_change"), lit(null).cast("string").as("dv_file"))
    var attempt = 0
    while (true) {
      attempt += 1
      if (attempt > maxAttempts)
        throw new java.util.ConcurrentModificationException(
          s"optimizeZTable lost the commit race on $targetPath " +
            s"$maxAttempts times — giving up loudly")
      val head = currentVersion(targetPath)
      // Stale iff any source file is no longer live OR its deletion
      // vector moved under us (same rule as [[optimizeTable]]).
      val headPairs = livePairs(spark, targetPath, head).toMap
      val stale = rewrite.exists { case (f, dv) =>
        !headPairs.get(f).contains(dv)
      }
      if (stale) return 0
      val staged = stageManifest(addsDf.unionByName(removesDf), targetPath)
      if (tryCommit(staged, versionDir(targetPath, head + 1))) {
        // Atomic-swap sidecar refresh: build the new sidecar in a tmp
        // dir, rename the old one aside, rename the new one in, drop
        // the old. A mode=overwrite in place would DELETE the dir
        // before rewriting — a concurrent zSidecarStats in that window
        // found no sidecar and threw. With the swap, readers see the
        // old or the new sidecar atomically; the between-renames gap is
        // two rename syscalls wide and zSidecarStats retries through
        // it. (A writer crash exactly between the renames leaves no
        // `_zstats` — colRange reads then fail LOUDLY, never wrong;
        // rerunning optimizeZTable rebuilds it.)
        val dst = new java.io.File(Zorder.zstatsDir(targetPath))
        val tmp = new java.io.File(
          s"${dst.getPath}.tmp-${java.util.UUID.randomUUID()}")
        val old = new java.io.File(
          s"${dst.getPath}.old-${java.util.UUID.randomUUID()}")
        spark.createDataFrame(
            new java.util.ArrayList(
              SeqHasAsJava(keepRows ++ newStatRows).asJava), statsSchema)
          .coalesce(1)
          .write.mode("overwrite").parquet(tmp.getPath)
        if (dst.exists()) require(dst.renameTo(old),
          s"could not move old sidecar aside: $dst")
        require(tmp.renameTo(dst), s"could not swap in sidecar: $tmp")
        deleteRecursively(old.toPath)
        return rewrite.size
      }
    }
    -1 // unreachable
  }

  /** S11 (file-granular, NON-partition key) — keyed MERGE whose work
    * scales with the files that actually contain matched keys, not the
    * table. Incoming keys range-join the broadcast manifest of the
    * current version; only the hit files are read and merged (latest
    * wins) with ALL the updates (unmatched keys insert); every other
    * live file is untouched — the commit records only `remove` rows for
    * the hit files and `add` rows for the rewritten ones, so the
    * manifest write is O(merge footprint) too (no O(table-files) driver
    * splice). Data files are immutable — prior versions stay readable
    * via [[readVersioned]] until [[vacuum]] drops them.
    *
    * Concurrency: the commit is an atomic rename to `v=N+1`. If a
    * concurrent writer commits N+1 first, this merge RECOMPUTES against
    * the new current version and retries (its staged-then-adopted data
    * files from the lost attempt become unreferenced orphans — invisible
    * to every versioned read, reclaimed by [[vacuum]]), failing loudly
    * after `maxAttempts` lost races. Both of two concurrent merges
    * therefore land, serialized by version — no silent lost update.
    *
    * Crash window: staged data files are adopted into the live dir
    * BEFORE the commit rename. A crash in between leaves orphaned
    * .parquet files that are invisible to every versioned read but make
    * the dir not plain-parquet-readable until [[vacuum]] runs — vacuum
    * deletes any data file no surviving version references, which is
    * exactly the orphan set.
    *
    * Every `compactEvery` commits the delta chain above the last
    * checkpoint is folded into a new checkpoint ([[compactManifest]]),
    * keeping resolution cost bounded on long-lived tables (0 disables).
    */
  def upsertByKeyManifest(spark: SparkSession, updates: DataFrame,
      targetPath: String, keyCol: String,
      allowSchemaEvolution: Boolean = false,
      maxAttempts: Int = 5, compactEvery: Int = 16): Unit = {
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      if (attempt > maxAttempts)
        throw new java.util.ConcurrentModificationException(
          s"upsertByKeyManifest lost the commit race on $targetPath " +
            s"$maxAttempts times — giving up loudly")
      val cur = currentVersion(targetPath)
      committed =
        if (cur == 0L) tryCreate(spark, updates, targetPath, keyCol)
        else tryMerge(spark, updates, targetPath, keyCol,
          allowSchemaEvolution, cur)
    }
    if (compactEvery > 0) {
      val cur = currentVersion(targetPath)
      val lastCkpt = listIds(targetPath, "ckpt=").filter(_ <= cur)
        .foldLeft(0L)(math.max)
      if (cur - lastCkpt >= compactEvery) compactManifest(spark, targetPath, cur)
    }
  }

  /** S11-DV — merge-on-read upsert (Delta deletion vectors): where
    * [[upsertByKeyManifest]] REWRITES every touched file eagerly (a 0.1%
    * update of a 100 TB table rewrites ~every file it grazes), this
    * commits the update as (a) NEW data files holding just the incoming
    * rows and (b) a `dv` manifest action per touched file pointing at a
    * deletion-vector parquet of the superseded keys. No existing data
    * file is read or rewritten — commit cost ∝ update size + existing
    * DV size, never table footprint. Readers ([[readVersioned]],
    * [[readVersionedKeyRange]], [[readChanges]], the eager merge's
    * touched read, [[optimizeTable]]'s rewrite) apply DVs via one
    * anti-join; [[optimizeTable]] FOLDS them: a dv-carrying file is
    * always rewritten (DV applied) and its replacement carries no DV,
    * so post-OPTIMIZE reads are byte-identical to the eager path
    * (MedallionSpec-asserted). The standard trade is read-time: each
    * un-folded DV adds its anti-join rows, so run OPTIMIZE on the same
    * cadence as Delta's `REORG ... APPLY (PURGE)`.
    *
    * Contract: `updates` must be key-unique (Delta MERGE's
    * multiple-source-rows-matched precondition); the DV'd keys are the
    * updates' keys range-overlapping each live file — a key the file
    * doesn't actually hold deletes nothing (the anti-join misses).
    * Concurrency/crash/orphan semantics are [[upsertByKeyManifest]]'s:
    * optimistic rename commit, lost attempts leave vacuum-reclaimable
    * orphans (data files AND dv parquets). */
  def upsertByKeyDv(spark: SparkSession, updates: DataFrame,
      targetPath: String, keyCol: String, nFiles: Int = 2,
      maxAttempts: Int = 5): Unit =
    dvCommitLoop(spark, Some(updates), updates.select(col(keyCol)),
      targetPath, keyCol, nFiles, maxAttempts)

  /** Merge-on-read DELETE: commit only `dv` actions for the files whose
    * key ranges overlap `deleteKeys` (single-column DataFrame of key
    * values) — no data file read or written. [[upsertByKeyDv]]'s
    * semantics minus the inserts. */
  def deleteByKeyDv(spark: SparkSession, deleteKeys: DataFrame,
      targetPath: String, keyCol: String, maxAttempts: Int = 5): Unit =
    dvCommitLoop(spark, None,
      deleteKeys.select(col(deleteKeys.columns.head).as(keyCol)),
      targetPath, keyCol, nFiles = 1, maxAttempts)

  private def dvCommitLoop(spark: SparkSession, newRows: Option[DataFrame],
      keys: DataFrame, targetPath: String, keyCol: String, nFiles: Int,
      maxAttempts: Int): Unit = {
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      if (attempt > maxAttempts)
        throw new java.util.ConcurrentModificationException(
          s"DV commit lost the race on $targetPath $maxAttempts times — " +
            "giving up loudly")
      val cur = currentVersion(targetPath)
      committed =
        if (cur == 0L) newRows match {
          case Some(df) => tryCreate(spark, df, targetPath, keyCol)
          case None => true // deleting from an empty table is a no-op
        }
        else tryDvCommit(spark, newRows, keys, targetPath, keyCol, cur, nFiles)
    }
  }

  /** One optimistic merge-on-read attempt against version `cur`. */
  private def tryDvCommit(spark: SparkSession, newRows: Option[DataFrame],
      keys: DataFrame, targetPath: String, keyCol: String, cur: Long,
      nFiles: Int): Boolean = {
    import spark.implicits._
    val manifest = manifestAt(spark, targetPath, cur)
    val kType = manifest.schema("kmin").dataType
    // (file, dv_file, key) per update key that MAY live in the file
    val hits = keys.select(col(keyCol).as("__k")).distinct()
      .join(broadcast(manifest),
        col("__k") >= col("kmin") && col("__k") <= col("kmax"))
      .select(col("file"), col("dv_file"), col("__k").as(keyCol))
      .localCheckpoint() // one resolution; reused for pairs + dv content
    val touchedPairs = hits.select("file", "dv_file").distinct()
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    val dvRowsOut = scala.collection.mutable.ArrayBuffer.empty[
      (String, String)] // (data file, dv parquet name)
    if (touchedPairs.nonEmpty) {
      // cumulative DV: this commit's pairs ∪ the touched files' prior DVs
      val fresh = hits.select(col("file"), col(keyCol))
      val priorRefs = touchedPairs.collect { case (f, Some(d)) => (f, d) }
      val prior =
        if (priorRefs.isEmpty) fresh.limit(0)
        else {
          def leaf = element_at(split(col("_metadata.file_path"), "/"), -1)
          spark.read.parquet(priorRefs.map(_._2).distinct
              .map(d => s"${dvDir(targetPath)}/$d"): _*)
            .select(col("file"), col(keyCol), leaf.as("__dv_src"))
            .join(broadcast(priorRefs.toDF("file", "__dv_src")),
              Seq("file", "__dv_src"), "left_semi")
            .select(col("file"), col(keyCol))
        }
      val dvName = adoptDvParquet(spark,
        fresh.unionByName(prior).distinct(), targetPath)
      touchedPairs.foreach(p => dvRowsOut += ((p._1, dvName)))
    }
    // new data files for the incoming rows (insert-only when no ranges hit)
    val adds = newRows match {
      case Some(df) =>
        val staging = s"$targetPath.dv-merge-staging-${java.util.UUID.randomUUID()}"
        df.repartitionByRange(math.max(1, nFiles), col(keyCol))
          .write.mode("overwrite").parquet(staging)
        val a = manifestEntries(spark, staging, keyCol)
          .withColumn("action", lit("add"))
          .withColumn("data_change", lit(true))
          .withColumn("dv_file", lit(null).cast("string"))
        // collect BEFORE adopting (entries scan the staging dir);
        // O(new files) rows — bounded by the update, like append's
        val schema = a.schema
        val rows = a.collect().toSeq
        adoptStagedFiles(staging, targetPath)
        Some(spark.createDataFrame(
          new java.util.ArrayList(
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          schema))
      case None => None
    }
    val dvDf = dvRowsOut.toSeq.toDF("file", "dv_file").select(col("file"),
      lit(null).cast(kType).as("kmin"), lit(null).cast(kType).as("kmax"),
      lit(null).cast("bigint").as("rows"), lit("dv").as("action"),
      lit(true).as("data_change"), col("dv_file"))
    val delta = adds match {
      case Some(a) => a.unionByName(dvDf)
      case None => dvDf
    }
    if (adds.isEmpty && dvRowsOut.isEmpty) return true // nothing to commit
    val staged = stageManifest(delta, targetPath)
    tryCommit(staged, versionDir(targetPath, cur + 1))
  }

  /** Write a DV pair set as ONE parquet into the hidden `_dv/` dir;
    * returns its adopted file name. */
  private def adoptDvParquet(spark: SparkSession, pairs: DataFrame,
      targetPath: String): String = {
    import java.nio.file.{Files, Paths}
    val staging = s"$targetPath.dv-staging-${java.util.UUID.randomUUID()}"
    pairs.coalesce(1).write.mode("overwrite").parquet(staging)
    Files.createDirectories(Paths.get(dvDir(targetPath)))
    val dir = new java.io.File(staging)
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val name = part.getName
    Files.move(part.toPath, Paths.get(s"${dvDir(targetPath)}/$name"))
    dir.listFiles().foreach(f => Files.deleteIfExists(f.toPath))
    Files.deleteIfExists(dir.toPath)
    name
  }

  /** First writer: stage + adopt data files, then commit `v=1` (all
    * adds). Non-destructive, unlike [[writeWithManifest]] — losing the
    * v=1 race must not clobber the winner's data. */
  private def tryCreate(spark: SparkSession, df: DataFrame,
      targetPath: String, keyCol: String): Boolean = {
    val staging = s"$targetPath.merge-staging-${java.util.UUID.randomUUID()}"
    df.repartitionByRange(8, col(keyCol)).write.mode("overwrite").parquet(staging)
    val adds = manifestEntries(spark, staging, keyCol)
      .withColumn("action", lit("add"))
    val staged = stageManifest(adds, targetPath)  // forces the staging scan
    adoptStagedFiles(staging, targetPath)
    tryCommit(staged, versionDir(targetPath, 1L))
  }

  /** One optimistic merge attempt against version `cur`; false = lost
    * the commit race (caller retries against the new version). */
  private def tryMerge(spark: SparkSession, updates: DataFrame,
      targetPath: String, keyCol: String, allowSchemaEvolution: Boolean,
      cur: Long): Boolean = {
    import spark.implicits._
    val manifest = manifestAt(spark, targetPath, cur)
    val touchedPairs = updates.select(col(keyCol).as("k")).distinct()
      .join(broadcast(manifest),
        col("k") >= col("kmin") && col("k") <= col("kmax"))
      .select("file", "dv_file").distinct()
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    val touched = touchedPairs.map(_._1).toSet
    // Committed table schema = merged footer schema of the version's live
    // files (schema-only, no data scan). Columns ALREADY committed may be
    // absent from `updates` or from individual touched files (written
    // before an earlier evolution) — those are always reconciled with
    // nulls; only columns NEWLY introduced by `updates` are gated behind
    // allowSchemaEvolution. Without the mergeSchema read here, a merge
    // touching an old+evolved file mix could infer the pre-evolution
    // footer and silently drop the evolved column from rewritten rows.
    val tableCols = readVersioned(spark, targetPath, cur).schema.fieldNames.toSet
    val newCols = updates.columns.toSet -- tableCols
    require(newCols.isEmpty || allowSchemaEvolution,
      s"updates introduce new column(s) ${newCols.mkString(", ")} not in the " +
        "committed table schema; pass allowSchemaEvolution=true to evolve")
    // DV-aware: an eager merge over files carrying deletion vectors must
    // not resurrect DV'd rows — the touched read applies them first.
    val existingTouched =
      if (touched.isEmpty) updates.filter(lit(false))
      else applyDv(spark, targetPath,
        spark.read.option("mergeSchema", "true")
          .parquet(touchedPairs.map(p => s"$targetPath/${p._1}"): _*),
        touchedPairs)
    // Untouched files are NOT rewritten — [[readVersioned]]'s mergeSchema
    // read surfaces any missing columns as null for them.
    val all = existingTouched.withColumn("__upd", lit(0))
      .unionByName(updates.withColumn("__upd", lit(1)),
        allowMissingColumns = true)
    val merged = Cleaning.latestByKey(Seq(keyCol), Seq(col("__upd")))(all)
      .drop("__upd")
    val staging = s"$targetPath.merge-staging-${java.util.UUID.randomUUID()}"
    merged.repartitionByRange(math.max(1, touched.size), col(keyCol))
      .write.mode("overwrite").parquet(staging)
    // Commit delta = adds for the rewritten files + removes for the hit
    // files. The only driver-side file list is `touched` (needed anyway
    // to name the read paths) — bounded by the merge footprint.
    val adds = manifestEntries(spark, staging, keyCol)
      .withColumn("action", lit("add"))
    val kType = adds.schema("kmin").dataType
    val removes = touched.toSeq.toDF("file").select(col("file"),
      lit(null).cast(kType).as("kmin"), lit(null).cast(kType).as("kmax"),
      lit(null).cast("bigint").as("rows"), lit("remove").as("action"))
    val staged = stageManifest(adds.unionByName(removes), targetPath)
    adoptStagedFiles(staging, targetPath)
    tryCommit(staged, versionDir(targetPath, cur + 1))
  }

  /** Append-only commit to a manifest-tracked table: write `df` as NEW
    * range-partitioned files and commit `v=N+1` with add rows only — no
    * existing file is read, rewritten, or removed, so the whole
    * operation is O(appended data) + an O(new-files) manifest delta.
    *
    * This is the incremental-maintenance path for manifest-keyed INDEX
    * tables (the persisted IVF assignment keyed on `cent_id`, the BM25
    * postings keyed on `tok` — [[graft.sim.Similarity.appendToIvfIndex]]
    * / [[graft.text.Bm25.appendToIndex]]), where the key is
    * deliberately NON-unique: the MERGE path's latest-wins-per-key
    * rewrite would collapse an index's many-rows-per-key layout, while
    * an append leaves the prior postings untouched and simply widens the
    * live file set. Per-file key ranges of the new files join the same
    * min/max manifest, so key-range pruning keeps working across
    * build + append generations (the new files' ranges overlap the old
    * ones — pruning selectivity degrades gracefully with generations
    * until [[compactManifest]]/a rebuild re-sorts, same as any LSM-ish
    * layout).
    *
    * Concurrency follows [[upsertByKeyManifest]]: data files are staged
    * + adopted once (content is version-independent), then the commit
    * rename retries against the moving head — the add rows are collected
    * driver-side (O(new files), bounded by the append) so a lost race
    * can re-stage the manifest without re-scanning adopted files. */
  def appendWithManifest(spark: SparkSession, df: DataFrame, targetPath: String,
      keyCol: String, nFiles: Int = 8, maxAttempts: Int = 5): Unit = {
    require(currentVersion(targetPath) > 0,
      s"$targetPath is not manifest-tracked — writeWithManifest creates it")
    val staging = s"$targetPath.append-staging-${java.util.UUID.randomUUID()}"
    df.repartitionByRange(nFiles, col(keyCol)).write.mode("overwrite").parquet(staging)
    val addsDf = manifestEntries(spark, staging, keyCol)
      .withColumn("action", lit("add"))
    val schema = addsDf.schema
    val addRows = addsDf.collect().toSeq  // O(new files) — bounded by the append
    adoptStagedFiles(staging, targetPath)
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      if (attempt > maxAttempts)
        throw new java.util.ConcurrentModificationException(
          s"appendWithManifest lost the commit race on $targetPath " +
            s"$maxAttempts times — giving up loudly")
      val cur = currentVersion(targetPath)
      val staged = stageManifest(
        spark.createDataFrame(
          new java.util.ArrayList(scala.jdk.CollectionConverters
            .SeqHasAsJava(addRows).asJava), schema),
        targetPath)
      committed = tryCommit(staged, versionDir(targetPath, cur + 1))
    }
  }

  /** Drop all but the newest `keepVersions` versions and delete every
    * data file no surviving version references — Delta's VACUUM. This is
    * also the orphan reclaimer: data files adopted by a crashed or
    * race-losing merge attempt are referenced by no version and get
    * deleted here. With keepVersions=1 the table dir becomes
    * plain-parquet-readable again (live files only). A checkpoint is
    * written at the oldest surviving version first, so the kept versions
    * stay resolvable once the older deltas are gone. */
  def vacuum(spark: SparkSession, targetPath: String,
      keepVersions: Int = 1): Unit = {
    import java.nio.file.{Files, Paths}
    val root = new java.io.File(manifestRoot(targetPath))
    require(root.exists(), s"$targetPath is not manifest-tracked")
    val versions = listIds(targetPath, "v=").sorted
    val (dropped, kept) =
      versions.splitAt(math.max(versions.length - keepVersions, 0))
    if (dropped.nonEmpty)
      compactManifest(spark, targetPath, kept.head)  // before deltas vanish
    val keptPairs = kept.flatMap(v => livePairs(spark, targetPath, v))
    val live = keptPairs.map(_._1).toSet
    new java.io.File(targetPath).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !live(f.getName))
      .foreach { f =>
        Files.deleteIfExists(f.toPath)
        Files.deleteIfExists(Paths.get(s"$targetPath/.${f.getName}.crc"))
      }
    // DV parquets no surviving version references (superseded cumulative
    // DVs, folded DVs, lost-race orphans) are reclaimed the same way.
    val liveDv = keptPairs.flatMap(_._2).toSet
    val dvRoot = new java.io.File(dvDir(targetPath))
    if (dvRoot.exists())
      dvRoot.listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !liveDv(f.getName))
        .foreach { f =>
          Files.deleteIfExists(f.toPath)
          Files.deleteIfExists(Paths.get(s"${dvDir(targetPath)}/.${f.getName}.crc"))
        }
    dropped.foreach(v =>
      deleteRecursively(Paths.get(versionDir(targetPath, v))))
    listIds(targetPath, "ckpt=").filter(_ < kept.headOption.getOrElse(0L))
      .foreach(v => deleteRecursively(Paths.get(ckptDir(targetPath, v))))
    // abandoned manifest stagings from crashed commits
    root.listFiles().filter(_.getName.startsWith("staging-"))
      .foreach(f => deleteRecursively(f.toPath))
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
