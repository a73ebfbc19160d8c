package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — Delta's `OPTIMIZE ... ZORDER BY` for
  * the manifest lakehouse: interleave the bits of two bucketized
  * columns and range-partition files by the interleaved value, so each
  * data file covers a small RECTANGLE of the 2-D key space and per-file
  * min/max footers become selective for predicates on EITHER column —
  * the layout that makes multi-dimension data skipping work where
  * single-key range partitioning serves only its one key.
  *
  * Everything is integer arithmetic over Spark built-ins (shifts, masks,
  * ors — whole-stage codegen'd, and bit-identical in DuckDB for the
  * oracle): no UDF, no custom expression needed.
  *
  * Scale shape: `zorderBy` is ONE repartitionByRange (a sample + range
  * shuffle — the same cost as any clustered write); the z-value itself
  * fuses into the scan projection. At 100 TB this is the layout step of
  * an OPTIMIZE job, not a query-time cost.
  */
object Zorder {

  /** Bits per dimension (16 → 32-bit z-values, ≤ 65 536 buckets/dim —
    * far finer than any practical file grid). */
  val Bits = 16

  /** Spread the low 16 bits of `v` to even bit positions (Morton magic
    * masks, the classic doubling sequence). `v` must be in [0, 2^16). */
  def spread(v: Column): Column = {
    // x = (x | x<<8) & 0x00FF00FF; (| x<<4) & 0x0F0F0F0F;
    // (| x<<2) & 0x33333333; (| x<<1) & 0x55555555
    val a = shiftleft(v, 8).bitwiseOR(v).bitwiseAND(lit(0x00FF00FFL))
    val b = shiftleft(a, 4).bitwiseOR(a).bitwiseAND(lit(0x0F0F0F0FL))
    val c = shiftleft(b, 2).bitwiseOR(b).bitwiseAND(lit(0x33333333L))
    shiftleft(c, 1).bitwiseOR(c).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit buckets: x in even bits, y in
    * odd. Monotone within each dimension's bucket — the clustering
    * key. */
  def zvalue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Bucketize an arbitrary long column into [0, 2^16) by floor
    * division of its [lo, hi] range (callers pass the known or observed
    * domain; out-of-range values clamp). Pure integer — replayable. */
  def bucket(c: Column, lo: Long, hi: Long): Column = {
    val span = math.max(1L, hi - lo + 1)
    val per = math.max(1L, (span + (1L << Bits) - 1) / (1L << Bits))
    least(lit((1L << Bits) - 1),
      greatest(lit(0L), graft.util.Exact.idiv(c - lit(lo), lit(per))))
      .cast("long")
  }

  /** Cluster `df` for 2-D skipping: range-partition into `nFiles` by
    * the z-value of the two bucketized columns (plus the z-value as a
    * secondary sort inside each partition so row groups cluster too).
    * The z column is dropped from the output — it is a layout key, not
    * data. */
  def zorderBy(df: DataFrame, colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long, nFiles: Int): DataFrame = {
    val z = zvalue(bucket(col(colA), loA, hiA), bucket(col(colB), loB, hiB))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Per-file (min, max) of a column over a parquet dir — the footer
    * stats a reader's file pruner consults; exposed so specs (and
    * OPTIMIZE reporting) can measure skipping selectivity:
    * files whose [min, max] misses the predicate are never opened. */
  def fileStats(df: DataFrame, c: String): DataFrame =
    df.select(col(c).as("v"), col("_metadata.file_path").as("fp"))
      .groupBy(element_at(split(col("fp"), "/"), -1).as("file"))
      .agg(min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("rows"))

  // ------------------------------------------------ manifest integration

  private def zstatsDir(targetPath: String): String = targetPath + "/_zstats"

  /** Write `df` as a Z-ORDERED manifest-tracked table (version 1) with a
    * TWO-column per-file stats sidecar — Delta's `stats` per add-file,
    * scoped to the two clustering dimensions: the data lands via
    * [[Sinks.writeWithManifest]] `preclustered = true` (manifest keyed
    * on `colA`, so every existing reader keeps working), and
    * `_zstats/` (leading underscore — invisible to plain reads) holds
    * (file, amin, amax, bmin, bmax, rows) computed in the SAME single
    * scan discipline as the manifest entries. [[readZRange]] then
    * prunes on EITHER column. At 100 TB this is the OPTIMIZE-output
    * layout step; incremental upserts land through the normal
    * manifest/DV paths (their new files simply carry no z-stats and
    * are never pruned — correct, just unskippable until the next
    * re-cluster, Delta's exact behavior for post-OPTIMIZE writes). */
  def writeZTable(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      targetPath: String, colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long, nFiles: Int = 16): Unit = {
    val clustered = zorderBy(df, colA, loA, hiA, colB, loB, hiB, nFiles)
    Sinks.writeWithManifest(spark, clustered, targetPath, colA,
      nFiles, preclustered = true)
    val src = spark.read.parquet(targetPath)
    src.select(col(colA).as("a"), col(colB).as("b"),
        element_at(split(col("_metadata.file_path"), "/"), -1).as("file"))
      .groupBy("file")
      .agg(min("a").as("amin"), max("a").as("amax"),
        min("b").as("bmin"), max("b").as("bmax"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(zstatsDir(targetPath))
  }

  /** Range read over EITHER z-dimension of a [[writeZTable]] table:
    * prune to the files whose sidecar [min, max] on `c` (must be the
    * table's colA or colB) overlaps [lo, hi], read only those, and
    * re-apply the bounds row-level. Files missing from the sidecar
    * (post-write upserts) are conservatively read. Assert skipping
    * with `.inputFiles`. */
  def readZRange(spark: org.apache.spark.sql.SparkSession,
      targetPath: String, colA: String, colB: String,
      c: String, lo: Long, hi: Long): DataFrame = {
    require(c == colA || c == colB,
      s"$c is not a z-dimension of $targetPath ($colA, $colB)")
    val (mn, mx) = if (c == colA) ("amin", "amax") else ("bmin", "bmax")
    val stats = spark.read.parquet(zstatsDir(targetPath))
      .select(col("file"), col(mn).as("vmin"), col(mx).as("vmax"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val live = Sinks.manifestAt(spark, targetPath)
      .select("file").collect().map(_.getString(0)).toSeq
    val keep = live.filter(f => stats.get(f) match {
      case Some((vmin, vmax)) => !(vmax < lo || vmin > hi)
      case None => true // unskippable newcomer — read conservatively
    })
    if (keep.isEmpty)
      spark.read.parquet(live.map(f => s"$targetPath/$f"): _*)
        .filter(org.apache.spark.sql.functions.lit(false))
    else spark.read.parquet(keep.map(f => s"$targetPath/$f"): _*)
      .filter(col(c) >= lit(lo) && col(c) <= lit(hi))
  }
}
