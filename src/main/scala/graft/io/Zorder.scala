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

  /** Bits per dimension for an N-ary z-value: ceil(32/n), so the total
    * interleaved width stays ~32 bits however many dimensions share it
    * (2 → 16, 3 → 11, 4 → 8, ...). Grid resolution per dimension drops
    * as dimensions are added — Delta's documented ZORDER trade. */
  def bitsFor(n: Int): Int = { require(n >= 1); math.max(1, (32 + n - 1) / n) }

  /** N-ary bit interleave: dimension d's bit i lands at position
    * i·n + d, the direct generalization of [[zvalue]] (n = 2, bits = 16
    * routes through the Morton magic-mask fast path and is bit-identical
    * — spec-asserted). Inputs must already be bucketized to
    * [0, 2^bits); the expression is a fixed shift/AND/OR tree — pure
    * integer built-ins, whole-stage codegen'd, replayable in DuckDB. */
  def zvalueN(xs: Seq[Column], bits: Int): Column = {
    val n = xs.size
    require(n >= 1 && bits >= 1 && bits.toLong * n <= 62,
      s"interleave of $n dims x $bits bits overflows a signed long")
    if (n == 1) xs.head
    else if (n == 2 && bits == Bits) zvalue(xs(0), xs(1))
    else xs.zipWithIndex.foldLeft(lit(0L)) { case (acc, (x, d)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(
          shiftrightunsigned(x, i).bitwiseAND(lit(1L)), i * n + d))
      }
    }
  }

  /** Bucketize an arbitrary long column onto the FULL [0, 2^bits) grid
    * from its [lo, hi] domain (callers pass the known or observed
    * domain; out-of-range values clamp). Wide domains floor-divide
    * down; NARROW domains scale UP — without the up-scaling a dim whose
    * span is smaller than the grid would leave its high bits constant
    * and the interleave would degenerate to a single-key sort on the
    * wider dims (caught by ScaleSpec on lineitem's 10-value suppkey
    * against its 200-value partkey). Monotone within the dim and pure
    * integer arithmetic either way — replayable bit-for-bit. */
  def bucket(c: Column, lo: Long, hi: Long, bits: Int = Bits): Column = {
    val span = math.max(1L, hi - lo + 1)
    val top = (1L << bits) - 1
    val clamped = least(lit(span - 1), greatest(lit(0L), c - lit(lo)))
    (if (span > top + 1)
      graft.util.Exact.idiv(clamped, lit((span + top) / (top + 1)))
    else if (span == top + 1) clamped
    else graft.util.Exact.idiv(clamped * lit(top), lit(math.max(1L, span - 1))))
      .cast("long")
  }

  /** Cluster `df` for N-dimensional skipping: range-partition into
    * `nFiles` by the interleaved z-value of the bucketized dims (each a
    * (column, domainLo, domainHi) triple), with the z-value as a
    * secondary sort inside each partition so row groups cluster too.
    * The z column is dropped from the output — it is a layout key, not
    * data. ONE repartitionByRange, like any clustered write. */
  def zorderByDims(df: DataFrame, dims: Seq[(String, Long, Long)],
      nFiles: Int): DataFrame = {
    require(dims.nonEmpty, "need at least one z dimension")
    val b = bitsFor(dims.size)
    val z = zvalueN(
      dims.map { case (c, lo, hi) => bucket(col(c), lo, hi, b) }, b)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** 2-D convenience form of [[zorderByDims]] (byte-identical layout:
    * n = 2 interleave rides the Morton fast path). */
  def zorderBy(df: DataFrame, colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long, nFiles: Int): DataFrame =
    zorderByDims(df, Seq((colA, loA, hiA), (colB, loB, hiB)), nFiles)

  /** Per-file (min, max) of a column over a parquet dir — the footer
    * stats a reader's file pruner consults; exposed so specs (and
    * OPTIMIZE reporting) can measure skipping selectivity:
    * files whose [min, max] misses the predicate are never opened. */
  def fileStats(df: DataFrame, c: String): DataFrame =
    df.select(col(c).as("v"), col("_metadata.file_path").as("fp"))
      .groupBy(element_at(split(col("fp"), "/"), -1).as("file"))
      .agg(min("v").as("vmin"), max("v").as("vmax"), count(lit(1)).as("rows"))

  // ------------------------------------------------ manifest integration

  private[io] def zstatsDir(targetPath: String): String =
    targetPath + "/_zstats"

  /** Write `df` as a Z-ORDERED manifest-tracked table (version 1) with a
    * PER-DIM per-file stats sidecar — Delta's `stats` per add-file,
    * scoped to the clustering dimensions: the data lands via
    * [[Sinks.writeWithManifest]] `preclustered = true` (manifest keyed
    * on the FIRST dim, so every existing reader keeps working), and
    * `_zstats/` (leading underscore — invisible to plain reads) holds
    * (file, rows, and `<col>__min`/`<col>__max` per dim) computed in the
    * SAME single scan discipline as the manifest entries.
    * [[Sinks.readVersionedColRange]] / [[readZRange]] then prune on ANY
    * clustered column. At 100 TB this is the OPTIMIZE-output layout
    * step; incremental upserts land through the normal manifest/DV
    * paths (their new files simply carry no z-stats and are never
    * pruned — correct, just unskippable until the next re-cluster,
    * Delta's exact behavior for post-OPTIMIZE writes). */
  def writeZTableDims(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, targetPath: String, dims: Seq[(String, Long, Long)],
      nFiles: Int = 16): Unit = {
    val clustered = zorderByDims(df, dims, nFiles)
    Sinks.writeWithManifest(spark, clustered, targetPath, dims.head._1,
      nFiles, preclustered = true)
    statsFor(spark.read.parquet(targetPath), dims)
      .coalesce(1)
      .write.mode("overwrite").parquet(zstatsDir(targetPath))
  }

  /** The sidecar relation — per-file, per-dim [min, max] (cast long) +
    * row count of `df`'s files, ONE aggregate over the scan. Shared by
    * [[writeZTableDims]] (initial sidecar) and
    * [[Sinks.optimizeZTable]] (refresh rows for re-clustered files),
    * so the two can never drift on schema. */
  private[io] def statsFor(df: DataFrame,
      dims: Seq[(String, Long, Long)]): DataFrame = {
    val aggs = dims.flatMap { case (c, _, _) =>
      Seq(min(col(c)).cast("long").as(s"${c}__min"),
        max(col(c)).cast("long").as(s"${c}__max"))
    } :+ count(lit(1)).as("rows")
    df.select(dims.map(d => col(d._1)) :+
        element_at(split(col("_metadata.file_path"), "/"), -1).as("file"): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** 2-D convenience form of [[writeZTableDims]]. */
  def writeZTable(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      targetPath: String, colA: String, loA: Long, hiA: Long,
      colB: String, loB: Long, hiB: Long, nFiles: Int = 16): Unit =
    writeZTableDims(spark, df, targetPath,
      Seq((colA, loA, hiA), (colB, loB, hiB)), nFiles)

  /** Range read over ANY z-dimension of a [[writeZTableDims]] table —
    * a thin guard over [[Sinks.readVersionedColRange]], which does the
    * sidecar file pruning, the merge-on-read DV anti-join (a Z-table
    * that has since taken `upsertByKeyDv`/`deleteByKeyDv` commits
    * returns neither DV-deleted rows nor stale versions of updated
    * keys; pruning a DV'd file is still safe — a DV only ever REMOVES
    * rows, so the sidecar min/max stays a conservative bound), and the
    * row-level re-filter. Files missing from the sidecar (post-write
    * upserts) are conservatively read. Assert skipping with
    * `.inputFiles`. */
  def readZRange(spark: org.apache.spark.sql.SparkSession,
      targetPath: String, colA: String, colB: String,
      c: String, lo: Long, hi: Long): DataFrame = {
    require(c == colA || c == colB,
      s"$c is not a z-dimension of $targetPath ($colA, $colB)")
    Sinks.readVersionedColRange(spark, targetPath, c, lo, hi)
  }
}
