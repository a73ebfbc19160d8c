package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — the OPTIMIZE ZORDER analog.
  *
  * At 100 TB, data skipping is the cheapest query accelerator there is:
  * engines prune whole files from a scan using per-file min/max column
  * stats, but a file layout sorted on ONE column only skips for that
  * column. Z-ordering interleaves the bits of several columns into one
  * sort key, so files end up covering small HYPER-RECTANGLES of the key
  * space — every z-ordered column gets narrow per-file ranges, and
  * predicates on ANY of them prune files.
  *
  * The z-value is a pure codegen-able column expression (a fixed tree of
  * shifts and ORs — no UDF), the layout pass is one
  * `repartitionByRange(zv)` (range shuffle on sampled z boundaries) plus
  * an in-partition sort, and writers downstream are unchanged.
  */
object Layout {

  /** Morton (Z-curve) interleave of two non-negative int columns using
    * the low `bits` of each: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Values are clamped into [0, 2^bits) by masking — for
    * skewed or wider domains, rank-normalize first. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(am, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Rewrite `df` into `numFiles` z-ordered parquet files at `path`:
    * min-max-normalize both columns to the same `bits` width (unequal
    * domains would otherwise collapse the curve onto the wider column —
    * the one-row stats aggregate here is the same metadata pass every
    * OPTIMIZE implementation runs), then range-partition on the z-value
    * (each file owns a contiguous z-range = a small tile of the
    * (c1, c2) plane) and sort within partitions for row-group-level
    * skipping too. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val top = (1L << bits) - 1
    val s = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    def scaled(c: Column, lo: Double, hi: Double): Column =
      if (!(hi > lo)) lit(0L)
      else least(lit(top),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble)))
        .cast("long")
    df.withColumn("__z", zValue2(
        scaled(col(c1), s.getDouble(0), s.getDouble(1)),
        scaled(col(c2), s.getDouble(2), s.getDouble(3)), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
