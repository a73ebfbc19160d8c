package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics by iterative range narrowing —
  * the scalable alternative to a global sort for "the k-th smallest of
  * 10¹² values".
  *
  * A full sort shuffles the entire column; `percentile_approx` gives an
  * approximation with no error certificate. This kernel finds the EXACT
  * k-th smallest integer with log_B(range) filtered scans and one
  * B-row aggregate per round (B = [[Buckets]]): each round histograms
  * the surviving [lo, hi] range into B equal-width buckets, walks the
  * ≤B-row histogram on the driver (bounded — the only driver data is B
  * counts), and descends into the bucket containing rank k. When the
  * range collapses to ≤B distinct integers the histogram IS the value
  * distribution and the answer is read off exactly.
  *
  * At 100 TB: rounds are log₆₄ of the VALUE RANGE (4 rounds for cent
  * amounts up to 10⁷), independent of row count; each scan's range
  * predicate is a pushable min/max filter when the column is stored —
  * row-group skipping makes later (narrow) rounds nearly free. No
  * shuffle at any point: every aggregate is a map-side partial + B-row
  * final. DuckDB replays the result as a rank-k window selection, so
  * the contract is oracle-checked, not asserted.
  */
object Selection {

  private val Buckets = 64L

  /** The exact k-th smallest (1-indexed) of an integral column.
    * Requires 1 ≤ k ≤ df.count; values must be non-null. */
  def exactRank(df: DataFrame, value: Column, k: Long): Long = {
    val vals = df.select(value.cast("long").as("v"))
    val r0 = vals.agg(min("v"), max("v")).head()
    var lo = r0.getLong(0)
    var hi = r0.getLong(1)
    var need = k // rank within [lo, hi]
    while (hi - lo >= Buckets) {
      // ceil width so B buckets always cover [lo, hi]
      val width = (hi - lo) / Buckets + 1
      val histo = vals
        .filter(col("v") >= lo && col("v") <= hi)
        .groupBy(Exact.idiv(col("v") - lo, lit(width)).as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy("b")
        .collect() // ≤ B rows by construction
      var acc = 0L
      var bi = 0
      while (bi < histo.length && acc + histo(bi).getAs[Long]("n") < need) {
        acc += histo(bi).getAs[Long]("n")
        bi += 1
      }
      require(bi < histo.length, s"rank $k exceeds surviving rows")
      val b = histo(bi).getAs[Long]("b")
      need -= acc
      hi = math.min(hi, lo + (b + 1) * width - 1)
      lo = lo + b * width
    }
    val fin = vals
      .filter(col("v") >= lo && col("v") <= hi)
      .groupBy("v").agg(count(lit(1)).as("n"))
      .orderBy("v")
      .collect() // ≤ B distinct values by construction
    var acc = 0L
    var i = 0
    while (i < fin.length && acc + fin(i).getAs[Long]("n") < need) {
      acc += fin(i).getAs[Long]("n")
      i += 1
    }
    require(i < fin.length, s"rank $k exceeds surviving rows")
    fin(i).getAs[Long]("v")
  }
}
