package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiler — the "dataset card" statistics a curation
  * pipeline publishes next to every corpus drop: per column the null
  * count, exact distinct count, and min/max (canonicalized to string so
  * one long-format schema covers every column type).
  *
  * Plan shape: ONE aggregation pass computes every column's four
  * statistics side by side (Spark plans the multi-distinct aggregate
  * with a single Expand over the scan — still one read of the data),
  * and the 1-row wide result is unpivoted driver-free with `stack`
  * into (col_name, n_null, n_distinct, min_s, max_s) — |cols| rows
  * total, so the post-scan cost is O(1) in the corpus size.
  *
  * 100 TB note: the Expand for c distinct aggregates replicates scan
  * rows c-fold before the partial aggregate; where that bites, swap
  * `count_distinct` for the fixed-state estimators next door
  * ([[graft.sketch.Sketch.hllRegisters]] / `kmvSketch`) — the profile
  * schema stays identical, which is why the estimate column is named
  * `n_distinct` rather than `exact`.
  */
object Profile {

  /** Profile `cols` of `df` in one aggregation pass. Returns one row
    * per column: (col_name, n_rows, n_null, n_distinct, min_s, max_s),
    * min/max over the column's own type, then cast to string. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    one.select(col("__n").as("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs) " +
        "AS (col_name, n_null, n_distinct, min_s, max_s)"))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
  }
}
