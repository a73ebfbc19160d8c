package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized aggregate over a
  * manifest-tracked table — the lakehouse answer to "refresh the gold
  * rollup after an upsert without rescanning 100 TB of silver".
  *
  * The maintained view is the self-maintainable aggregate family:
  * per-group row count (`cnt`) and, per tracked column c, its sum
  * (`sum_c`) plus its non-null count (`nn_c`). Counts and sums are
  * closed under insert/delete deltas — apply the signed delta and the
  * result is the aggregate of the new table state, exactly. min/max are
  * deliberately NOT offered: a deleted max needs a group rescan to
  * retract (not self-maintainable), which would silently reintroduce
  * the O(table) refresh this module exists to avoid.
  *
  * The `nn_c` column is the null subtlety that breaks naive sum
  * maintenance: SQL `sum` over an all-null group is NULL, not 0, so a
  * group whose last non-null value is deleted must flip its sum back to
  * NULL. Maintaining the non-null count makes that decidable from the
  * aggregate alone: `sum_c` is NULL iff `nn_c = 0`.
  *
  * Scale shape: [[deltaOf]] aggregates the change feed with map-side
  * partials — O(changed rows), which [[Sinks.readChanges]] already
  * bounds by the files whose liveness flipped, never the table. The
  * [[applyDelta]] merge joins the delta against the PRIOR AGGREGATE —
  * O(|aggregate| + |delta|) and the delta side is usually broadcast-
  * small; the source table is never rescanned. Sums must be exact types
  * (LONG / DECIMAL — the [[graft.util.Exact]] discipline); float sums
  * would drift from a full recompute by reassociation.
  */
object Materialized {

  private def sumCol(c: String) = s"sum_$c"
  private def nnCol(c: String) = s"nn_$c"

  /** The full aggregate of `df`: groupCols, cnt, and (sum_c, nn_c) per
    * tracked column. The reference shape for both the initial build and
    * the spec's incremental-vs-full equivalence check. */
  def aggOf(df: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +:
      sumCols.flatMap(c => Seq(
        sum(col(c)).as(sumCol(c)),
        count(col(c)).as(nnCol(c))))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Signed per-group delta from a [[Sinks.readChanges]] feed: inserts
    * contribute +1/+x, deletes −1/−x. One partial-agg shuffle over the
    * change rows only. */
  def deltaOf(changes: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val ins = col("_change_type") === "insert"
    val signedOne = when(ins, lit(1L)).otherwise(lit(-1L))
    def signed(c: Column) = when(ins, c).otherwise(-c)
    val aggs = sum(signedOne).as("cnt") +:
      sumCols.flatMap(c => Seq(
        sum(signed(col(c))).as(sumCol(c)),
        sum(when(col(c).isNotNull, signedOne).otherwise(lit(0L))).as(nnCol(c))))
    changes.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** prev ⊕ delta: full-outer merge on the group keys, groups whose
    * count reaches 0 drop out, sums flip to NULL when their non-null
    * count does. Both sides carry the [[aggOf]] column layout. */
  def applyDelta(prev: DataFrame, delta: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val metric = "cnt" +: sumCols.flatMap(c => Seq(sumCol(c), nnCol(c)))
    val p = prev.select(groupCols.map(col) ++
      metric.map(m => col(m).as(s"p_$m")): _*)
    val d = delta.select(groupCols.map(col) ++
      metric.map(m => col(m).as(s"d_$m")): _*)
    def merged(m: String): Column = {
      val zero = lit(0L).cast(prev.schema(m).dataType)
      coalesce(col(s"p_$m"), zero) + coalesce(col(s"d_$m"), zero)
    }
    val out = groupCols.map(col) ++ Seq(merged("cnt").as("cnt")) ++
      sumCols.flatMap(c => Seq(
        when(merged(nnCol(c)) === 0L, lit(null).cast(prev.schema(sumCol(c)).dataType))
          .otherwise(merged(sumCol(c))).as(sumCol(c)),
        merged(nnCol(c)).as(nnCol(c))))
    p.join(d, groupCols, "full_outer")
      .select(out: _*)
      .filter(col("cnt") =!= 0L)
  }

  /** Build the aggregate from the current table state. Returns the
    * aggregate and the manifest version it reflects — the caller stores
    * both; the version is the `fromVersion` of the next refresh. */
  def fullRefresh(spark: SparkSession, sourcePath: String,
      groupCols: Seq[String], sumCols: Seq[String]): (DataFrame, Long) = {
    val v = Sinks.currentVersion(sourcePath)
    (aggOf(Sinks.readVersioned(spark, sourcePath, v), groupCols, sumCols), v)
  }

  /** Signed delta of the star-join view aggOf(fact ⋈ dim) under
    * FACT-side changes: join distributes over the signed delta —
    * Δ(A ⋈ B) = ΔA ⋈ B when only A changed — so the delta is the
    * change feed (O(|Δ|) rows, already file-bounded by
    * [[Sinks.readChanges]]) equi-joined to the dim (broadcast-small by
    * the star contract) and signed-aggregated; the fact is NEVER
    * rescanned. Inner-join semantics carry over exactly: a changed
    * fact row with no dim match contributes nothing, same as in the
    * view definition.
    *
    * Contract: `dim` must be the SAME relation the view was built
    * with. A dim-side change invalidates every joined fact row's
    * contribution for that key — inherently a per-key fact rescan (the
    * min/max retraction analogue) — so dim updates take
    * [[fullJoinRefresh]], deliberately not a silent wrong answer. */
  def joinDeltaOf(changes: DataFrame, dim: DataFrame, joinKeys: Seq[String],
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    deltaOf(changes.join(dim, joinKeys), groupCols, sumCols)

  /** Build the star-join aggregate from the current fact state. Same
    * store-the-version contract as [[fullRefresh]]. */
  def fullJoinRefresh(spark: SparkSession, sourcePath: String,
      dim: DataFrame, joinKeys: Seq[String], groupCols: Seq[String],
      sumCols: Seq[String]): (DataFrame, Long) = {
    val v = Sinks.currentVersion(sourcePath)
    (aggOf(Sinks.readVersioned(spark, sourcePath, v).join(dim, joinKeys),
      groupCols, sumCols), v)
  }

  /** Advance a stored star-join aggregate using only the fact change
    * feed ⋈ dim — bit-identical (spec-asserted) to [[fullJoinRefresh]]
    * at the same version. */
  def incrementalJoinRefresh(spark: SparkSession, sourcePath: String,
      dim: DataFrame, prev: DataFrame, fromVersion: Long,
      joinKeys: Seq[String], groupCols: Seq[String],
      sumCols: Seq[String]): (DataFrame, Long) = {
    val to = Sinks.currentVersion(sourcePath)
    if (to == fromVersion) return (prev, to)
    val delta = joinDeltaOf(
      Sinks.readChanges(spark, sourcePath, fromVersion, to), dim,
      joinKeys, groupCols, sumCols)
    (applyDelta(prev, delta, groupCols, sumCols), to)
  }

  /** Advance a stored aggregate from `fromVersion` to the current
    * version using only the change feed — never rescanning the source.
    * Identical (bit-for-bit, spec-asserted) to [[fullRefresh]] at the
    * same version. Same loud-failure contract as [[Sinks.readChanges]]:
    * both endpoints must still be committed (not vacuumed). */
  def incrementalRefresh(spark: SparkSession, sourcePath: String,
      prev: DataFrame, fromVersion: Long, groupCols: Seq[String],
      sumCols: Seq[String]): (DataFrame, Long) = {
    val to = Sinks.currentVersion(sourcePath)
    if (to == fromVersion) return (prev, to)
    val delta = deltaOf(
      Sinks.readChanges(spark, sourcePath, fromVersion, to), groupCols, sumCols)
    (applyDelta(prev, delta, groupCols, sumCols), to)
  }
}
