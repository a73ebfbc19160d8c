package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator summing bigint arrays elementwise.
  *
  * Why: a per-cluster centroid mean formulated as posexplode →
  * groupBy(cid, dim) pushes dims× the row count through the projection
  * and shuffles (cid, dim)-keyed partial sums — 64 rows per cluster per
  * map task at 64 dims. This aggregator participates in partial
  * aggregation on whole vectors: each map task emits ONE 64-long array
  * per cluster, so the shuffle carries k rows instead of k·dims, and no
  * row blowup ever materializes. [[graft.sim.KMeans.update]] and the PQ
  * joint trainer are the motivating sites.
  *
  * Semantics are identical to SUM(comp) GROUP BY (cid, dim): integer
  * addition is associative and commutative, so partial/merge order
  * cannot change the result, and overflow raises via Math.addExact
  * exactly as the column SUM would under ANSI mode (the fixed-point
  * k-means bound keeps real sums far below 2⁶³ — see KMeans scaladoc).
  * Empty groups cannot occur (a group exists only if a row reduced into
  * it); mismatched lengths fail loudly rather than truncating. */
class VecSumAggregator extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def addInto(acc: Array[Long], v: Array[Long]): Array[Long] =
    if (acc.isEmpty) v.clone()
    // an EMPTY v is another partition's untouched zero buffer (that
    // partition had no rows for this group after filtering) — identity,
    // not a length mismatch. Real input vectors are never empty at the
    // call sites; a genuinely mismatched pair still fails below.
    else if (v.isEmpty) acc
    else {
      require(acc.length == v.length,
        s"vec_sum: mismatched lengths ${acc.length} vs ${v.length}")
      var i = 0
      while (i < acc.length) { acc(i) = Math.addExact(acc(i), v(i)); i += 1 }
      acc
    }

  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] =
    addInto(buf, v)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    addInto(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object VecSum {
  private lazy val fn =
    udaf(new VecSumAggregator, ExpressionEncoder[Array[Long]]())

  /** vec_sum(v): elementwise sum of array<bigint> per group. */
  def sum(v: Column): Column = fn(v)
}
