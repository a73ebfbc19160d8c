package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored row inside a top-k buffer. */
final case class ScoredId(score: Double, id: Long)

/** Aggregation buffer: at most k pairs, sorted (score desc, id asc). */
final case class TopKBuf(items: List[ScoredId])

/** Typed Aggregator keeping the k largest (score, id) pairs per group.
  *
  * Why not a window? `row_number().over(partitionBy(g).orderBy(score))`
  * shuffles EVERY candidate row to the group's reducer and sorts. An
  * aggregator participates in partial aggregation: each map task keeps at
  * most k pairs per group, so the shuffle carries k·partitions rows per
  * group instead of all candidates — the difference between shuffling
  * top-k lists and shuffling a 100 TB similarity matrix.
  *
  * Ordering is total — (score desc, id asc) — so results are
  * deterministic and merge-order-independent; ties at equal score resolve
  * to the smaller id, matching the window formulation's tie-break.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: List[ScoredId], v: ScoredId): List[ScoredId] =
    // Fast path: a full buffer whose k-th entry beats v is unchanged —
    // the overwhelmingly common case once a group's top-k stabilizes,
    // and it skips the span/concat allocation entirely.
    if (buf.lengthCompare(k) >= 0 && better(buf.last, v)) buf
    else {
      val (above, below) = buf.span(better(_, v))
      (above ::: v :: below).take(k)
    }

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(buf: TopKBuf, v: (Double, Long)): TopKBuf =
    TopKBuf(insert(buf.items, ScoredId(v._1, v._2)))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(b.items.foldLeft(a.items)(insert))
  override def finish(buf: TopKBuf): TopKBuf = buf
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKAggregator {
  /** Column function: topK(k)(score, id) usable inside groupBy().agg();
    * result is a struct with an `items` array of (score, id) structs. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[(Double, Long)])
    (score, id) => fn(score, id)
  }
}
