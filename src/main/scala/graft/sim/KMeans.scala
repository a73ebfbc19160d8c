package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic k-means codebook training for IVF (trained-centroid
  * variant of the seeded codebook in [[Similarity]]).
  *
  * Float k-means is engine-divergent twice over: centroid means are
  * order-dependent float sums, and distance comparisons near ties flip
  * with the summation order. This formulation is EXACT end-to-end, so
  * training is reproducible bit-for-bit on any engine/partitioning:
  *
  *  - components are fixed-point BIGINTs: floor(x · 2²⁰). Scaling by a
  *    power of two is EXACT float arithmetic and floor has no rounding
  *    ties, so the quantization is bit-identical on every engine (a
  *    decimal cast is not — engines disagree on float→decimal
  *    half-way rounding);
  *  - distances are integer sums of squared diffs (|comp| ≤ ~2·10⁶ →
  *    d² ≤ 64·4.4·10¹² — no BIGINT overflow at 64 dims);
  *  - centroid update is floor division on shifted positives
  *    ((s + n·SHIFT) div n − SHIFT), identical under trunc- and
  *    floor-division engines;
  *  - argmin ties break on (distance, centroid id) — total order.
  *
  * Scale shape: assignment is a broadcast of k tiny centroid arrays
  * against the vector table (no shuffle of vectors); the update is one
  * (cid, dim)-keyed aggregation — k·dims result rows. Rounds are
  * O(iters) such passes, the textbook distributed Lloyd layout.
  */
object KMeans {

  private val Shift = 2000000L // > max |scaled component|, keeps dividends positive

  /** (id, v: array<bigint>) — fixed-point (×2²⁰, floored) view of a
    * float-vector column. */
  def scaledVecs(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))")
        .as("v"))

  /** Nearest-centroid assignment: (id, cid, d2). */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .select(col("id"), col("cid"),
        expr("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)")
          .as("d2"))
      .groupBy("id").agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("id"), col("m.cid").as("cid"), col("m.d2").as("d2"))

  /** Lloyd update: per-cluster fixed-point mean (floor division on
    * shifted positives — engine-portable). Empty clusters drop out.
    * The per-dim sums run through the [[graft.plans.VecSum]] typed
    * aggregator — whole vectors in partial aggregation, so the shuffle
    * carries k array rows instead of k·dims (cid, dim) rows and the
    * posexplode row blowup never materializes. Identical arithmetic
    * (associative integer sums; transform preserves dim order). */
  def update(vecs: DataFrame, assigned: DataFrame): DataFrame =
    assigned.join(vecs, "id")
      .groupBy("cid")
      .agg(graft.plans.VecSum.sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("cid"),
        expr(s"transform(s, x -> (x + n * ${Shift}L) div n - ${Shift}L)").as("c"))

  private def trainLoop(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = vecs.filter(col("id") < k)
      .select(col("id").as("cid"), col("v").as("c"))
    for (_ <- 1 to iters)
      cents = update(vecs, assign(vecs, cents)).localCheckpoint()
    cents
  }

  /** Train a k-centroid codebook: init = vectors with id < k (the
    * deterministic seed), then `iters` assign→update rounds. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    trainLoop(scaledVecs(emb, idCol, vecCol).localCheckpoint(), k, iters)

  /** Final assignment table (id, cid, d2) for a trained codebook. The
    * checkpointed scaled vectors feed BOTH training and the final
    * assignment — scaling the embeddings is one pass, not two. */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val vecs = scaledVecs(emb, idCol, vecCol).localCheckpoint()
    assign(vecs, trainLoop(vecs, k, iters))
  }
}
