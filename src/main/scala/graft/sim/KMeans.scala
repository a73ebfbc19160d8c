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

  /** Deterministic 1-in-`buckets` training-sample predicate on the id
    * column (md5 bucket 0 — [[graft.text.Corpus.hashBucket]], the same
    * engine-portable idiom as the corpus split). `buckets = 1` keeps
    * everything.
    *
    * This is the 100 TB training contract: a codebook needs thousands
    * of training rows, not the corpus — Lloyd iterations over the full
    * corpus are an O(corpus × iters) cost with no quality return past a
    * sample (the assignment pass still covers every vector). Being a
    * pure hash of the id, the sample is reproducible on any engine —
    * oracles replay it with
    * `('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT % buckets = 0`. */
  def trainFilter(buckets: Int): org.apache.spark.sql.Column =
    if (buckets <= 1) lit(true)
    else graft.text.Corpus.hashBucket(col("id"), buckets) === 0

  private def trainLoop(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    // Seed = the k lowest ids of the TRAINING set (for an unsampled
    // dense-id corpus this is exactly the historical id < k seed). k is
    // tiny, so the TakeOrdered is k rows — never a data-scale sort.
    var cents = vecs.orderBy("id").limit(k)
      .select(col("id").as("cid"), col("v").as("c"))
    for (_ <- 1 to iters)
      cents = update(vecs, assign(vecs, cents)).localCheckpoint()
    cents
  }

  /** Train a k-centroid codebook: deterministic md5 1-in-`trainBuckets`
    * training sample ([[trainFilter]]), seed = the sample's k lowest
    * ids, then `iters` assign→update rounds. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, trainBuckets: Int = 1): DataFrame =
    trainLoop(scaledVecs(emb, idCol, vecCol).filter(trainFilter(trainBuckets))
      .localCheckpoint(), k, iters)

  /** Final assignment table (id, cid, d2) for a trained codebook:
    * training reads the 1-in-`trainBuckets` md5 sample, the assignment
    * covers the FULL corpus. The checkpointed scaled vectors feed both —
    * scaling the embeddings is one pass, not two. */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, trainBuckets: Int = 1): DataFrame = {
    val vecs = scaledVecs(emb, idCol, vecCol).localCheckpoint()
    assign(vecs, trainLoop(vecs.filter(trainFilter(trainBuckets)), k, iters))
  }
}
