package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest-neighbor search — the 100 TB ANN memory
  * story: corpus vectors are stored as `subspaces` one-byte-ish codes
  * (nearest sub-centroid per subvector) instead of `dims` floats, so the
  * scanned index is codes ≪ vectors, and only the final rerank touches
  * real vectors. Composes the two pieces the engine already has:
  * [[KMeans]] fixed-point Lloyd training (per-subvector codebooks) and
  * the IVF coarse probing of [[Similarity.ivfTopK]].
  *
  * Pipeline (classic Jégou et al. IVF-ADC, re-expressed Spark-first):
  *  1. coarse quantizer: deterministic stride codebook, cosine cells —
  *     identical plan shape to `sim_ivf_topk` (broadcast centroids, one
  *     corpus scan, nprobe probed cells per query);
  *  2. product quantizer: each vector is split into `subspaces`
  *     contiguous `subDim`-dim subvectors; per subspace a k-means
  *     codebook is trained in EXACT fixed-point integers
  *     ([[KMeans.train]] — bit-reproducible on any engine), and every
  *     corpus vector is encoded as its nearest sub-centroid id per
  *     subspace (ONE scan against the broadcast codebooks);
  *  3. asymmetric-distance scan: the query stays full-precision — its
  *     per-(subspace, centroid) squared distances form a tiny broadcast
  *     distance table; a candidate's approximate distance is the SUM of
  *     table lookups selected by its codes (integer arithmetic → exact,
  *     oracle-replayable);
  *  4. exact rerank: the `rerank` best ADC candidates per query are
  *     re-scored with the codegen'd cosine kernel on real vectors, top-k
  *     emitted in the standard (query_id, rank, neighbor_id, sim) shape.
  *
  * Scale notes: training is `subspaces` small Lloyd loops (sample the
  * training set at real scale — codebooks need thousands of rows, not
  * the corpus); encoding and the ADC scan are single passes with only
  * broadcast joins on the big side; the shuffle is the per-query top-R
  * window over |probed members| rows, the same shape `sim_ivf_topk`
  * already carries. Everything before the final 4dp-rounded cosine is
  * integer-exact, so the DuckDB oracle replays training, codes, ADC,
  * and rerank bit-for-bit. */
object PQ {

  /** Fixed-point subvector view: (id, m, v) for every subspace m —
    * slice, cast double, scale by 2²⁰, floor (the [[KMeans.scaledVecs]]
    * quantization applied per slice; slicing commutes with scaling). */
  def subspaceVecs(df: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("id"),
      posexplode(expr(
        s"""transform(sequence(0, ${subspaces - 1}),
            m -> transform(slice($vecCol, m * $subDim + 1, $subDim),
                           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)))"""
      )).as(Seq("m", "v")))

  /** Per-subspace codebooks (m, cid, c): the same deterministic recipe
    * as `sim_kmeans` per subspace (seed = rows with id < ksub, exact
    * integer Lloyd rounds, argmin ties on (d2, cid), floor-division
    * means) — but all `subspaces` trainings run as ONE joint Lloyd loop
    * with the subspace id folded into the keys, so each iteration is a
    * single pass over the data regardless of M (an M-way driver loop of
    * separate trainings costs M× the actions for identical results —
    * bit-identical, since the subspaces never mix: every aggregation
    * and argmin is keyed by m). */
  def trainCodebooks(emb: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, subDim: Int, ksub: Int, iters: Int,
      trainBuckets: Int = 1): DataFrame = {
    // Training reads the deterministic md5 1-in-`trainBuckets` sample
    // ([[KMeans.trainFilter]] — the 100 TB contract: sub-codebooks need
    // thousands of rows, not the corpus); encode() still covers every
    // vector. Seed = each subspace's slice of the sample's ksub lowest
    // ids (every id carries all M subspaces, so one tiny id list seeds
    // all M trainings — for an unsampled dense-id corpus this is the
    // historical id < ksub seed).
    val subs = subspaceVecs(emb, idCol, vecCol, subspaces, subDim)
      .filter(KMeans.trainFilter(trainBuckets))
      .localCheckpoint()
    val seedIds = subs.select("id").distinct().orderBy("id").limit(ksub)
    var cents = subs.join(broadcast(seedIds), Seq("id"))
      .select(col("m"), col("id").as("cid"), col("v").as("c"))
    for (_ <- 1 to iters) {
      val assigned = subs.join(broadcast(cents), Seq("m"))
        .select(col("id"), col("m"), col("cid"),
          expr("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)")
            .as("d2"))
        .groupBy("id", "m").agg(min(struct(col("d2"), col("cid"))).as("mm"))
        .select(col("id"), col("m"), col("mm.cid").as("cid"))
      cents = assigned.join(subs, Seq("id", "m"))
        .groupBy("m", "cid")
        .agg(graft.plans.VecSum.sum(col("v")).as("s"), count(lit(1)).as("n"))
        .select(col("m"), col("cid"),
          expr("transform(s, x -> (x + n * 2000000L) div n - 2000000L)").as("c"))
        .localCheckpoint()
    }
    cents
  }

  /** PQ codes (id, m, code): nearest sub-centroid per (vector,
    * subspace), ties on (d2, cid) — one scan of the corpus against the
    * broadcast codebooks. The HOF fold is rewritten to the codegen'd
    * SqDist kernel by [[graft.plans.RewriteSqDist]]. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, subspaces: Int, subDim: Int): DataFrame =
    subspaceVecs(emb, idCol, vecCol, subspaces, subDim)
      .join(broadcast(codebooks), Seq("m"))
      .select(col("id"), col("m"), col("cid"),
        expr("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)")
          .as("d2"))
      .groupBy("id", "m").agg(min(struct(col("d2"), col("cid"))).as("mm"))
      .select(col("id"), col("m"), col("mm.cid").as("code"))

  /** IVF-PQ top-k search; output contract identical to the other ANN
    * queries: (query_id, rank, neighbor_id, sim), sim = exact cosine
    * rounded to 4dp, ranked (sim desc, neighbor_id asc). */
  def ivfpqTopK(queries: DataFrame, corpus: DataFrame,
      k: Int, centroidStride: Long = 50, nprobe: Int = 4,
      subspaces: Int = 4, subDim: Int = 16, ksub: Int = 4, iters: Int = 1,
      rerank: Int = 20, trainBuckets: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // ── coarse IVF cells (same deterministic recipe as sim_ivf_topk) ──
    val cnorm = Similarity.normalized(corpus, idCol, vecCol)
    val cent = cnorm.filter(col("id") % centroidStride === 0)
      .select(col("id").as("cent_id"), col("nv").as("cv"))
    val q = Similarity.normalized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("nv").as("qv"))
    val wA = Window.partitionBy("id").orderBy(col("cd").desc, col("cent_id").asc)
    val assigned = cnorm.crossJoin(broadcast(cent))
      .select(col("id"), col("cent_id"),
        round(Similarity.dotFast(col("nv"), col("cv")), 4).as("cd"))
      .withColumn("r", row_number().over(wA)).filter(col("r") === 1)
      .select("id", "cent_id")
    val wQ = Window.partitionBy("query_id").orderBy(col("cd").desc, col("cent_id").asc)
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("cent_id"),
        round(Similarity.dotFast(col("qv"), col("cv")), 4).as("cd"))
      .withColumn("r", row_number().over(wQ)).filter(col("r") <= nprobe)
      .select("query_id", "cent_id")
    // ── product quantizer: train, encode, query distance table ──
    val books = trainCodebooks(corpus, idCol, vecCol, subspaces, subDim,
      ksub, iters, trainBuckets).localCheckpoint()
    val codes = encode(corpus, idCol, vecCol, books, subspaces, subDim)
    val dt = subspaceVecs(queries, idCol, vecCol, subspaces, subDim)
      .join(broadcast(books), Seq("m"))
      .select(col("id").as("query_id"), col("m"), col("cid").as("code"),
        expr("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)")
          .as("dt"))
    // ── asymmetric-distance scan over probed cells ──
    val cand = probes.join(assigned, Seq("cent_id"))
      .select(col("query_id"), col("id").as("neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val adist = cand
      .join(codes.withColumnRenamed("id", "neighbor_id"), Seq("neighbor_id"))
      .join(broadcast(dt), Seq("query_id", "m", "code"))
      .groupBy("query_id", "neighbor_id").agg(sum("dt").as("adist"))
    val wS = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = adist.withColumn("r", row_number().over(wS))
      .filter(col("r") <= rerank).select("query_id", "neighbor_id")
    // ── exact rerank on real vectors ──
    val wR = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    shortlist
      .join(q, Seq("query_id"))
      .join(cnorm.select(col("id").as("neighbor_id"), col("nv").as("nv2")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.dotFast(col("qv"), col("nv2")), 4).as("sim"))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
