package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity

/** Similarity-search coverage over `embeddings` (LLM-data-pipeline
  * extension): exact brute-force cosine top-k, threshold near-dup join,
  * and the LSH-bucketed approximate path (rows-only check — bucket
  * membership is engine-deterministic but the oracle SQL for 16 md5
  * hyperplanes is impractical; recall is asserted in SimilaritySpec).
  */
object SimQ extends QueryPack {

  /** Exact ANN baseline: top-5 cosine neighbors for every 25th vector.
    * Similarities rounded to 4dp before ranking; ties break on neighbor
    * id → fully deterministic across engines. */
  /** Register the shared normalized-corpus cache for this (session, dir):
    * CacheManager then substitutes it into every sim query's corpus-side
    * `normalized` subtree, so the normalize pass runs once per session
    * instead of once per query. */
  private def emb(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    Similarity.cacheNormalizedCorpus(e, d)
    e
  }

  /** The normalized-corpus cache build as its own timed bench row: every
    * sim_* member then measures against a warm corpus. */
  override def warms: Seq[Q] = Seq(
    Q("sim_corpus_build",
      (s, d) => Similarity.cacheNormalizedCorpus(Tables.embeddings(s, d), d),
      None))

  private def simTopk(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.bruteForceTopK(
        e.filter(col("vec_id") % 25 === 0), e, k = 5)
      .orderBy("query_id", "rank")
  }

  private[queries] val simTopkSql =
    """WITH v AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings),
       q AS (SELECT vec_id AS qid, nv AS qv FROM v WHERE vec_id % 25 = 0),
       pairs AS (
         SELECT qid AS query_id, vec_id AS neighbor_id,
                round(list_dot_product(qv, nv), 4) AS sim
         FROM q JOIN v ON vec_id != qid)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM pairs) t
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Embedding-cosine near-dup pairs at θ=0.4 (the corpus max is ~0.51, so
    * this exercises the threshold join against a sparse result). */
  private def simNearDup(spark: SparkSession, d: String): DataFrame =
    Similarity.allPairsAboveThreshold(emb(spark, d), 0.4, cacheKey = Some(d))
      .orderBy("id_a", "id_b")

  private val simNearDupSql =
    """WITH v AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings)
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_dot_product(a.nv, b.nv), 4) AS sim
       FROM v a JOIN v b ON a.vec_id < b.vec_id
       WHERE round(list_dot_product(a.nv, b.nv), 4) >= 0.4
       ORDER BY id_a, id_b"""

  /** BANDED near-dup pairs at θ=0.4 — the registered 100 TB path for the
    * threshold join (VERDICT r12 #3): candidates come from the capped,
    * corpus-size-derived LSH banding ([[graft.sim.Similarity
    * .lshCandidateSims]] — expected candidates ≈ bands·n·occupancy,
    * LINEAR in n) instead of [[Similarity.allPairsAboveThreshold]]'s
    * exact n²/2 flops; surviving pairs are exact-cosine reranked,
    * thresholded, and canonicalized to (id_a < id_b). `sim_near_dup`
    * stays registered as the exactness-contract anchor; what this path
    * trades away is MEASURED, not asserted, by `sim_recall_banded_nd`.
    * Deterministic end-to-end → full generated DuckDB oracle
    * ([[AnnSql]]). */
  private def simNearDupBanded(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.lshCandidateSims(e, e, Similarity.annParamsFor(e, d))
      .filter(col("sim") >= 0.4)
      .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
        greatest(col("query_id"), col("neighbor_id")).as("id_b"),
        col("sim"))
      .distinct()
      .orderBy("id_a", "id_b")
  }

  private val simNearDupBandedSql =
    s"""WITH ${AnnSql.simsCtes("TRUE")}
       SELECT DISTINCT least(query_id, neighbor_id) AS id_a,
              greatest(query_id, neighbor_id) AS id_b, sim
       FROM sims WHERE sim >= 0.4
       ORDER BY id_a, id_b"""

  /** Pair recall of the banded near-dup path against the exact all-pairs
    * contract (`sim_near_dup`), one summary row: exact pairs, banded
    * pairs, their intersection, and integer-bp recall — the
    * `sim_recall_lsh` discipline applied to the threshold join, so the
    * banded path's promotion to 100 TB default is graded, not claimed.
    * (Runs the exact side too, so it prices as an exact row — the
    * harness's recall rows always pay for their own ground truth.) */
  private def simRecallBandedNd(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val exact = Similarity.allPairsAboveThreshold(e, 0.4, cacheKey = Some(d))
      .select("id_a", "id_b")
    val banded = Similarity
      .lshCandidateSims(e, e, Similarity.annParamsFor(e, d))
      .filter(col("sim") >= 0.4)
      .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
        greatest(col("query_id"), col("neighbor_id")).as("id_b"))
      .distinct()
    val hit = exact.join(banded, Seq("id_a", "id_b"), "left_semi")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(banded.agg(count(lit(1)).as("n_banded")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_exact"), col("n_banded"), col("n_hit"),
        expr("CASE WHEN n_exact = 0 THEN 10000 " +
          "ELSE (n_hit * 10000) div n_exact END").as("recall_bp"))
  }

  private val simRecallBandedNdSql =
    s"""WITH ${AnnSql.simsCtes("TRUE")},
       banded AS (SELECT DISTINCT least(query_id, neighbor_id) AS id_a,
                         greatest(query_id, neighbor_id) AS id_b
                  FROM sims WHERE sim >= 0.4),
       exact AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                 FROM v a JOIN v b ON a.vec_id < b.vec_id
                 WHERE round(list_dot_product(a.nv, b.nv), 4) >= 0.4),
       h AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
             FROM exact e JOIN banded b USING (id_a, id_b))
       SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_exact,
              CAST((SELECT COUNT(*) FROM banded) AS BIGINT) AS n_banded,
              h.n_hit,
              CAST(CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN 10000
                   ELSE (h.n_hit * 10000) // (SELECT COUNT(*) FROM exact)
                   END AS BIGINT) AS recall_bp
       FROM h"""

  /** LSH-bucketed approximate top-k (scale path: candidates from
    * capped, corpus-size-derived band collisions only —
    * [[graft.sim.AnnParams]]). The pipeline is deterministic end-to-end
    * (md5 hyperplanes, rounded rerank sims, id tie-breaks), so the
    * oracle SQL is GENERATED with the same ±1 plane constants and the
    * same COUNT(*)-derived band-bits ladder embedded — DuckDB
    * reproduces signatures, buckets, caps, candidates, and rerank
    * exactly ([[AnnSql]]). */
  private def simLshTopk(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.lshTopK(
        e.filter(col("vec_id") % 25 === 0), e, k = 5,
        params = Similarity.annParamsFor(e, d))
      .orderBy("query_id", "rank")
  }

  private[queries] val simLshSql: String =
    AnnSql.topKSql("vec_id % 25 = 0", k = 5)

  /** WIDE-layout LSH top-k — the >2 M-vector rung (VERDICT r12 #6):
    * [[graft.sim.AnnParams.forCountWide]] splits the 4 bands across TWO
    * 30-bit-slot BIGINT signature words, so the r ladder's ceiling is
    * 30 and expected bucket occupancy stays at target out to
    * ~6.9 · 10¹⁰ vectors, where the single-word layout's 15-bit clamp
    * saturates at ~2.1 M. Registered with the generated two-word oracle
    * ([[AnnSql.topKSqlWide]]) so the wide algebra's PARITY is proven at
    * every SF the driver checks, not just argued from the ladder math
    * (occupancy boundedness itself is spec-asserted in
    * ExtensionsSpec). */
  private def simLshTopkWide(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.lshTopK(
        e.filter(col("vec_id") % 25 === 0), e, k = 5,
        params = graft.sim.AnnParams.forCountWide(
          graft.sim.AnnParams.corpusCount(e, Some(d))))
      .orderBy("query_id", "rank")
  }

  private val simLshWideSql: String =
    AnnSql.topKSqlWide("vec_id % 25 = 0", k = 5)

  /** IVF ANN top-k (the second scale path beside LSH): deterministic
    * centroid codebook (vec_id % 50), nearest-cell assignment, nprobe=4
    * probed cells, exact rerank on candidates. Fully deterministic →
    * full DuckDB oracle reproducing cells, probes, and rerank. */
  private def simIvfTopk(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.ivfTopK(
        e.filter(col("vec_id") % 25 === 0), e, k = 5,
        centroidStride = 50, nprobe = 4)
      .orderBy("query_id", "rank")
  }

  /** IVF oracle parameterized by nprobe — the recall harness
    * (`sim_recall_ivf`, PrepQ) replays it at nprobe ∈ {1, 4}. */
  private[queries] def simIvfSqlAt(nprobe: Int): String =
    s"""WITH v AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings),
       cent AS (SELECT vec_id AS cent_id, nv AS cv FROM v WHERE vec_id % 50 = 0),
       assigned AS (SELECT id, cent_id FROM (
         SELECT v.vec_id AS id, cent_id,
                ROW_NUMBER() OVER (PARTITION BY v.vec_id
                  ORDER BY round(list_dot_product(v.nv, cv), 4) DESC, cent_id) AS r
         FROM v CROSS JOIN cent) t WHERE r = 1),
       q AS (SELECT vec_id AS query_id, nv AS qv FROM v WHERE vec_id % 25 = 0),
       probes AS (SELECT query_id, cent_id FROM (
         SELECT query_id, cent_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY round(list_dot_product(qv, cv), 4) DESC, cent_id) AS r
         FROM q CROSS JOIN cent) t WHERE r <= $nprobe),
       cand AS (SELECT query_id, id AS neighbor_id
                FROM probes JOIN assigned USING (cent_id)
                WHERE id != query_id),
       sims AS (SELECT query_id, neighbor_id,
                       round(list_dot_product(qv, v.nv), 4) AS sim
                FROM cand
                JOIN q USING (query_id)
                JOIN v ON v.vec_id = neighbor_id)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM sims) t
       WHERE rank <= 5 ORDER BY query_id, rank"""

  private val simIvfSql = simIvfSqlAt(4)

  /** Same semantics as sim_topk through the custom TopKAggregator
    * (map-side partial top-k, no window shuffle) — same oracle. */
  private def simTopkAgg(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.bruteForceTopKAgg(
        e.filter(col("vec_id") % 25 === 0), e, k = 5)
      .orderBy("query_id", "rank")
  }

  /** Trained-codebook k-means fit: deterministic fixed-point Lloyd
    * ([[graft.sim.KMeans]] — integer distances, floor-division centroid
    * means), TRAINED on the deterministic md5 1-in-2 sample (the 100 TB
    * seam: codebooks train on a sample, assignment covers the corpus),
    * seeded from the sample's 4 lowest ids, one Lloyd round, then the
    * full-corpus nearest-centroid assignment. The oracle re-runs the
    * identical integer algorithm INCLUDING the sample, so this is a
    * FULL value check on a sampled-training clustering. */
  private def simKmeans(spark: SparkSession, d: String): DataFrame =
    graft.sim.KMeans.fit(Tables.embeddings(spark, d), "vec_id", "embedding",
        k = 4, iters = 1, trainBuckets = 2)
      .select(col("id").as("vec_id"), col("cid").as("cluster"), col("d2"))
      .orderBy("vec_id")

  /** The md5 1-in-2 training-sample predicate, DuckDB form — the exact
    * twin of [[graft.sim.KMeans.trainFilter]](2). */
  private val sampleWhere =
    "CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0"

  private val simKmeansSql =
    s"""WITH v AS (SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
       sv AS (SELECT * FROM v WHERE $sampleWhere),
       c0 AS (SELECT id AS cid, v AS c
              FROM (SELECT * FROM sv ORDER BY id LIMIT 4)),
       d0 AS (SELECT sv.id, c0.cid,
                CAST(list_sum(list_transform(range(1, 65),
                  i -> (sv.v[i] - c0.c[i]) * (sv.v[i] - c0.c[i]))) AS BIGINT) AS d2
              FROM sv CROSS JOIN c0),
       a0 AS (SELECT id, cid FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                          ORDER BY d2, cid) AS rn FROM d0) WHERE rn = 1),
       e0 AS (SELECT a0.cid, u.dim, u.comp
              FROM a0 JOIN sv USING (id),
                   UNNEST(list_transform(sv.v,
                     (x, i) -> {'dim': i, 'comp': x})) AS r(u)),
       c1 AS (SELECT cid,
                array_agg((s + n * 2000000) // n - 2000000 ORDER BY dim) AS c
              FROM (SELECT cid, dim, SUM(comp) AS s, COUNT(*) AS n
                    FROM e0 GROUP BY 1, 2) GROUP BY 1),
       d1 AS (SELECT v.id, c1.cid,
                CAST(list_sum(list_transform(range(1, 65),
                  i -> (v.v[i] - c1.c[i]) * (v.v[i] - c1.c[i]))) AS BIGINT) AS d2
              FROM v CROSS JOIN c1)
       SELECT id AS vec_id, cid AS cluster, d2 FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                   ORDER BY d2, cid) AS rn FROM d1) WHERE rn = 1
       ORDER BY vec_id"""

  /** IVF search over the TRAINED codebook: [[graft.sim.KMeans]] trains 4
    * centroids (one Lloyd round, exact fixed-point arithmetic), which
    * are rescaled to doubles, L2-normalized, and plugged into the same
    * probe/rerank plan as `sim_ivf_topk` — the production composition
    * (train once, search many). The oracle replays the full chain:
    * integer k-means, centroid rescale, cosine probes, rerank. */
  /** Codebook size derived from the corpus (the `semanticCellCount`
    * discipline): k = max(4, ⌈n/1024⌉), so expected cell occupancy
    * stays ≈ 1024 and the nprobe/k probed fraction SHRINKS as the
    * corpus grows — a pinned k = 4 meant nprobe = 2 probed HALF the
    * corpus at every scale (measured 14.2 s / 4.4× the oracle at sf1;
    * rerank was |corpus|/2 pairs). Floor 4 keeps the sf0.01 gate's
    * behavior byte-identical to the pre-derivation rows. */
  private def ivftK(n: Long): Int = math.max(4L, (n + 1023) / 1024).toInt

  private def simIvfTrained(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val kk = ivftK(graft.sim.AnnParams.corpusCount(e, Some(d)))
    val cent = graft.sim.KMeans.train(e, "vec_id", "embedding", k = kk,
        iters = 1, trainBuckets = 2)
      .select(col("cid").as("cent_id"),
        Similarity.l2NormalizeCol(expr("transform(c, x -> x / 1048576.0D)"))
          .as("cv"))
    Similarity.ivfTopKWithCentroids(
        e.filter(col("vec_id") % 25 === 0), e, cent, k = 5, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  private val simIvfTrainedSql =
    s"""WITH kv AS (SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
       skv AS (SELECT * FROM kv WHERE $sampleWhere),
       kpk AS (SELECT GREATEST(4, (COUNT(*) + 1023) // 1024) AS kk
               FROM embeddings),
       c0k AS (SELECT id AS cid, v AS c FROM (
                SELECT *, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM skv)
               WHERE rn <= (SELECT kk FROM kpk)),
       d0k AS (SELECT skv.id, c0k.cid,
                CAST(list_sum(list_transform(range(1, 65),
                  i -> (skv.v[i] - c0k.c[i]) * (skv.v[i] - c0k.c[i]))) AS BIGINT) AS d2
              FROM skv CROSS JOIN c0k),
       a0k AS (SELECT id, cid FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                          ORDER BY d2, cid) AS rn FROM d0k) WHERE rn = 1),
       e0k AS (SELECT a0k.cid, u.dim, u.comp
              FROM a0k JOIN skv USING (id),
                   UNNEST(list_transform(skv.v,
                     (x, i) -> {'dim': i, 'comp': x})) AS r(u)),
       c1k AS (SELECT cid,
                array_agg((s + n * 2000000) // n - 2000000 ORDER BY dim) AS c
              FROM (SELECT cid, dim, SUM(comp) AS s, COUNT(*) AS n
                    FROM e0k GROUP BY 1, 2) GROUP BY 1),
       centv AS (SELECT cid AS cent_id,
                   list_transform(c, x -> CAST(x AS DOUBLE) / 1048576.0) AS c0
                 FROM c1k),
       cent AS (SELECT cent_id,
                  list_transform(c0,
                    x -> x / sqrt(list_dot_product(c0, c0))) AS cv
                FROM centv),
       v AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings),
       assigned AS (SELECT id, cent_id FROM (
         SELECT v.vec_id AS id, cent_id,
                ROW_NUMBER() OVER (PARTITION BY v.vec_id
                  ORDER BY round(list_dot_product(v.nv, cv), 4) DESC, cent_id) AS r
         FROM v CROSS JOIN cent) t WHERE r = 1),
       q AS (SELECT vec_id AS query_id, nv AS qv FROM v WHERE vec_id % 25 = 0),
       probes AS (SELECT query_id, cent_id FROM (
         SELECT query_id, cent_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY round(list_dot_product(qv, cv), 4) DESC, cent_id) AS r
         FROM q CROSS JOIN cent) t WHERE r <= 2),
       cand AS (SELECT query_id, id AS neighbor_id
                FROM probes JOIN assigned USING (cent_id)
                WHERE id != query_id),
       sims AS (SELECT query_id, neighbor_id,
                       round(list_dot_product(qv, v.nv), 4) AS sim
                FROM cand
                JOIN q USING (query_id)
                JOIN v ON v.vec_id = neighbor_id)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM sims) t
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Int8 symmetric embedding quantization — the 100 TB storage-path op
    * (4 bytes/dim float → 1 byte/dim + one scale per vector). Per-vector
    * scale = max|x|; q_i = floor(x_i · 127 / scale), all in doubles with
    * the identical expression order on the oracle side so every quantized
    * cell hash-matches. Output is posexploded to (vec_id, dim, q) scalar
    * rows (arrays don't hash portably in the driver compare). Zero
    * vectors quantize to 0 on both sides. Pure scan-fused projection +
    * generate — no shuffle at any scale; ExtensionsSpec bounds the
    * reconstruction error at one quantization step. */
  private def simQuant(spark: SparkSession, d: String): DataFrame = {
    val embD = transform(col("embedding"), x => x.cast("double"))
    val q = transform(embD, x =>
      when(col("maxabs") === 0.0, lit(0))
        .otherwise(floor(x * lit(127.0) / col("maxabs")).cast("int")))
    Tables.embeddings(spark, d)
      .withColumn("maxabs", array_max(transform(embD, x => abs(x))))
      .select(col("vec_id"), col("maxabs"), posexplode(q).as(Seq("dim", "q")))
      .orderBy("vec_id", "dim")
  }

  private val simQuantSql =
    """WITH e AS (
         SELECT vec_id,
                list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                  AS maxabs,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         FROM embeddings)
       SELECT vec_id, maxabs, CAST(r.u.dim AS INTEGER) AS dim, r.u.q AS q
       FROM e, UNNEST(list_transform(emb, (x, i) ->
         {'dim': i - 1,
          'q': CASE WHEN maxabs = 0 THEN 0
                    ELSE CAST(FLOOR(x * CAST(127 AS DOUBLE) / maxabs) AS INTEGER)
               END})) AS r(u)
       ORDER BY vec_id, dim"""

  /** IVF-PQ search: coarse stride cells + per-subvector k-means
    * codebooks (4 subspaces × 16 dims, ksub=4, one exact integer Lloyd
    * round), asymmetric-distance scan of the probed cells, exact rerank
    * of the top 20. Deterministic end-to-end, so the oracle REPLAYS the
    * whole chain — sub-codebook training, codes, ADC sums, rerank. */
  private def simIvfPq(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    graft.sim.PQ.ivfpqTopK(
        e.filter(col("vec_id") % 25 === 0), e, k = 5,
        centroidStride = 50, nprobe = 4,
        subspaces = 4, subDim = 16, ksub = 4, iters = 1, rerank = 20,
        trainBuckets = 2)
      .orderBy("query_id", "rank")
  }

  /** Generated oracle: one `sim_kmeans`-style training block per
    * subspace (slice bounds substituted), then codes / distance table /
    * ADC / rerank as plain SQL. Parameterized by nprobe for the
    * `sim_recall_ivfpq` harness (PrepQ). */
  private[queries] def simIvfPqSqlAt(nprobe: Int): String = {
    val M = 4; val L = 16; val ksub = 4
    def kv(m: Int) =
      s"""kv$m AS (SELECT vec_id AS id,
             list_transform(embedding[${m * L + 1}:${(m + 1) * L}],
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings)"""
    def train(m: Int) =
      s"""skv$m AS (SELECT * FROM kv$m WHERE $sampleWhere),
       c0_$m AS (SELECT id AS cid, v AS c
                 FROM (SELECT * FROM skv$m ORDER BY id LIMIT $ksub)),
       d0_$m AS (SELECT skv$m.id, c0_$m.cid,
                CAST(list_sum(list_transform(range(1, ${L + 1}),
                  i -> (skv$m.v[i] - c0_$m.c[i]) * (skv$m.v[i] - c0_$m.c[i]))) AS BIGINT) AS d2
              FROM skv$m CROSS JOIN c0_$m),
       a0_$m AS (SELECT id, cid FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                          ORDER BY d2, cid) AS rn FROM d0_$m) WHERE rn = 1),
       e0_$m AS (SELECT a0_$m.cid, u.dim, u.comp
              FROM a0_$m JOIN skv$m USING (id),
                   UNNEST(list_transform(skv$m.v,
                     (x, i) -> {'dim': i, 'comp': x})) AS r(u)),
       c1_$m AS (SELECT cid,
                array_agg((s + n * 2000000) // n - 2000000 ORDER BY dim) AS c
              FROM (SELECT cid, dim, SUM(comp) AS s, COUNT(*) AS n
                    FROM e0_$m GROUP BY 1, 2) GROUP BY 1)"""
    val kvs = (0 until M).map(kv).mkString(",\n       ")
    val trains = (0 until M).map(train).mkString(",\n       ")
    val booksUnion = (0 until M)
      .map(m => s"SELECT $m AS m, cid, c FROM c1_$m").mkString(" UNION ALL ")
    val subsUnion = (0 until M)
      .map(m => s"SELECT id, $m AS m, v FROM kv$m").mkString(" UNION ALL ")
    s"""WITH $kvs,
       $trains,
       books AS ($booksUnion),
       subs AS ($subsUnion),
       cd AS (SELECT s.id, b.m, b.cid,
                CAST(list_sum(list_transform(range(1, ${L + 1}),
                  i -> (s.v[i] - b.c[i]) * (s.v[i] - b.c[i]))) AS BIGINT) AS d2
              FROM subs s JOIN books b USING (m)),
       codes AS (SELECT id, m, cid AS code FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id, m
                          ORDER BY d2, cid) AS rn FROM cd) WHERE rn = 1),
       qd AS (SELECT s.id AS query_id, b.m, b.cid AS code,
                CAST(list_sum(list_transform(range(1, ${L + 1}),
                  i -> (s.v[i] - b.c[i]) * (s.v[i] - b.c[i]))) AS BIGINT) AS dt
              FROM subs s JOIN books b USING (m) WHERE s.id % 25 = 0),
       v AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings),
       cent AS (SELECT vec_id AS cent_id, nv AS cv FROM v WHERE vec_id % 50 = 0),
       assigned AS (SELECT id, cent_id FROM (
         SELECT v.vec_id AS id, cent_id,
                ROW_NUMBER() OVER (PARTITION BY v.vec_id
                  ORDER BY round(list_dot_product(v.nv, cv), 4) DESC, cent_id) AS r
         FROM v CROSS JOIN cent) t WHERE r = 1),
       q AS (SELECT vec_id AS query_id, nv AS qv FROM v WHERE vec_id % 25 = 0),
       probes AS (SELECT query_id, cent_id FROM (
         SELECT query_id, cent_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY round(list_dot_product(qv, cv), 4) DESC, cent_id) AS r
         FROM q CROSS JOIN cent) t WHERE r <= $nprobe),
       cand AS (SELECT query_id, id AS neighbor_id
                FROM probes JOIN assigned USING (cent_id)
                WHERE id != query_id),
       adist AS (SELECT c.query_id, c.neighbor_id, SUM(qd.dt) AS adist
                 FROM cand c
                 JOIN codes ON codes.id = c.neighbor_id
                 JOIN qd ON qd.query_id = c.query_id
                        AND qd.m = codes.m AND qd.code = codes.code
                 GROUP BY 1, 2),
       short AS (SELECT query_id, neighbor_id FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY adist, neighbor_id) AS rn FROM adist)
                WHERE rn <= 20),
       sims AS (SELECT query_id, neighbor_id,
                       round(list_dot_product(qv, v.nv), 4) AS sim
                FROM short
                JOIN q USING (query_id)
                JOIN v ON v.vec_id = neighbor_id)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM sims) t
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  private val simIvfPqSql: String = simIvfPqSqlAt(4)

  /** SemDeDup-style semantic dedup: k-means cells bound candidate pairs,
    * within-cell cosine ≥ 0.4 edges, connected components, min-id
    * survivor per group. k is NOT pinned — the query exercises the
    * [[graft.dedup.Dedup.semanticCellCount]] scaling default
    * (⌈n/1024⌉ cells, min 2) and the oracle computes the identical k
    * from COUNT(*), so the same SQL stays exact at every scale factor.
    * Training reads the md5 1-in-2 sample. Deterministic end-to-end
    * (fixed-point training, 4dp cosine), so the oracle replays the
    * k-rule, sample, training, cells, edges, the transitive closure,
    * and survivor flags. Registered here (not DedupQ) to share the
    * normalized-corpus cache. */
  private def dSemantic(spark: SparkSession, d: String): DataFrame =
    graft.dedup.Dedup.semanticDedup(emb(spark, d), iters = 1,
        tau = 0.4, trainBuckets = 2)
      .orderBy("vec_id")

  private val dSemanticSql =
    s"""WITH RECURSIVE
       kv AS (SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
       kp AS (SELECT GREATEST(2, CAST(CEIL(COUNT(*) / 1024.0) AS BIGINT)) AS kk
              FROM embeddings),
       skv AS (SELECT * FROM kv WHERE $sampleWhere),
       c0 AS (SELECT id AS cid, v AS c
              FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY id) AS rn FROM skv)
              WHERE rn <= (SELECT kk FROM kp)),
       d0 AS (SELECT skv.id, c0.cid,
                CAST(list_sum(list_transform(range(1, 65),
                  i -> (skv.v[i] - c0.c[i]) * (skv.v[i] - c0.c[i]))) AS BIGINT) AS d2
              FROM skv CROSS JOIN c0),
       a0 AS (SELECT id, cid FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                          ORDER BY d2, cid) AS rn FROM d0) WHERE rn = 1),
       e0 AS (SELECT a0.cid, u.dim, u.comp
              FROM a0 JOIN skv USING (id),
                   UNNEST(list_transform(skv.v,
                     (x, i) -> {'dim': i, 'comp': x})) AS r(u)),
       c1 AS (SELECT cid,
                array_agg((s + n * 2000000) // n - 2000000 ORDER BY dim) AS c
              FROM (SELECT cid, dim, SUM(comp) AS s, COUNT(*) AS n
                    FROM e0 GROUP BY 1, 2) GROUP BY 1),
       d1 AS (SELECT kv.id, c1.cid,
                CAST(list_sum(list_transform(range(1, 65),
                  i -> (kv.v[i] - c1.c[i]) * (kv.v[i] - c1.c[i]))) AS BIGINT) AS d2
              FROM kv CROSS JOIN c1),
       a1 AS (SELECT id, cid FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                          ORDER BY d2, cid) AS rn FROM d1) WHERE rn = 1),
       nrm AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings),
       cells AS (SELECT a1.id, a1.cid, nrm.nv
                 FROM a1 JOIN nrm ON nrm.vec_id = a1.id),
       pairs AS (SELECT a.id AS id_a, b.id AS id_b
                 FROM cells a JOIN cells b
                   ON a.cid = b.cid AND a.id < b.id
                 WHERE round(list_dot_product(a.nv, b.nv), 4) >= 0.4),
       edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                 UNION ALL
                 SELECT id_b, id_a FROM pairs),
       reach AS (SELECT u, v FROM edges
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       groups AS (SELECT u AS vec_id, LEAST(u, MIN(v)) AS group_id
                  FROM reach GROUP BY u)
       SELECT e.vec_id,
              COALESCE(g.group_id, e.vec_id) AS group_id,
              CAST(COALESCE(g.group_id, e.vec_id) = e.vec_id AS INTEGER) AS keep
       FROM embeddings e LEFT JOIN groups g USING (vec_id)
       ORDER BY e.vec_id"""

  /** Chunk→document embedding mean pooling — the standard step between
    * chunk-level and document-level embedding pipelines (retrieval
    * indexes, SemDeDup prefilters): every 4 consecutive vec_ids pool
    * into one document vector. Pooling runs in the engine's exact
    * fixed-point domain (floor(x·2²⁰) bigints — the `sim_kmeans`
    * recipe): integer sums are order-independent, so the pooled values
    * are bit-reproducible on any engine/partitioning, and the final
    * (sum / 2²⁰) / n division is one fixed IEEE expression both engines
    * evaluate identically. The per-dim sums go through the
    * [[graft.plans.VecSum]] aggregator — whole arrays in map-side
    * partial aggregation, one row per document through the shuffle.
    * Output posexploded to (doc_id, dim, pooled) scalar rows. */
  private def ePool(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d)
      .select(expr("vec_id div 4").as("doc_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))")
          .as("v"))
      .groupBy("doc_id")
      .agg(graft.plans.VecSum.sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("doc_id"),
        posexplode(expr("transform(s, x -> (CAST(x AS DOUBLE) / 1048576.0) / n)"))
          .as(Seq("dim", "pooled")))
      .orderBy("doc_id", "dim")

  private val ePoolSql =
    """WITH sv AS (SELECT vec_id // 4 AS doc_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
       e AS (SELECT doc_id, u.dim, u.q
             FROM sv, UNNEST(list_transform(v,
               (x, i) -> {'dim': i - 1, 'q': x})) AS r(u)),
       agg AS (SELECT doc_id, dim, SUM(q) AS sq, COUNT(*) AS n
               FROM e GROUP BY 1, 2)
       SELECT doc_id, CAST(dim AS INTEGER) AS dim,
              (CAST(sq AS DOUBLE) / 1048576.0) / n AS pooled
       FROM agg ORDER BY doc_id, dim"""

  override def queries: Seq[Q] = Seq(
    Q("e_pool", ePool, Some(ePoolSql)),
    Q("d_semantic", dSemantic, Some(dSemanticSql)),
    Q("sim_ivfpq", simIvfPq, Some(simIvfPqSql)),
    Q("sim_quant", simQuant, Some(simQuantSql)),
    Q("sim_topk", simTopk, Some(simTopkSql)),
    Q("sim_ivft", simIvfTrained, Some(simIvfTrainedSql)),
    Q("sim_topk_agg", simTopkAgg, Some(simTopkSql)),
    Q("sim_near_dup", simNearDup, Some(simNearDupSql)),
    Q("sim_near_dup_banded", simNearDupBanded, Some(simNearDupBandedSql)),
    Q("sim_recall_banded_nd", simRecallBandedNd, Some(simRecallBandedNdSql)),
    Q("sim_lsh_topk", simLshTopk, Some(simLshSql)),
    Q("sim_lsh_topk_wide", simLshTopkWide, Some(simLshWideSql)),
    Q("sim_ivf_topk", simIvfTopk, Some(simIvfSql)),
    Q("sim_kmeans", simKmeans, Some(simKmeansSql)))
}
