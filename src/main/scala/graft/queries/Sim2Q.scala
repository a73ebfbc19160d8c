package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity

/** Round-9 graph-ANN pack: greedy beam search over a symmetric kNN
  * graph ([[graft.sim.Similarity.graphBeamTopK]] — the NSW idea) and
  * its measured recall dial. Completes the ANN index family: brute
  * force (exact baseline), LSH buckets, IVF cells, IVF-PQ compressed,
  * SQ8 quantized, and now graph descent — the one whose QUERY cost is
  * O(rounds·beam·degree) independent of corpus partitioning.
  *
  * Everything is deterministic (md5 hyperplanes, 4dp-rounded sims, id
  * tie-breaks, min-id entry point), so the DuckDB oracle replays the
  * graph build AND every search round exactly — `AS MATERIALIZED` pins
  * the reused chain prefixes to one evaluation (the BPE-unroll
  * discipline).
  */
object Sim2Q extends QueryPack {

  private val GraphK = 8
  private val Beam = 16
  private val K = 5
  private val Rounds = 3
  /** Corpus-derived multi-start count (the [[graft.sim.AnnParams]]
    * discipline applied to the NSW entry points): the symmetric kNN
    * graph's component count grows with the corpus, so a PINNED
    * entry-point count starves recall at scale — measured r3 recall@5
    * fell 84% (500 vectors) → 47% (2 000) → 1.3% (20 000) with
    * entries = 16 pinned; deriving entries ≈ n/125 (clamped [16, 256])
    * keeps one start per expected ~125-vector neighborhood. Both gate
    * scales derive 16 (hashes unchanged); sf1 derives 160. The oracle
    * embeds the same integer formula over COUNT(*). */
  private def entriesFor(n: Long): Int =
    math.max(16L, math.min(256L, (n + 124) / 125)).toInt

  private def emb(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    Similarity.cacheNormalizedCorpus(e, d)
    e
  }

  override def warms: Seq[Q] = Seq(
    Q("sim2_corpus_build",
      (s, d) => Similarity.cacheNormalizedCorpus(Tables.embeddings(s, d), d),
      None))

  /** Graph-descent top-5 for the %25 query slice: 3 beam rounds over
    * the symmetric LSH-kNN graph (degree ≤ 8), beam 16, starting from
    * the corpus-derived id-stride entry points ([[entriesFor]] — the
    * kNN graph is disconnected across the planted clusters, so
    * multi-start is what makes it navigable). */
  private def simNswTopk(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.graphBeamTopK(
        e.filter(col("vec_id") % 25 === 0), e, k = K,
        rounds = Rounds, beam = Beam, graphK = GraphK,
        params = Similarity.annParamsFor(e, d),
        entries = entriesFor(graft.sim.AnnParams.corpusCount(e, Some(d))))
      .orderBy("query_id", "rank")
  }

  /** The shared oracle prefix: the [[AnnSql]] candidate chain with
    * corpus-vs-corpus sides (normalized vectors, derived-band
    * signatures, capped buckets, rerank sims as (src, dst, sim)), then
    * the graphK-NN edge list and its symmetric closure — exactly
    * [[Similarity.lshTopK]]'s algebra. */
  private def graphCtes: String = {
    s"""${AnnSql.simsCtes("TRUE", qCol = "src", nCol = "dst")},
       knn AS (SELECT src, dst FROM (
                 SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                        ORDER BY sim DESC, dst) AS rk FROM sims)
               WHERE rk <= $GraphK),
       sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
                 SELECT src, dst FROM knn
                 UNION ALL SELECT dst AS src, src AS dst FROM knn)),
       q AS MATERIALIZED (SELECT vec_id AS query_id, nv AS qv FROM v
                          WHERE vec_id % 25 = 0),
       epar AS (SELECT GREATEST(16, LEAST(256, (COUNT(*) + 124) // 125))
                  AS e FROM embeddings),
       ent AS (SELECT MIN(vec_id) AS cand_id FROM v
               GROUP BY vec_id % (SELECT e FROM epar))"""
  }

  /** One unrolled search round: expand beam out-edges, union the beam,
    * dedup, re-score, keep the best `Beam` per query. */
  private def roundCtes(i: Int): String = {
    val prev = if (i == 1) "b0" else s"b${i - 1}"
    s"""e$i AS (SELECT query_id, cand_id FROM $prev
              UNION
              SELECT p.query_id, s.dst AS cand_id
              FROM $prev p JOIN sym s ON p.cand_id = s.src),
       s$i AS (SELECT e.query_id, e.cand_id,
                      round(list_dot_product(q.qv, w.nv), 4) AS sim
               FROM e$i e
               JOIN q USING (query_id)
               JOIN v w ON w.vec_id = e.cand_id),
       b$i AS MATERIALIZED (SELECT query_id, cand_id, sim FROM (
                 SELECT query_id, cand_id, sim,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, cand_id) AS rk FROM s$i)
               WHERE rk <= $Beam)"""
  }

  private def nswSqlAt(rounds: Int): String =
    s"""WITH $graphCtes,
       b0 AS (SELECT query_id, cand_id FROM q CROSS JOIN ent),
       ${(1 to rounds).map(roundCtes).mkString(",\n")}
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT query_id, cand_id AS neighbor_id, sim,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, cand_id) AS INT) AS rank
         FROM b$rounds WHERE cand_id != query_id) t
       WHERE rank <= $K ORDER BY query_id, rank"""

  private val simNswSql = nswSqlAt(Rounds)

  /** Recall@5 of graph descent at rounds ∈ {1, 3} against the exact
    * brute-force top-5 — the rounds dial measured, not asserted (the
    * `sim_recall_ivf` nprobe-dial shape): one round explores only the
    * entry point's neighborhood, three rounds let the beam walk to the
    * query's true region. Grading joins are |queries|·k rows. */
  private def simRecallNsw(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val q = e.filter(col("vec_id") % 25 === 0)
    val ex = Similarity.bruteForceTopKAgg(q, e, k = K)
      .select("query_id", "neighbor_id")
    // ONE build + ONE walk: round 1's beam is the prefix of round 3's
    // computation, so both dial settings come from the same chain.
    val at = Similarity.graphBeamTopKAt(q, e, k = K,
      roundsAt = Seq(1, Rounds), beam = Beam, graphK = GraphK,
      params = Similarity.annParamsFor(e, d),
      entries = entriesFor(graft.sim.AnnParams.corpusCount(e, Some(d))))
    def hits(rounds: Int, as: String): DataFrame =
      ex.join(at(rounds).select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as(as))
    ex.select("query_id").distinct()
      .join(hits(1, "hits_r1"), Seq("query_id"), "left")
      .join(hits(Rounds, "hits_r3"), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits_r1"), lit(0L)).as("hits_r1"),
        coalesce(col("hits_r3"), lit(0L)).as("hits_r3"))
      .select(col("query_id"), col("hits_r1"), col("hits_r3"),
        expr(s"(hits_r1 * 10000) div $K").as("recall_bp_r1"),
        expr(s"(hits_r3 * 10000) div $K").as("recall_bp_r3"))
      .orderBy("query_id")
  }

  private val simRecallNswSql =
    s"""WITH exact AS (${SimQ.simTopkSql}),
       a1 AS (${nswSqlAt(1)}),
       a3 AS (${nswSqlAt(Rounds)}),
       h1 AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_r1
              FROM exact e JOIN a1
                ON e.query_id = a1.query_id AND e.neighbor_id = a1.neighbor_id
              GROUP BY e.query_id),
       h3 AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_r3
              FROM exact e JOIN a3
                ON e.query_id = a3.query_id AND e.neighbor_id = a3.neighbor_id
              GROUP BY e.query_id)
       SELECT qq.query_id,
         CAST(COALESCE(h1.hits_r1, 0) AS BIGINT) AS hits_r1,
         CAST(COALESCE(h3.hits_r3, 0) AS BIGINT) AS hits_r3,
         CAST((COALESCE(h1.hits_r1, 0) * 10000) // $K AS BIGINT)
           AS recall_bp_r1,
         CAST((COALESCE(h3.hits_r3, 0) * 10000) // $K AS BIGINT)
           AS recall_bp_r3
       FROM (SELECT DISTINCT query_id FROM exact) qq
       LEFT JOIN h1 ON qq.query_id = h1.query_id
       LEFT JOIN h3 ON qq.query_id = h3.query_id
       ORDER BY qq.query_id"""

  private val LpRounds = 3
  private val KeepEvery = 5

  /** Per-label accuracy of 3-round label propagation over the SAME
    * symmetric kNN graph the beam search walks, seeds on every 5th
    * vector (20% labeled): coverage (how many unlabeled nodes got ANY
    * label) and accuracy vs the generator's planted labels, in exact
    * bp — the sim_knn_purity measured-quality discipline applied to
    * label spreading. What it MEASURES on this corpus: the chance
    * floor. The testdata's label column carries no geometric signal
    * (exact 1-NN label agreement is 10.35% at sf0.1 ≈ the 10-label
    * floor — measured 2026-08-15), so any geometry-based spreader
    * lands at ≈10% overall with majority-vote collapse onto a few
    * dominant labels; detecting exactly that — full coverage, floor
    * accuracy ⇒ don't trust spread labels on THIS embedding space —
    * is the harness's job (the sim_knn_purity honesty discipline). */
  private def simLabelProp(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.labelPropagateKnn(e, rounds = LpRounds, graphK = GraphK,
        keepEvery = KeepEvery, params = Similarity.annParamsFor(e, d))
      .filter(!col("is_seed"))
      .groupBy("true_label")
      .agg(count(lit(1)).cast("long").as("n_unlabeled"),
        count(col("pred")).cast("long").as("n_pred"),
        sum(when(col("pred") === col("true_label"), 1L).otherwise(0L))
          .cast("long").as("n_correct"))
      .select(col("true_label"), col("n_unlabeled"), col("n_pred"),
        col("n_correct"),
        expr("(n_pred * 10000) div n_unlabeled").as("cover_bp"),
        when(col("n_pred") === 0, lit(null))
          .otherwise(expr("(n_correct * 10000) div n_pred")).as("acc_bp"))
      .orderBy("true_label")
  }

  private def lpRoundCtes(i: Int): String =
    s"""vt$i AS (SELECT s.dst AS vec_id, st.cur AS lab,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM sym s JOIN st${i - 1} st ON st.vec_id = s.src
              WHERE st.cur IS NOT NULL GROUP BY 1, 2),
       pd$i AS (SELECT vec_id, lab FROM (
                 SELECT vec_id, lab, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY n DESC, lab) AS rk FROM vt$i)
               WHERE rk = 1),
       st$i AS MATERIALIZED (SELECT n.vec_id,
                COALESCE(n.seed, p.lab) AS cur
              FROM nodes n LEFT JOIN pd$i p ON n.vec_id = p.vec_id)"""

  private val simLabelPropSql =
    s"""WITH $graphCtes,
       nodes AS MATERIALIZED (SELECT vec_id,
                CAST(label AS BIGINT) AS true_label,
                CASE WHEN vec_id % $KeepEvery = 0
                     THEN CAST(label AS BIGINT) END AS seed
              FROM embeddings),
       st0 AS (SELECT vec_id, seed AS cur FROM nodes),
       ${(1 to LpRounds).map(lpRoundCtes).mkString(",\n")},
       acc AS (SELECT n.true_label,
                CAST(COUNT(*) AS BIGINT) AS n_unlabeled,
                CAST(COUNT(st.cur) AS BIGINT) AS n_pred,
                CAST(SUM(CASE WHEN st.cur = n.true_label THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_correct
              FROM nodes n JOIN st$LpRounds st USING (vec_id)
              WHERE n.seed IS NULL GROUP BY 1)
       SELECT true_label, n_unlabeled, n_pred, n_correct,
              CAST((n_pred * 10000) // n_unlabeled AS BIGINT) AS cover_bp,
              CAST(CASE WHEN n_pred = 0 THEN NULL
                        ELSE (n_correct * 10000) // n_pred END AS BIGINT)
                AS acc_bp
       FROM acc ORDER BY true_label"""

  private val Shortlist = 20

  /** Binary-quantization top-5: sign-bit codes (16 B/vector), Hamming
    * shortlist of 20, exact rerank — the fourth compression point on
    * the family's accuracy/footprint dial (float 256 B → SQ8 64 B →
    * PQ codes → BQ 16 B). */
  private def simBqTopk(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.binaryTopK(
        e.filter(col("vec_id") % 25 === 0), e, k = K,
        shortlist = Shortlist)
      .orderBy("query_id", "rank")
  }

  private def bqSqlAt(shortlist: Int): String =
    s"""WITH v AS MATERIALIZED (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings),
       bq AS MATERIALIZED (SELECT vec_id, nv,
                CAST(list_sum(list_transform(range(32),
                  i -> CASE WHEN nv[i+1] > 0
                       THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS b0,
                CAST(list_sum(list_transform(range(32),
                  i -> CASE WHEN nv[i+33] > 0
                       THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS b1
              FROM v),
       qb AS (SELECT vec_id AS query_id, nv AS qv, b0 AS qb0, b1 AS qb1
              FROM bq WHERE vec_id % 25 = 0),
       hm AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     bit_count(xor(q.qb0, c.b0))
                     + bit_count(xor(q.qb1, c.b1)) AS hamming
              FROM bq c JOIN qb q ON c.vec_id != q.query_id),
       sh AS (SELECT query_id, neighbor_id, CAST(hamming AS BIGINT)
                       AS hamming
              FROM (SELECT query_id, neighbor_id, hamming,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY hamming, neighbor_id) AS srank FROM hm)
              WHERE srank <= $shortlist),
       rr AS (SELECT s.query_id, s.neighbor_id, s.hamming,
                     round(list_dot_product(q.qv, c.nv), 4) AS sim
              FROM sh s
              JOIN qb q USING (query_id)
              JOIN v c ON c.vec_id = s.neighbor_id)
       SELECT query_id, rank, neighbor_id, hamming, sim FROM (
         SELECT query_id, neighbor_id, hamming, sim,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM rr) t
       WHERE rank <= $K ORDER BY query_id, rank"""

  private val simBqSql = bqSqlAt(Shortlist)

  /** Recall@5 of binary quantization at shortlist ∈ {5, 20}: 5 = pure
    * Hamming ranking (no rerank headroom), 20 = the rerank dial —
    * measures what the 16× compression costs and what the shortlist
    * buys back. */
  private def simRecallBq(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val q = e.filter(col("vec_id") % 25 === 0)
    val ex = Similarity.bruteForceTopKAgg(q, e, k = K)
      .select("query_id", "neighbor_id")
    def hits(shortlist: Int, as: String): DataFrame =
      ex.join(
          Similarity.binaryTopK(q, e, k = K, shortlist = shortlist)
            .select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as(as))
    ex.select("query_id").distinct()
      .join(hits(K, "hits_s5"), Seq("query_id"), "left")
      .join(hits(Shortlist, "hits_s20"), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits_s5"), lit(0L)).as("hits_s5"),
        coalesce(col("hits_s20"), lit(0L)).as("hits_s20"))
      .select(col("query_id"), col("hits_s5"), col("hits_s20"),
        expr(s"(hits_s5 * 10000) div $K").as("recall_bp_s5"),
        expr(s"(hits_s20 * 10000) div $K").as("recall_bp_s20"))
      .orderBy("query_id")
  }

  private val simRecallBqSql =
    s"""WITH exact AS (${SimQ.simTopkSql}),
       a5 AS (${bqSqlAt(K)}),
       a20 AS (${bqSqlAt(Shortlist)}),
       h5 AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_s5
              FROM exact e JOIN a5
                ON e.query_id = a5.query_id AND e.neighbor_id = a5.neighbor_id
              GROUP BY e.query_id),
       h20 AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_s20
               FROM exact e JOIN a20
                 ON e.query_id = a20.query_id
                 AND e.neighbor_id = a20.neighbor_id
               GROUP BY e.query_id)
       SELECT qq.query_id,
         CAST(COALESCE(h5.hits_s5, 0) AS BIGINT) AS hits_s5,
         CAST(COALESCE(h20.hits_s20, 0) AS BIGINT) AS hits_s20,
         CAST((COALESCE(h5.hits_s5, 0) * 10000) // $K AS BIGINT)
           AS recall_bp_s5,
         CAST((COALESCE(h20.hits_s20, 0) * 10000) // $K AS BIGINT)
           AS recall_bp_s20
       FROM (SELECT DISTINCT query_id FROM exact) qq
       LEFT JOIN h5 ON qq.query_id = h5.query_id
       LEFT JOIN h20 ON qq.query_id = h20.query_id
       ORDER BY qq.query_id"""

  /** Per-cluster simplified silhouette of the trained k-means
    * codebook (`sim_kmeans`'s exact chain), on SQUARED fixed-point
    * distances: a = d² to the assigned centroid, b = d² to the nearest
    * OTHER centroid, sil_bp = (b − a)·10⁴ div max(a, b) — the
    * centroid-based silhouette (Hruschka et al.), which needs one
    * |corpus|×k distance pass instead of all point pairs; squared
    * distances keep it integer end to end ((b−a) ≥ 0 by construction,
    * so div ≡ floor). The k-centroid side is broadcast
    * (PlanAuditSpec-listed, sim_kmeans's shape); the a/b pick is a
    * per-id window over k rows. High mean → tight, well-separated
    * cluster; 0 → boundary. */
  private def simSilhouette(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, d)
    val v = graft.sim.KMeans.scaledVecs(e, "vec_id", "embedding")
    val cents = graft.sim.KMeans.train(e, "vec_id", "embedding",
      k = 4, iters = 1, trainBuckets = 2)
    val d2 = v.crossJoin(broadcast(cents))
      .select(col("id"), col("cid"),
        expr("aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)")
          .as("d2"))
    val ranked = d2.withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("d2"), col("cid"))))
      .filter(col("rn") <= 2)
    val ab = ranked.groupBy("id").agg(
      max(when(col("rn") === 1, col("cid"))).as("cluster"),
      max(when(col("rn") === 1, col("d2"))).as("a"),
      max(when(col("rn") === 2, col("d2"))).as("b"))
    val sil = ab.withColumn("sil_bp",
      when(greatest(col("a"), col("b")) === 0, 0L)
        .otherwise(expr("(b - a) * 10000 div greatest(a, b)")))
    sil.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        expr("sum(sil_bp) div count(1)").as("mean_sil_bp"))
      .orderBy("cluster")
  }

  private val simSilhouetteSql =
    """WITH v AS (SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
       sv AS (SELECT * FROM v WHERE
         CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 = 0),
       c0 AS (SELECT id AS cid, v AS c
              FROM (SELECT * FROM sv ORDER BY id LIMIT 4)),
       d0 AS (SELECT sv.id, c0.cid,
                CAST(list_sum(list_transform(range(1, 65),
                  i -> (sv.v[i] - c0.c[i]) * (sv.v[i] - c0.c[i])))
                  AS BIGINT) AS d2
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
       d2a AS (SELECT v.id, c1.cid,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> (v.v[i] - c1.c[i]) * (v.v[i] - c1.c[i])))
                   AS BIGINT) AS d2
               FROM v CROSS JOIN c1),
       rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                ORDER BY d2, cid) AS rn FROM d2a),
       ab AS (SELECT id,
                MAX(CASE WHEN rn = 1 THEN cid END) AS cluster,
                MAX(CASE WHEN rn = 1 THEN d2 END) AS a,
                MAX(CASE WHEN rn = 2 THEN d2 END) AS b
              FROM rk WHERE rn <= 2 GROUP BY id),
       sil AS (SELECT cluster,
                 CASE WHEN GREATEST(a, b) = 0 THEN 0
                      ELSE (b - a) * 10000 // GREATEST(a, b) END AS sil_bp
               FROM ab)
       SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(sil_bp) // COUNT(*) AS BIGINT) AS mean_sil_bp
       FROM sil GROUP BY 1 ORDER BY cluster"""

  // ---------------------------------------------------- sim_mp / recall

  /** Multi-probe LSH top-5 for the %25 query slice
    * ([[Similarity.lshTopKMultiprobe]]): the SAME derived-band capped
    * index as `sim_lsh_topk`, with each query band probing its bucket
    * plus 4 one-bit perturbations — more recall from the same index,
    * the Lv et al. 2007 trade. */
  private def simMpTopk(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    Similarity.lshTopKMultiprobe(
        e.filter(col("vec_id") % 25 === 0), e, k = 5,
        params = Similarity.annParamsFor(e, d), probes = 4)
      .orderBy("query_id", "rank")
  }

  /** The multiprobe oracle: [[SimQ.simLshSql]]'s algebra with the
    * query-side probe explosion ([[AnnSql]] probes = 4). */
  private val simMpSql = AnnSql.topKSql("vec_id % 25 = 0", k = 5, probes = 4)

  /** Recall@5 of plain LSH vs multi-probe LSH at the SAME index, side
    * by side per query — the lift the Hamming-1 probes buy, measured
    * (the sim_recall_lsh discipline applied to the Lv et al. dial).
    * Grading joins are |queries|·k rows. */
  private def simRecallMp(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val q = e.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopKAgg(q, e, k = 5)
      .select("query_id", "neighbor_id")
    def hits(approx: DataFrame, as: String): DataFrame =
      exact.join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as(as))
    val p = Similarity.annParamsFor(e, d)
    exact.select("query_id").distinct()
      .join(hits(Similarity.lshTopK(q, e, k = 5, params = p),
        "hits_lsh"), Seq("query_id"), "left")
      .join(hits(Similarity.lshTopKMultiprobe(q, e, k = 5,
        params = p, probes = 4), "hits_mp"),
        Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits_lsh"), lit(0L)).as("hits_lsh"),
        coalesce(col("hits_mp"), lit(0L)).as("hits_mp"),
        expr("(coalesce(hits_lsh, CAST(0 AS BIGINT)) * 10000) div 5")
          .as("recall_lsh_bp"),
        expr("(coalesce(hits_mp, CAST(0 AS BIGINT)) * 10000) div 5")
          .as("recall_mp_bp"))
      .orderBy("query_id")
  }

  private val simRecallMpSql =
    s"""WITH exact AS (${SimQ.simTopkSql}),
       lsh AS (${SimQ.simLshSql}),
       mp AS ($simMpSql),
       hl AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_lsh
              FROM exact e JOIN lsh a
                ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
              GROUP BY e.query_id),
       hm AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_mp
              FROM exact e JOIN mp a
                ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
              GROUP BY e.query_id)
       SELECT q.query_id,
         CAST(COALESCE(hl.hits_lsh, 0) AS BIGINT) AS hits_lsh,
         CAST(COALESCE(hm.hits_mp, 0) AS BIGINT) AS hits_mp,
         CAST((COALESCE(hl.hits_lsh, 0) * 10000) // 5 AS BIGINT)
           AS recall_lsh_bp,
         CAST((COALESCE(hm.hits_mp, 0) * 10000) // 5 AS BIGINT)
           AS recall_mp_bp
       FROM (SELECT DISTINCT query_id FROM exact) q
       LEFT JOIN hl ON q.query_id = hl.query_id
       LEFT JOIN hm ON q.query_id = hm.query_id
       ORDER BY q.query_id"""

  def queries: Seq[Q] = Seq(
    Q("sim_mp_topk", simMpTopk, Some(simMpSql)),
    Q("sim_recall_mp", simRecallMp, Some(simRecallMpSql)),
    Q("sim_nsw_topk", simNswTopk, Some(simNswSql)),
    Q("sim_recall_nsw", simRecallNsw, Some(simRecallNswSql)),
    Q("sim_label_prop", simLabelProp, Some(simLabelPropSql)),
    Q("sim_bq_topk", simBqTopk, Some(simBqSql)),
    Q("sim_recall_bq", simRecallBq, Some(simRecallBqSql)),
    Q("sim_silhouette", simSilhouette, Some(simSilhouetteSql)))
}
