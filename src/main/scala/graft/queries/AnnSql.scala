package graft.queries

import graft.sim.{AnnParams, Similarity}

/** SINGLE generator for the DuckDB oracle's LSH-candidate algebra — the
  * SQL mirror of [[graft.sim.Similarity.lshCandidateSims]]. Every
  * consumer (`sim_lsh_topk`, `sim_mp_topk`, the NSW graph build, label
  * propagation, the mutual-kNN family) previously inlined its own copy
  * of the signature/bucket SQL; centralizing it here means the engine
  * algebra and its oracle can only change TOGETHER.
  *
  * The generated CTE chain replays, at ANY scale from one statement:
  *   1. `v`     — L2-normalized vectors;
  *   2. `pr`    — the corpus-size-derived band-bits r (and bucket mask)
  *                via the same integer threshold ladder as
  *                [[graft.sim.AnnParams.bandBitsFor]];
  *   3. `sigs`  — 60-plane sign-random-projection signatures (the ±1
  *                hyperplane constants embedded as literals — the
  *                pipeline is deterministic end-to-end);
  *   4. `cb0`/`cbc`/`hot` — per-(band, bucket) corpus posting lists,
  *                ranked by the deterministic multiplicative-hash
  *                shuffle order and truncated at
  *                [[graft.sim.AnnParams.BucketCap]]; `hot` = the
  *                buckets that overflowed;
  *   5. `qs`/`qb` — query-side probes: the base bucket, `probes`
  *                static Hamming-1 perturbations (multiprobe), plus the
  *                full Hamming-1 shell for any band whose base bucket
  *                was capped (the re-probe that buys back truncated
  *                recall);
  *   6. `cand`/`sims` — distinct colliding pairs, exact-cosine rerank
  *                (4dp-rounded, as everywhere).
  */
object AnnSql {

  /** Packed-signature expression for planes [offset, offset + planes)
    * over a normalized-vector column `nv` (bit p = plane offset + p) —
    * same md5-derived ±1 constants as the engine kernel
    * ([[graft.plans.VectorKernels.planeSign]]). offset > 0 builds the
    * later WORDS of a wide multi-word signature. */
  def sigExprAt(offset: Int, planes: Int, dims: Int = 64): String = {
    val all = Similarity.planeSigns(offset + planes, dims)
    (0 until planes).map { p =>
      val arr = all(offset + p).map(v => if (v > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(nv, $arr) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** The classic 60-plane single-word signature expression. */
  def sigExpr(dims: Int = 64): String =
    sigExprAt(0, AnnParams.Bands * AnnParams.SlotBits, dims)

  /** r = clamp(⌈log₂(n / TargetOccupancy)⌉, 4, slotBits) as an integer
    * CASE ladder — term-for-term the `find` in
    * [[graft.sim.AnnParams.bandBitsFor]] (and its wide twin), so the
    * engines cannot disagree at a threshold boundary. */
  def bandBitsCase(nExpr: String,
      slotBits: Int = AnnParams.SlotBits): String = {
    val arms = (4 until slotBits).map { r =>
      s"WHEN $nExpr <= ${AnnParams.TargetOccupancy << r} THEN $r"
    }.mkString(" ")
    s"CASE $arms ELSE $slotBits END"
  }

  /** The full candidate-generation CTE chain (no trailing comma).
    *
    * @param queryPred SQL predicate over `vec_id` selecting the query
    *                  side ("TRUE" for corpus-vs-corpus builds)
    * @param probes    static multiprobe perturbations per band (0 =
    *                  plain LSH; ≤ 4, the derived-r floor)
    * @param qCol/nCol output column names of `cand`/`sims`
    * @param table     corpus table (vec_id, embedding)
    */
  def simsCtes(queryPred: String, probes: Int = 0,
      qCol: String = "query_id", nCol: String = "neighbor_id",
      table: String = "embeddings", dims: Int = 64): String =
    simsCtesLayout(words = 1, slotBits = AnnParams.SlotBits,
      queryPred, probes, qCol, nCol, table, dims)

  /** [[simsCtes]] for the WIDE two-word layout
    * ([[graft.sim.AnnParams.forCountWide]] — 4 bands × 30-bit slots
    * across two BIGINT signature words). */
  def simsCtesWide(queryPred: String, probes: Int = 0,
      qCol: String = "query_id", nCol: String = "neighbor_id",
      table: String = "embeddings", dims: Int = 64): String =
    simsCtesLayout(words = 2, slotBits = AnnParams.WideSlotBits,
      queryPred, probes, qCol, nCol, table, dims)

  private def simsCtesLayout(words: Int, slotBits: Int,
      queryPred: String, probes: Int,
      qCol: String, nCol: String, table: String, dims: Int): String = {
    require(probes >= 0 && probes <= 4,
      s"probes=$probes above the derived band-bits floor (4)")
    val slot = slotBits
    val bands = AnnParams.Bands
    val bpw = bands / words
    val cap = AnnParams.BucketCap
    // one signature column per word; band b reads word b div bpw at
    // slot b mod bpw — the exact engine bucket algebra
    val sigCols = (0 until words).map { w =>
      s"CAST(${sigExprAt(w * bpw * slot, bpw * slot, dims)} AS BIGINT) AS sig$w"
    }.mkString(",\n                ")
    val bucketExpr = "(CASE " + (0 until words).map { w =>
      s"WHEN band < ${(w + 1) * bpw} THEN (sig$w >> ((band - ${w * bpw}) * $slot)) "
    }.mkString + "END) & pr.mask"
    s"""v AS (SELECT vec_id,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[])))
                  AS nv
              FROM $table),
       pr AS (SELECT r, ((1::BIGINT << r) - 1) AS mask FROM
                (SELECT ${bandBitsCase("n", slotBits)} AS r FROM
                  (SELECT COUNT(*) AS n FROM $table))),
       sigs AS MATERIALIZED (SELECT vec_id, nv,
                $sigCols FROM v),
       cb0 AS (SELECT vec_id, band, bucket,
                 ROW_NUMBER() OVER (PARTITION BY band, bucket
                   ORDER BY (vec_id * 48271) % 1048573, vec_id) AS rn,
                 COUNT(*) OVER (PARTITION BY band, bucket) AS sz
               FROM (SELECT vec_id, band,
                       $bucketExpr AS bucket
                     FROM sigs CROSS JOIN pr
                     CROSS JOIN (SELECT unnest(range(0, $bands)) AS band) b)),
       cbc AS MATERIALIZED (SELECT vec_id, band, bucket FROM cb0
               WHERE rn <= $cap),
       hot AS (SELECT DISTINCT band, bucket FROM cb0 WHERE sz > $cap),
       qs AS (SELECT vec_id, band,
                $bucketExpr AS base
              FROM sigs CROSS JOIN pr
              CROSS JOIN (SELECT unnest(range(0, $bands)) AS band) b
              WHERE $queryPred),
       qb AS (SELECT vec_id, band,
                CASE WHEN p = 0 THEN base
                     ELSE xor(base, 1::BIGINT << (p - 1)) END AS bucket
              FROM qs CROSS JOIN (SELECT unnest(range(0, ${probes + 1})) AS p) pp
              UNION ALL
              SELECT q.vec_id, q.band, xor(q.base, 1::BIGINT << i) AS bucket
              FROM qs q
              JOIN hot h ON h.band = q.band AND h.bucket = q.base
              CROSS JOIN pr
              CROSS JOIN (SELECT unnest(range(0, $slot)) AS i) ii
              WHERE i < pr.r),
       cand AS (SELECT DISTINCT q.vec_id AS $qCol, c.vec_id AS $nCol
                FROM qb q JOIN cbc c USING (band, bucket)
                WHERE q.vec_id != c.vec_id),
       sims AS MATERIALIZED (SELECT $qCol, $nCol,
                round(list_dot_product(x.nv, y.nv), 4) AS sim
              FROM cand
              JOIN sigs x ON x.vec_id = $qCol
              JOIN sigs y ON y.vec_id = $nCol)"""
  }

  /** A complete LSH top-k oracle statement — [[graft.sim.Similarity
    * .lshTopK]] / `lshTopKMultiprobe` over `queryPred` queries. */
  def topKSql(queryPred: String, k: Int, probes: Int = 0,
      table: String = "embeddings"): String =
    topKOver(simsCtes(queryPred, probes, table = table), k)

  /** The wide-layout twin of [[topKSql]]. */
  def topKSqlWide(queryPred: String, k: Int, probes: Int = 0,
      table: String = "embeddings"): String =
    topKOver(simsCtesWide(queryPred, probes, table = table), k)

  private def topKOver(ctes: String, k: Int): String =
    s"""WITH $ctes
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM sims) t
       WHERE rank <= $k ORDER BY query_id, rank"""
}
