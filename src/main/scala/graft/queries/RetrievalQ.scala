package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sim.Similarity

/** Retrieval extensions (engine completeness beyond BM25/ANN): exact
  * positional phrase search over an inverted-postings shape, and
  * hard-negative mining for contrastive training pairs.
  */
object RetrievalQ extends QueryPack {

  /** The probe phrase: moderately frequent at every SF (within-doc
    * repeats included), so the query exercises multi-match docs. */
  private val phrase = Seq("slow", "hash", "batch")

  /** Exact phrase search as ONE partial-agg shuffle (no k-way self-join):
    * each occurrence of phrase term i at position p votes bit 2^i at
    * anchor p−i; an anchor whose bit-sum is complete (all terms at their
    * offsets) is a match. Cost: the exploded token stream collapses to
    * phrase-term occurrences BEFORE the shuffle (the broadcast 3-row
    * term→(idx,bit) table filters it), so the shuffle carries
    * |postings(phrase terms)| rows — never the corpus. At index-backed
    * scale the same plan starts from the persisted postings
    * ([[graft.text.Bm25]] manifest keyed on TOKEN prunes postings files);
    * a positional index swaps in without changing the anchor algebra.
    * Duplicate phrase terms are handled: each (occurrence, idx) pair
    * contributes its own bit exactly once, so the bit-sum test stays
    * exact. Returns (doc_id, match_pos), 1-based. */
  private[graft] def phraseMatches(docs: DataFrame,
      ph0: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = ph0.zipWithIndex
      .map { case (w, i) => (w, i, 1L << i) }
      .toDF("tok", "idx", "bit")
    val full = (1L << ph0.length) - 1
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    toks.join(broadcast(ph), Seq("tok"))
      .select(col("doc_id"), (col("pos") - col("idx")).as("match_pos"),
        col("bit"))
      .filter(col("match_pos") >= 1)
      .groupBy("doc_id", "match_pos")
      .agg(sum(col("bit")).as("mask"))
      .filter(col("mask") === full)
      .select(col("doc_id"), col("match_pos").cast("int").as("match_pos"))
      .orderBy("doc_id", "match_pos")
  }

  private def tPhrase(spark: SparkSession, d: String): DataFrame =
    phraseMatches(Tables.documents(spark, d), phrase)

  private val tPhraseSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
       toks AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, tl[i] AS tok
                FROM t, unnest(range(1, len(tl) + 1)) u(i)),
       ph(tok, idx, bit) AS (VALUES ('slow', 0, 1), ('hash', 1, 2), ('batch', 2, 4)),
       cand AS (SELECT doc_id, pos - idx AS match_pos, bit
                FROM toks JOIN ph USING (tok) WHERE pos - idx >= 1)
       SELECT doc_id, CAST(match_pos AS INTEGER) AS match_pos
       FROM cand GROUP BY doc_id, match_pos HAVING SUM(bit) = 7
       ORDER BY doc_id, match_pos"""

  /** Hard negatives: for each query vector (vec_id % 25 = 0), the 5
    * most-similar corpus vectors with a DIFFERENT class label —
    * [[Similarity.hardNegativeTopK]]'s broadcast-query + map-side-top-k
    * shape. */
  private def simHardNeg(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    Similarity.hardNegativeTopK(e.filter(col("vec_id") % 25 === 0), e, k = 5)
      .orderBy("query_id", "rank")
  }

  /** BANDED hard negatives — the 100 TB path for `sim_hard_neg`'s exact
    * broadcast-scan contract (the sim_near_dup_banded discipline applied
    * to hard-negative mining): candidates from the capped corpus-derived
    * LSH banding (linear in n), label-disequality filter, exact-cosine
    * rerank top-5. Fewer than 5 when a query's collision set is thin —
    * the standard ANN trade, priced by `sim_recall_hard_neg`. */
  private def simHardNegBanded(spark: SparkSession, d: String): DataFrame =
    hardNegBanded(spark, d)
      .orderBy("query_id", "rank")

  private def hardNegBanded(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, d)
    val lab = e.select(col("vec_id"), col("label"))
    graft.sim.Similarity.lshCandidateSims(
        e.filter(col("vec_id") % 25 === 0), e,
        graft.sim.Similarity.annParamsFor(e, d))
      .join(lab.select(col("vec_id").as("query_id"),
        col("label").as("qlab")), "query_id")
      .join(lab.select(col("vec_id").as("neighbor_id"),
        col("label").as("nlab")), "neighbor_id")
      .filter(col("qlab") =!= col("nlab"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  private val simHardNegBandedSql =
    s"""WITH ${AnnSql.simsCtes("vec_id % 25 = 0")},
       lab AS (SELECT vec_id, label FROM embeddings)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT s.query_id, s.neighbor_id, s.sim,
                CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
                     ORDER BY s.sim DESC, s.neighbor_id) AS INT) AS rank
         FROM sims s JOIN lab a ON a.vec_id = s.query_id
                     JOIN lab b ON b.vec_id = s.neighbor_id
         WHERE a.label != b.label) t
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Recall@5 of the banded hard-negative path against the exact
    * contract, per query in integer bp (the sim_recall_lsh shape). */
  private def simRecallHardNeg(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    val exact = Similarity
      .hardNegativeTopK(e.filter(col("vec_id") % 25 === 0), e, k = 5)
      .select("query_id", "neighbor_id")
    val approx = hardNegBanded(spark, d).select("query_id", "neighbor_id")
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("(coalesce(hits, CAST(0 AS BIGINT)) * 10000) div 5")
          .as("recall_bp"))
      .orderBy("query_id")
  }

  private lazy val simRecallHardNegSql =
    s"""WITH exact AS ($simHardNegSql),
       approx AS ($simHardNegBandedSql),
       hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits
                FROM exact e JOIN approx a
                  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
                GROUP BY e.query_id)
       SELECT q.query_id,
         CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         CAST((COALESCE(h.hits, 0) * 10000) // 5 AS BIGINT) AS recall_bp
       FROM (SELECT DISTINCT query_id FROM exact) q
       LEFT JOIN hits h ON q.query_id = h.query_id
       ORDER BY q.query_id"""

  private val simHardNegSql =
    """WITH v AS (SELECT vec_id, label,
                list_transform(embedding::DOUBLE[],
                  x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])))
                  AS nv
              FROM embeddings),
       q AS (SELECT vec_id AS qid, label AS qlab, nv AS qv FROM v WHERE vec_id % 25 = 0),
       pairs AS (
         SELECT qid AS query_id, vec_id AS neighbor_id,
                round(list_dot_product(qv, nv), 4) AS sim
         FROM q JOIN v ON v.label != q.qlab)
       SELECT query_id, rank, neighbor_id, sim FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS INT) AS rank
         FROM pairs) t
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Proximity search (the IR NEAR/n operator): all (pos_a, pos_b)
    * co-occurrences of two terms within distance 3 inside a doc. The
    * postings for each term collapse out of the exploded token stream
    * BEFORE the shuffle (scan-fused equality filters); the pairing is
    * an EQUI-join on doc_id with the distance predicate as a residual —
    * per-doc postings bound the pair fan-out, never a cartesian. With a
    * positional index persisted (the [[graft.text.Bm25]] manifest
    * shape), the same plan reads two pruned posting ranges instead of
    * the corpus. */
  private[graft] def proximityPairs(docs: DataFrame, termA: String,
      termB: String, maxDist: Int): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val a = toks.filter(col("tok") === termA)
      .select(col("doc_id"), col("pos").as("pos_a"))
    val b = toks.filter(col("tok") === termB)
      .select(col("doc_id"), col("pos").as("pos_b"))
    a.join(b, Seq("doc_id"))
      .filter(abs(col("pos_a") - col("pos_b")) <= maxDist)
      .select(col("doc_id"), col("pos_a").cast("int").as("pos_a"),
        col("pos_b").cast("int").as("pos_b"))
      .orderBy("doc_id", "pos_a", "pos_b")
  }

  private def tProximity(spark: SparkSession, d: String): DataFrame =
    proximityPairs(Tables.documents(spark, d), "vector", "window", 3)

  private val tProximitySql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
       toks AS (SELECT doc_id, CAST(i AS INTEGER) AS pos, tl[i] AS tok
                FROM t, unnest(range(1, len(tl) + 1)) u(i)),
       a AS (SELECT doc_id, pos AS pos_a FROM toks WHERE tok = 'vector'),
       b AS (SELECT doc_id, pos AS pos_b FROM toks WHERE tok = 'window')
       SELECT doc_id, pos_a, pos_b
       FROM a JOIN b USING (doc_id)
       WHERE ABS(pos_a - pos_b) <= 3
       ORDER BY doc_id, pos_a, pos_b"""

  /** Class-separability audit: the cosine between every pair of
    * per-label centroid embeddings. Centroids pool in the exact
    * fixed-point domain (floor(x·2²⁰) BIGINT sums through
    * [[graft.plans.VecSum]] — order-independent, engine-exact; the
    * e_pool recipe), then the |labels|-row centroid table normalizes
    * through the [[Similarity.normalized]] kernel and pairs via a
    * broadcast inequality self-join — dim-sized sides by construction,
    * and the dot is the sequential in-row [[Similarity.dotFast]] fold
    * (never a cross-row double sum, whose addition order is
    * engine-dependent). The audit a training pipeline runs before
    * trusting labels for hard-negative mining
    * ([[Similarity.hardNegativeTopK]]). */
  private def simCentroids(spark: SparkSession, d: String): DataFrame = {
    val cents = Tables.embeddings(spark, d)
      .select(col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))")
          .as("v"))
      .groupBy("label")
      .agg(graft.plans.VecSum.sum(col("v")).as("s"), count(lit(1)).as("n"))
      .select(col("label"),
        expr("transform(s, x -> (CAST(x AS DOUBLE) / 1048576.0) / n)").as("c"))
    val unit = Similarity.normalized(cents, "label", "c")
    unit.as("a").join(broadcast(unit.as("b")), col("a.id") < col("b.id"))
      .select(col("a.id").as("label_a"), col("b.id").as("label_b"),
        round(Similarity.dotFast(col("a.nv"), col("b.nv")), 4).as("sim"))
      .orderBy("label_a", "label_b")
  }

  private val simCentroidsSql =
    """WITH sv AS (SELECT label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
       e AS (SELECT label, u.dim, u.q
             FROM sv, UNNEST(list_transform(v,
               (x, i) -> {'dim': i - 1, 'q': x})) AS r(u)),
       agg AS (SELECT label, dim, SUM(q) AS sq, COUNT(*) AS n
               FROM e GROUP BY 1, 2),
       cent AS (SELECT label,
                  list((CAST(sq AS DOUBLE) / 1048576.0) / n ORDER BY dim) AS c
                FROM agg GROUP BY label),
       nrm AS (SELECT label,
                 list_transform(c, x -> x / sqrt(list_dot_product(c, c))) AS nv
               FROM cent)
       SELECT a.label AS label_a, b.label AS label_b,
              ROUND(list_dot_product(a.nv, b.nv), 4) AS sim
       FROM nrm a JOIN nrm b ON a.label < b.label
       ORDER BY label_a, label_b"""

  def queries: Seq[Q] = Seq(
    Q("t_phrase", tPhrase, Some(tPhraseSql)),
    Q("t_proximity", tProximity, Some(tProximitySql)),
    Q("sim_hard_neg", simHardNeg, Some(simHardNegSql)),
    Q("sim_hard_neg_banded", simHardNegBanded, Some(simHardNegBandedSql)),
    Q("sim_recall_hard_neg", simRecallHardNeg, Some(simRecallHardNegSql)),
    Q("sim_centroids", simCentroids, Some(simCentroidsSql)))
}
