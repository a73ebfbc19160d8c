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

  def queries: Seq[Q] = Seq(
    Q("t_phrase", tPhrase, Some(tPhraseSql)),
    Q("sim_hard_neg", simHardNeg, Some(simHardNegSql)))
}
