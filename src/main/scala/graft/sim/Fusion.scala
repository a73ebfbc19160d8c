package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranker
  * ([[graft.text.Bm25]]) with a semantic one ([[Similarity]]) without
  * comparing their incommensurable scores. Reciprocal-rank fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009) uses only the RANKS:
  *
  *   rrf(q, d) = Σ_over_rankers ⌊10⁶ / (k0 + rank_r(q, d))⌋
  *
  * scaled to integers (floor division, no float reciprocals) so the
  * fused ordering is engine-exact and the DuckDB oracle replays it
  * bit-for-bit. k0 = 60 is the paper's constant: it damps the head so
  * one ranker's #1 can't drown the other's consensus.
  */
object Fusion {

  /** Fuse per-query rankings. Each input must carry
    * (query_id, doc_id, rank) with rank 1-based and (query_id, doc_id)
    * unique — exactly the shape [[graft.text.Bm25.scoreBatchFromIndex]]
    * and [[Similarity.bruteForceTopK]] emit. A document absent from a
    * ranker simply contributes nothing (the standard RRF convention).
    * Returns the fused per-query top-`topK`:
    * (query_id, rank, doc_id, rrf), ties broken on doc_id.
    *
    * Scale shape: the inputs are already top-k lists — |queries|·k rows
    * each, never corpus-sized — so the union + (query_id, doc_id)
    * partial-agg sum + per-query rank window all run over
    * |queries|·k·|rankers| rows. The expensive work happened inside the
    * rankers; fusion itself is free at any corpus size. */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k0 >= 0 && topK >= 1, s"bad k0=$k0 / topK=$topK")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      expr(s"CAST(1000000 div ($k0 + rank) AS BIGINT)").as("__c")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    contribs.reduce(_.unionByName(_))
      .groupBy("query_id", "doc_id").agg(sum(col("__c")).as("rrf"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "doc_id", "rrf")
  }
}
