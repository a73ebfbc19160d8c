package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Exact.idiv

/** TextRank keyword extraction (Mihalcea & Tarau 2004) for EVERY
  * document simultaneously: per-doc word co-occurrence graph (adjacent
  * tokens, window 2), PageRank over the per-doc graphs, top-k words
  * per doc — the unsupervised keyword layer a corpus tagger or index
  * enricher runs over billions of documents.
  *
  * Relational shape: nodes are (doc_id, word) pairs, so ONE plan ranks
  * the whole corpus — there is no per-document loop anywhere. Edges
  * come from a lag window PARTITIONED BY doc (one shuffle, never
  * global); each PageRank round is one |edges| equi join + map-side
  * partial aggregation + a |nodes| degree join — the gr_pagerank
  * shape, localCheckpoint'd per round. The graph is undirected
  * (symmetric edge list, distinct), so every node keeps an in-edge and
  * the score relation never loses rows — no dangling-mass correction
  * needed.
  *
  * Integer fixed point (the graph-pack discipline): scores start at
  * 10⁶, each round is score = 0.15·10⁶ + ⌊85·Σ⌊score/deg⌋ / 100⌋ —
  * per-edge floor division like [[graft.graph.Graph]]'s Katz kernel,
  * so both engines agree bit-for-bit at any partitioning.
  */
object TextRank {

  /** (doc_id, rank, word, score): top-k keywords per document after
    * `iters` PageRank rounds; `score` is the 10⁶-fixed-point rank.
    * Self-loop token repeats (w w) are dropped; a document with no
    * 2-token window (or all-identical tokens) yields no rows. */
  def keywords(docs: DataFrame, textCol: Column, iters: Int,
      topK: Int): DataFrame = {
    require(iters >= 1 && topK >= 1)
    val toks = docs.select(col("doc_id"),
      posexplode(Text.tokens(textCol)).as(Seq("pos", "w")))
    val lw = Window.partitionBy("doc_id").orderBy("pos")
    val prs = toks
      .select(col("doc_id"), lag(col("w"), 1).over(lw).as("src"),
        col("w").as("dst"))
      .filter(col("src").isNotNull && col("src") =!= col("dst"))
    val edges = prs
      .union(prs.select(col("doc_id"), col("dst").as("src"),
        col("src").as("dst")))
      .distinct().localCheckpoint()
    val deg = edges.groupBy("doc_id", "src")
      .agg(count(lit(1)).cast("long").as("deg")).localCheckpoint()
    var score = deg.select(col("doc_id"), col("src").as("w"),
      lit(1000000L).as("score"))
    for (_ <- 1 to iters) {
      score = edges
        .join(score.select(col("doc_id"), col("w").as("src"), col("score")),
          Seq("doc_id", "src"))
        .join(deg, Seq("doc_id", "src"))
        .select(col("doc_id"), col("dst").as("w"),
          idiv(col("score"), col("deg")).as("c"))
        .groupBy("doc_id", "w")
        .agg((lit(150000L) + idiv(lit(85L) * sum(col("c")), lit(100L)))
          .as("score"))
        .localCheckpoint()
    }
    val wr = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("w").asc)
    score.withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("w").as("word"), col("score"))
  }

  /** Warm-start twin of [[keywords]] for corpus appends/updates — the
    * r10-verdict incremental for TextRank. The co-occurrence graphs are
    * PER-DOCUMENT (nodes are (doc_id, word) pairs; no edge ever crosses
    * documents), so a changed corpus invalidates exactly its changed
    * documents: `prev` (a prior full [[keywords]] output) is reused for
    * every untouched doc_id and only `changedDocs` (new + replaced
    * documents, full rows) run the iterated rounds — work scales with
    * the delta, not the corpus, and the union is bit-identical to a
    * cold run on the merged corpus BY CONSTRUCTION (spec-asserted).
    * Deleted documents: pass them in `changedDocs` with no rows —
    * i.e. pre-filter `prev`; this function never resurrects them. */
  def keywordsWarm(changedDocs: DataFrame, textCol: Column, iters: Int,
      topK: Int, prev: DataFrame): DataFrame =
    prev.join(changedDocs.select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
      .unionByName(keywords(changedDocs, textCol, iters, topK))
}
