package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (k1 = 1.2, b = 0.75) split into the production
  * two-phase lifecycle: build the postings index ONCE over the corpus,
  * then score many query batches against it — the same build-once /
  * search-many shape as the persisted IVF index
  * ([[graft.sim.Similarity.buildIvfIndex]]), for the lexical side
  * (quality-targeted selection, decontamination lookups).
  *
  * Exactness discipline (shared with the `t_bm25` oracle): IDF is the
  * RATIONAL (N − df + 0.5)/(df + 0.5) — no libm ln(), whose last ulp is
  * engine-dependent; every arithmetic step is one fixed IEEE expression
  * tree; per-term contributions are rounded to 6dp and summed as
  * DECIMAL(18,6) so the cross-term sum is order-independent.
  */
object Bm25 {

  /** Materializable index: one row per (tok, doc) posting carrying the
    * term frequency and the doc length — everything scoring needs, no
    * re-tokenization. Persist via
    * `Sinks.writeWithManifest(…, keyCol = "tok")`: per-file TOKEN ranges
    * let the min/max manifest prune postings files down to a query's
    * terms (`readVersionedKeyRange`) — the storage-layer analogue of an
    * inverted index seek. */
  def buildIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dlen"))
    toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tfreq"))
      .join(dl, Seq("doc_id"))
      .select("tok", "doc_id", "tfreq", "dlen")
  }

  /** Incremental index maintenance: tokenize ONLY the new documents and
    * append their postings to the persisted index — no rebuild, commit
    * cost O(new files) ([[graft.io.Sinks.appendWithManifest]]).
    * `build(A); append(B)` yields the identical row set — and therefore
    * bit-identical scores, since df / corpus stats are derived from the
    * index at score time — as `build(A ∪ B)` (ExtensionsSpec). The docs
    * MUST be new: re-appending an already-indexed document would
    * double-count its postings (append is not upsert — deduplicate
    * upstream, e.g. via the manifest CDF or an anti-join on doc_id). */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      indexPath: String, idCol: String = "doc_id", textCol: String = "text",
      nFiles: Int = 4): Unit =
    graft.io.Sinks.appendWithManifest(spark, buildIndex(docs, idCol, textCol),
      indexPath, "tok", nFiles)

  /** One BM25 term contribution — the SINGLE definition of the scoring
    * arithmetic (the `t_bm25` oracle SQL mirrors this text). */
  private val contribExpr =
    """CAST(round(
         ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
          / (CAST(df AS DOUBLE) + 0.5))
         * ((CAST(tfreq AS DOUBLE) * 2.2)
            / (CAST(tfreq AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * (CAST(dlen AS DOUBLE)
                   / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
         6) AS DECIMAL(18,6))"""

  /** Per-document token lengths straight from the corpus — the cheap
    * (|docs|-group) corpus-stats source for INLINE-built indexes:
    * deriving (doc_id, dlen) from the index itself evaluates the full
    * (doc, tok) aggregation just to distinct it away (measured ~2/3 of
    * `t_bm25`'s engine time at sf1). Reloaded persisted indexes, which
    * have no corpus at hand, keep the index-derived default — the two
    * sources are row-identical by construction (dlen is functionally
    * dependent on doc_id in the index). */
  def docLengths(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy("doc_id").agg(count(lit(1)).as("dlen"))

  /** ONE-PASS corpus digest for direct-from-docs scoring: group the
    * token stream on (doc_id, term-if-queried-else-null) — ≤
    * |docs|·(|terms|+1) rows — so ONE explode pass yields everything
    * scoring needs: dlen = Σ cnt per doc, tf = the non-null rows, df =
    * tf's per-term row count, corpus stats = dl's 1-row aggregate. The
    * digest is checkpointed (tiny, distributed) because its consumers
    * materialize as separate broadcast jobs, which do not share
    * exchanges — without it each one re-ran the corpus explode
    * (measured: 4 explode passes per t_bm25 at sf1). */
  private def queryDigest(docs: DataFrame, terms: Seq[String],
      idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("doc_id"),
        when(col("tok").isin(terms: _*), col("tok")).as("qtok"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()

  /** Direct-from-docs top-k BM25 — bit-identical to
    * `scoreFromIndex(buildIndex(docs), terms, k)` (ExtensionsSpec) but
    * ONE corpus pass instead of four: the inline-query form, where the
    * index API remains the persisted build-once/search-many seam. */
  def score(docs: DataFrame, terms: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val g = queryDigest(docs, terms, idCol, textCol)
    val dl = g.groupBy("doc_id").agg(sum(col("cnt")).as("dlen"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dlen")).as("tot"))
    val tf = g.filter(col("qtok").isNotNull)
      .select(col("doc_id"), col("qtok").as("tok"), col("cnt").as("tfreq"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), Seq("tok"))
      .join(broadcast(dl), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(contribExpr))
      .groupBy("doc_id").agg(sum(col("contrib")).as("sdec"))
      .select(col("doc_id"), col("sdec").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Direct-from-docs batch scoring — bit-identical per query to
    * `scoreBatchFromIndex(buildIndex(docs), queries, k)` (the digest is
    * keyed by the batch's distinct term set; duplicate terms within a
    * query deduplicate exactly as the index path does). */
  def scoreBatch(docs: DataFrame, queries: DataFrame, k: Int,
      queryIdCol: String = "query_id", termCol: String = "term",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val q = queries
      .select(col(queryIdCol).as("query_id"), col(termCol).as("tok"))
      .distinct()
    val terms = q.select("tok").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val g = queryDigest(docs, terms, idCol, textCol)
    val dl = g.groupBy("doc_id").agg(sum(col("cnt")).as("dlen"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dlen")).as("tot"))
    val tf = g.filter(col("qtok").isNotNull)
      .select(col("doc_id"), col("qtok").as("tok"), col("cnt").as("tfreq"))
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(dft), Seq("tok"))
      .join(broadcast(dl), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(contribExpr))
      .join(broadcast(q), Seq("tok"))
      .groupBy("query_id", "doc_id").agg(sum(col("contrib")).as("sdec"))
      .select(col("query_id"), col("doc_id"),
        col("sdec").cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
  }

  /** Top-k BM25 docs for `terms` against a (possibly reloaded) index.
    * Corpus stats and per-term document frequencies are derived from
    * `docLengths` when given (the inline-build path) or FROM the index
    * (1-row / |terms|-row broadcasts); the only per-posting work is
    * the term filter and the per-doc decimal sum. Top-k is
    * TakeOrderedAndProject, never a global sort. */
  def scoreFromIndex(index: DataFrame, terms: Seq[String], k: Int,
      docLengths: Option[DataFrame] = None): DataFrame = {
    val docs = docLengths.getOrElse(index.select("doc_id", "dlen").distinct())
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dlen")).as("tot"))
    val hits = index.filter(col("tok").isin(terms: _*))
    val dft = hits.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    hits.join(broadcast(dft), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(contribExpr))
      .groupBy("doc_id").agg(sum(col("contrib")).as("sdec"))
      .select(col("doc_id"), col("sdec").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Batch-of-queries BM25 — the production shape against a persisted
    * index: a query TABLE (query_id, term) scored in ONE pass over the
    * postings, the same N-queries-one-plan flow as
    * [[graft.sim.Similarity.ivfSearchIndex]] on the ANN side. Per query
    * the result is bit-identical to [[scoreFromIndex]] on its terms
    * (ExtensionsSpec asserts it).
    *
    * Plan: the postings are filtered ONCE by the distinct term set of the
    * whole batch (broadcast left-semi — the batch is small relative to
    * the corpus by definition), per-term document frequencies and the
    * 1-row corpus stats are broadcast back, and attaching query ids is a
    * broadcast join on the term — so N queries cost one postings scan +
    * one (query_id, doc_id) aggregation, not N scans. Duplicate terms
    * within a query are deduplicated (binary query term frequency,
    * matching `isin` in the single-query path). Per-query top-k is a
    * rank window over |batch|·k candidate rows, never a global sort. */
  def scoreBatchFromIndex(index: DataFrame, queries: DataFrame, k: Int,
      queryIdCol: String = "query_id", termCol: String = "term",
      docLengths: Option[DataFrame] = None): DataFrame = {
    val q = queries
      .select(col(queryIdCol).as("query_id"), col(termCol).as("tok"))
      .distinct()
    val docs = docLengths.getOrElse(index.select("doc_id", "dlen").distinct())
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dlen")).as("tot"))
    val hits = index
      .join(broadcast(q.select("tok").distinct()), Seq("tok"), "left_semi")
    val dft = hits.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    hits.join(broadcast(dft), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", expr(contribExpr))
      .join(broadcast(q), Seq("tok"))
      .groupBy("query_id", "doc_id").agg(sum(col("contrib")).as("sdec"))
      .select(col("query_id"), col("doc_id"),
        col("sdec").cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
  }
}
