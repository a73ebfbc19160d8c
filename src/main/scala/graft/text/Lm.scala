package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring with a BOUNDED model — the
  * CCNet-style perplexity filter (quality scoring by fluency under the
  * corpus's own bigram statistics), built so the broadcast side is a
  * size-capped model rather than the corpus-dependent full bigram table.
  *
  * Why the cap is the operator, not an option: distinct bigrams grow with
  * the corpus (open vocabulary → easily 10⁹+ at 100 TB), so a plan that
  * force-broadcasts the full count table is a scale-killer even though it
  * is correct and fast at small SF. The production construction (CCNet)
  * scores against a TRIMMED model — the top-k bigrams by count — which is
  * bounded by the parameter, not the data. With `modelTopK` set, the
  * model and its unigram denominators are ≤ k rows and are broadcast;
  * with no cap the hint is OMITTED so AQE picks the join strategy from
  * actual sizes (broadcast when genuinely small, shuffle join otherwise)
  * instead of an unconditional driver-side collect.
  *
  * Exactness (house float discipline): no log-perplexity — libm ln ulps
  * differ across engines; the score is the MEAN of 6dp-rounded rational
  * probabilities P(w2|w1) = c2/c1, summed as DECIMAL(18,6) (associative,
  * partitioning-independent), one final double divide. The trim is
  * deterministic: top-k by (count desc, w1, w2) — a total order, since
  * (w1, w2) is unique — so any engine replays the same model.
  */
object Lm {

  /** Adjacent-pair extraction: one row per (doc, w1, w2) bigram token.
    * SHUFFLE-FREE and fully codegen'd — [[graft.plans.BigramsExpr]]
    * builds the pair array in one JVM pass and Spark's own `explode`
    * stays inside WholeStageCodegen, so the extraction fuses into the
    * scan (the interpreted-lambda `transform` it replaces measured as
    * 2/3 of the whole lmScore chain's cost at sf1). */
  def bigrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(Text.bigramsArr(col(textCol))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** The higher-order-function formulation of [[bigrams]] — kept as the
    * bit-parity reference for the codegen'd expression (ExtensionsSpec
    * asserts equality); not on any hot path. */
  def bigramsHof(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("s"))
      .select(col("doc_id"), explode(expr(
        "transform(slice(s, 1, size(s) - 1), (w, i) -> struct(w AS w1, s[i + 1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** The (possibly trimmed) bigram count model: (w1, w2, c2).
    * `minCount` drops rare bigrams (noise at corpus scale); `modelTopK`
    * keeps the k most frequent, tie-broken (c2 desc, w1, w2) — a
    * TakeOrderedAndProject, never a global sort, so the trim itself is
    * scale-safe. 0 disables either bound. */
  def bigramModel(b: DataFrame, modelTopK: Int = 0,
      minCount: Long = 1L): DataFrame = {
    val counts = b.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val floored = if (minCount > 1L) counts.filter(col("c2") >= minCount)
      else counts
    if (modelTopK > 0)
      floored.orderBy(col("c2").desc, col("w1"), col("w2")).limit(modelTopK)
    else floored
  }

  /** Mean in-model transition probability per document; documents with no
    * in-model bigram (fully out-of-model under a tight trim) score 0.0 —
    * the filter's intent, since nothing about them is attested fluent.
    * One row per input document regardless of the trim.
    *
    * Plan: bigram extraction (scan-fused), two bounded aggregations for
    * the model, then an inner join of the corpus bigrams against the
    * model. With `modelTopK` set both model tables are ≤ k rows →
    * broadcast hash joins with zero corpus shuffle; un-capped, AQE
    * chooses from real sizes. The unigram denominators c1 = count(w1 ·)
    * are FULL corpus counts (the model trim selects which transitions are
    * scored, not what they are conditioned on), restricted to the
    * trimmed model's w1 set before the broadcast so the hint side stays
    * ≤ k rows. */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", modelTopK: Int = 0,
      minCount: Long = 1L): DataFrame = {
    // No materialization of the bigram relation at all: with the
    // codegen'd [[graft.plans.BigramsExpr]] extraction the relation is
    // cheaper to RE-DERIVE from the scan (twice: once into the count
    // aggregate, once for the scoring join) than to checkpoint — the
    // earlier eager checkpoint existed to amortize the interpreted
    // lambda explode it replaced, and measured SLOWER than re-derivation
    // once the explode entered codegen (a columnar persist is slower
    // still: wide string rows make the InMemoryRelation batch write
    // cost more than the scans save).
    val b = bigrams(docs, idCol, textCol)
    // ONE aggregation pass feeds BOTH the model and the unigram
    // denominators: c1(w1) = Σ_{w2} c2(w1, w2) — an identity (every
    // bigram row contributes exactly once to its w1's count), so the
    // old second full scan of the bigram relation disappears. The
    // count relation is CHECKPOINTED (vocab-sized, distributed — never
    // a collect): its two consumers materialize as separate BROADCAST
    // jobs, which do not share exchanges across jobs — without the
    // checkpoint each broadcast re-ran the full bigram scan+aggregate
    // (measured as ~2/3 of the whole c_ccnet chain at sf1).
    val c2f = b.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint()
    val floored = if (minCount > 1L) c2f.filter(col("c2") >= minCount)
      else c2f
    val model = if (modelTopK > 0)
        floored.orderBy(col("c2").desc, col("w1"), col("w2")).limit(modelTopK)
      else floored
    val c1 = c2f.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val trimmed = modelTopK > 0 || minCount > 1L
    val c1r = if (trimmed)
      c1.join(model.select("w1").distinct(), Seq("w1"), "left_semi")
    else c1
    val scored = b
      .join(if (modelTopK > 0) broadcast(model) else model, Seq("w1", "w2"))
      .join(if (modelTopK > 0) broadcast(c1r) else c1r, Seq("w1"))
      .withColumn("p", expr(
        "CAST(round(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE), 6) AS DECIMAL(18,6))"))
      .groupBy("doc_id")
      .agg(sum(col("p")).as("sp"), count(lit(1)).as("nb"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(expr("CAST(sp AS DOUBLE) / CAST(nb AS DOUBLE)"), lit(0.0))
          .as("lm_score"))
  }

  /** Per-document salient term — TF-IDF argmax with a RATIONAL
    * inverse-document-frequency (tf · N/df; same no-libm trade as
    * [[lmScore]]) and an optional VOCAB CAP: with `vocabTopK` set, only
    * the k highest-df terms (ties → term asc) are scorable and the df
    * table is broadcast (≤ k rows by construction); documents whose
    * tokens all fall outside the capped vocabulary drop out. Un-capped,
    * the df side carries no hint — unigram vocabulary saturates far
    * slower than bigrams, but it is still corpus-dependent, so the
    * join strategy is AQE's size-based choice rather than a forced
    * broadcast. */
  def salientTerm(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", vocabTopK: Int = 0): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfFull = toks.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
    val dfTab = if (vocabTopK > 0)
      dfFull.orderBy(col("df").desc, col("tok")).limit(vocabTopK)
    else dfFull
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    tf.join(if (vocabTopK > 0) broadcast(dfTab) else dfTab, Seq("tok"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("tok").as("top_term"), col("score"))
  }
}
