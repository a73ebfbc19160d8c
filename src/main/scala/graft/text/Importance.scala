package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection-by-importance — the DSIR idea (Xie et al. 2023,
  * arXiv:2302.03169): score raw-pool documents by how much their token
  * distribution resembles a trusted target domain, then keep the
  * highest-scoring slice for pretraining.
  *
  * House exactness discipline: DSIR's per-feature weight is the
  * log-likelihood ratio log(p_target/p_raw); libm `log` ulps differ
  * across engines, so the weight here is the LOG-FREE cross-multiplied
  * form
  *
  *   w(tok) = ct(tok)·NR − cr(tok)·NT
  *
  * (ct/cr = token count in target/raw corpus, NT/NR = the corpora's total
  * token counts) — positive iff p_target(tok) > p_raw(tok), and every
  * ranking it induces over single tokens matches the ratio's sign
  * exactly, in pure integer arithmetic any engine replays bit-for-bit.
  * A document's affinity is the sum of w over its token OCCURRENCES.
  *
  * Scale shape: one partial-agg shuffle for the |vocab| count table, a
  * 1-row total aggregate broadcast into the weight projection, then one
  * token-level join of the raw pool against the weight table and a
  * per-doc partial-agg sum. Same bounded-model discipline as
  * [[Lm.lmScore]]: with `modelTopK` set, only the k weightiest tokens
  * (|w| desc, tok asc — total order) are retained and broadcast; un-capped
  * the join carries no hint and AQE sizes it. Overflow: all arithmetic is
  * BIGINT; |w| < NT·NR so the per-doc sum stays in range while the
  * combined corpus is under ~3·10⁹ tokens — past that (the 100 TB run)
  * switch the two products to DECIMAL(38,0), same expressions.
  */
object Importance {

  /** Per-token affinity weights (tok, w) from the labeled corpus:
    * `targetPred` marks target-domain rows, everything else is the raw
    * pool. */
  def tokenWeights(docs: DataFrame, targetPred: Column,
      textCol: String = "text", modelTopK: Int = 0): DataFrame = {
    val toks = docs
      .select(targetPred.as("tgt"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tc = toks.groupBy("tok").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val tot = tc.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val w = tc.crossJoin(broadcast(tot))
      .select(col("tok"),
        (col("ct") * col("nr") - col("cr") * col("nt")).as("w"))
    if (modelTopK > 0)
      w.orderBy(abs(col("w")).desc, col("tok")).limit(modelTopK)
    else w
  }

  /** Affinity score per raw-pool document (docs NOT matching
    * `targetPred`): sum of token weights over occurrences. One row per
    * raw doc; docs whose every token fell outside a `modelTopK` trim
    * score 0. */
  def affinityScores(docs: DataFrame, targetPred: Column,
      idCol: String = "doc_id", textCol: String = "text",
      modelTopK: Int = 0): DataFrame = {
    val w = tokenWeights(docs, targetPred, textCol, modelTopK)
    val rawToks = docs.filter(!targetPred)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val scored = rawToks
      .join(if (modelTopK > 0) broadcast(w) else w, Seq("tok"))
      .groupBy("doc_id").agg(sum("w").as("affinity"))
    docs.filter(!targetPred).select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("affinity"), lit(0L)).as("affinity"))
  }

  /** The selection: keep the top `1/keepDenom` of the raw pool by
    * affinity (ties → doc_id asc), pure integer `rn·keepDenom ≤ n` gate.
    * The exact global window is the oracle baseline; at 100 TB the same
    * cut is an `approx_percentile` threshold on the affinity column,
    * broadcast back over one scan — no global sort (the
    * [[graft.queries.PrepQ]] `t_quality_pctl` trade, documented there). */
  def selectTopAffinity(docs: DataFrame, targetPred: Column,
      idCol: String = "doc_id", textCol: String = "text",
      keepDenom: Long = 10L, modelTopK: Int = 0): DataFrame = {
    val s = affinityScores(docs, targetPred, idCol, textCol, modelTopK)
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("affinity").desc, col("doc_id"))
    s.withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("rn") * keepDenom <= col("n"))
      .select(col("doc_id"), col("affinity"), col("rn"))
  }
}
