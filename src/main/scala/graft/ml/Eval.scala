package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Exact.idiv

/** Integer-exact binary-classifier evaluation: ROC AUC, average
  * precision, a calibration (reliability) curve, and the thresholded
  * confusion matrix with precision/recall/F1 — the measurement half of
  * the quality-classifier loop ([[Perceptron]] trains a filter model;
  * these grade any scored filter against held-out labels).
  *
  * The scale discipline is the score HISTOGRAM, never a global rank:
  * every metric here is a function of the per-score (positives,
  * negatives) counts, so the plan is one partial-agg groupBy on the
  * score (mergeable at 100 TB) followed by windows over the
  * |score-domain|-sized histogram — for the integer scores these
  * evaluators require, that domain is bounded by construction (a
  * stopword-hit count, a fixed-point model margin bucket), so the
  * single-partition cumulative windows sort dozens of rows, not the
  * corpus. The classical rank-sum AUC (Mann–Whitney) is exactly the
  * histogram form with ties counted ½ — proved in EvalSpec against a
  * hand-ranked example.
  *
  * Everything stays BIGINT/DECIMAL(38,0) until the final basis-point
  * floor division (the [[Stats]] exactness discipline), so both engines
  * reproduce every metric bit for bit.
  */
object Eval {

  private val D = DecimalType(38, 0)

  /** Per-score histogram: one row per distinct score value with its
    * positive and negative label counts — the sufficient statistic for
    * every threshold metric. One partial-agg shuffle. */
  def scoreHistogram(df: DataFrame, scoreCol: Column, labelCol: Column)
      : DataFrame =
    df.select(scoreCol.cast("long").as("score"),
        labelCol.cast("long").as("y"))
      .groupBy("score")
      .agg(sum(col("y")).as("pos"),
        sum(lit(1L) - col("y")).as("neg"))

  /** Tie-aware ROC AUC in basis points, one output row
    * (pos_n, neg_n, auc_bp). A positive "beats" every negative with a
    * strictly smaller score and half-beats each tied negative:
    * 2·AUC·P·N = Σ_s pos_s · (2·negBelow_s + neg_s), so
    * auc_bp = ⌊10⁴·Σ / (2·P·N)⌋ — the Mann–Whitney U statistic computed
    * from the histogram, exactly integer. NULL auc_bp when either class
    * is empty (AUC undefined). */
  def aucBp(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val h = scoreHistogram(df, scoreCol, labelCol)
    val below = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("neg_below", coalesce(sum("neg").over(below), lit(0L)))
      .agg(
        sum("pos").cast("long").as("pos_n"),
        sum("neg").cast("long").as("neg_n"),
        sum((col("pos") * (col("neg_below") * 2 + col("neg"))).cast(D))
          .as("u2"))
      .select(col("pos_n"), col("neg_n"),
        when(col("pos_n") === 0 || col("neg_n") === 0, lit(null))
          .otherwise(idiv(col("u2") * 10000,
            col("pos_n").cast(D) * col("neg_n") * 2))
          .cast("long").as("auc_bp"))
  }

  /** Average precision in basis points, one output row (pos_n, ap_bp):
    * thresholds sweep the distinct scores DESCENDING; at each score s
    * the pos_s newly-recalled positives contribute precision-at-s
    * = cumPos_s / cum_s. Ties inside one score value resolve as the
    * single threshold step the histogram makes them (the
    * interpolation-free "step" AP). Each term floors to basis points
    * BEFORE the sum — a defined algorithm both engines replay exactly:
    * ap_bp = ⌊Σ_s ⌊10⁴·pos_s·cumPos_s / cum_s⌋ / P⌋. */
  def avgPrecisionBp(df: DataFrame, scoreCol: Column, labelCol: Column)
      : DataFrame = {
    val h = scoreHistogram(df, scoreCol, labelCol)
    val fromTop = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    h.withColumn("cum_pos", sum("pos").over(fromTop))
      .withColumn("cum_n", sum(col("pos") + col("neg")).over(fromTop))
      .withColumn("term",
        idiv(col("pos").cast(D) * col("cum_pos") * 10000, col("cum_n")))
      .agg(sum("pos").cast("long").as("pos_n"),
        sum("term").as("term_sum"))
      .select(col("pos_n"),
        when(col("pos_n") === 0, lit(null))
          .otherwise(idiv(col("term_sum"), col("pos_n").cast(D)))
          .cast("long").as("ap_bp"))
  }

  /** Kolmogorov–Smirnov separation statistic, one output row
    * (pos_n, neg_n, at_score, ks_bp): the maximum over thresholds of
    * |F_pos(s) − F_neg(s)| where F is the class CDF — the standard
    * credit-scoring separation measure (KS = 0 indistinguishable,
    * 10⁴ perfectly separated), read off the same score histogram as
    * [[aucBp]] with two cumulative windows. Integer-exact:
    * ks_bp = ⌊|cumPos·N − cumNeg·P|·10⁴ / (P·N)⌋ at the argmax of the
    * scaled numerator (floor is monotone, so max-of-floors =
    * floor-of-max; ties → smallest score, making at_score
    * deterministic). NULL ks_bp when either class is empty. */
  def ksBp(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val h = scoreHistogram(df, scoreCol, labelCol)
    val cum = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    h.withColumn("cp", sum("pos").over(cum).cast(D))
      .withColumn("cn", sum("neg").over(cum).cast(D))
      .withColumn("p", sum("pos").over(all).cast(D))
      .withColumn("n", sum("neg").over(all).cast(D))
      .withColumn("num", abs(col("cp") * col("n") - col("cn") * col("p")))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("num").desc, col("score").asc)))
      .filter(col("rn") === 1)
      .select(col("p").cast("long").as("pos_n"),
        col("n").cast("long").as("neg_n"),
        col("score").as("at_score"),
        when(col("p") === 0 || col("n") === 0, lit(null))
          .otherwise(idiv(col("num") * 10000, col("p") * col("n")))
          .cast("long").as("ks_bp"))
  }

  /** Calibration (reliability) curve over fixed-width score buckets:
    * one row per non-empty bucket with its row count, positive count,
    * observed positive rate in basis points, and the exact mean score
    * in centi-units (⌊100·Σscore/n⌋). Fixed-width bucketing — not
    * ntile — so there is no global sort anywhere: the plan is the same
    * single groupBy as the histogram, with the bucket id computed in
    * the scan. A well-calibrated scorer shows pos_rate_bp rising with
    * the bucket. */
  def calibration(df: DataFrame, scoreCol: Column, labelCol: Column,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    df.select(idiv(scoreCol.cast("long"), lit(bucketWidth)).as("bucket"),
        scoreCol.cast("long").as("score"), labelCol.cast("long").as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum("y").cast("long").as("pos"),
        sum("score").cast("long").as("score_sum"))
      .select(col("bucket"), col("n"), col("pos"),
        idiv(col("pos") * 10000, col("n")).as("pos_rate_bp"),
        idiv(col("score_sum") * 100, col("n")).as("mean_score_c"))
  }

  /** Full precision–recall curve: one row per DISTINCT score value s,
    * treating s as the threshold (predict positive when score ≥ s) —
    * tp = cumPos from the top, fp/fn derived, precision/recall/F1 in
    * basis points. The curve [[avgPrecisionBp]] summarizes, laid out
    * row by row; |score-domain| output rows from the same histogram
    * plan, so the whole curve costs one groupBy + one bounded window at
    * any corpus size. */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column)
      : DataFrame = {
    val h = scoreHistogram(df, scoreCol, labelCol)
    val fromTop = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy()
    h.withColumn("tp", sum("pos").over(fromTop).cast("long"))
      .withColumn("npred", sum(col("pos") + col("neg")).over(fromTop)
        .cast("long"))
      .withColumn("pos_n", sum("pos").over(all).cast("long"))
      .select(col("score").as("threshold"), col("tp"),
        (col("npred") - col("tp")).as("fp"),
        (col("pos_n") - col("tp")).as("fn"),
        idiv(col("tp") * 10000, col("npred")).as("precision_bp"),
        when(col("pos_n") === 0, lit(null))
          .otherwise(idiv(col("tp") * 10000, col("pos_n")))
          .cast("long").as("recall_bp"))
  }

  /** Confusion matrix at `threshold` (predict positive when
    * score ≥ threshold), one row: tp/fp/fn/tn plus precision, recall
    * and F1 in basis points (F1 = 2tp / (2tp + fp + fn), floored; NULL
    * when the denominator is 0). ONE aggregate over the scan — no
    * shuffle beyond the 1-row agg. */
  def confusion(df: DataFrame, scoreCol: Column, labelCol: Column,
      threshold: Long): DataFrame = {
    val pred = (scoreCol.cast("long") >= threshold).cast("long")
    val y = labelCol.cast("long")
    df.select(pred.as("p"), y.as("y"))
      .agg(
        sum(col("p") * col("y")).cast("long").as("tp"),
        sum(col("p") * (lit(1L) - col("y"))).cast("long").as("fp"),
        sum((lit(1L) - col("p")) * col("y")).cast("long").as("fn"),
        sum((lit(1L) - col("p")) * (lit(1L) - col("y"))).cast("long")
          .as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0, lit(null))
          .otherwise(idiv(col("tp") * 10000, col("tp") + col("fp")))
          .cast("long").as("precision_bp"),
        when(col("tp") + col("fn") === 0, lit(null))
          .otherwise(idiv(col("tp") * 10000, col("tp") + col("fn")))
          .cast("long").as("recall_bp"),
        when(col("tp") * 2 + col("fp") + col("fn") === 0, lit(null))
          .otherwise(idiv(col("tp") * 20000,
            col("tp") * 2 + col("fp") + col("fn")))
          .cast("long").as("f1_bp"))
  }
}
