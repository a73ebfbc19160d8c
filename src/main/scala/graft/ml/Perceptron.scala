package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed batch perceptron — a trained linear quality classifier
  * with the house exactness guarantees: features, labels, margins,
  * gradients and weights are ALL BIGINT, so training is replayable
  * bit-for-bit in SQL by unrolling the rounds (the same contract as
  * [[graft.sim.KMeans]] integer Lloyd and the BPE merge induction).
  * Float classifiers (logistic/fastText-style) sum per-row gradients in
  * partition-dependent order — last-ulp drift, engine-dependent models;
  * the perceptron's integer updates are associative, hence exact.
  *
  * One training round = ONE distributed pass: filter to the rows the
  * current weights misclassify (y·⟨w,x⟩ ≤ 0), then a single partial-agg
  * aggregate of the error count and the J per-feature gradient sums
  * Σ y·xⱼ. The driver holds only the J-element weight vector between
  * rounds (the 1-row-aggregate discipline of
  * [[graft.graph.Graph.pageRankUntil]] — O(J) state, never data-sized),
  * and the new weights re-enter the next round's plan as LITERALS, so
  * every round stays one scan + one aggregate with no growing lineage.
  * At 100 TB each round is a full scan — the batch (not stochastic)
  * update is what makes the pass order-independent and therefore exact.
  */
object Perceptron {

  /** `rounds` batch-perceptron rounds over integer feature columns
    * `xCols` (include your own constant-1 bias column) with ±1 BIGINT
    * labels in `yCol`. Weights start at 0 — round 1 therefore counts
    * every row as misclassified (y·0 ≤ 0) and the first update is the
    * class-difference vector Σ y·x.
    *
    * Returns the training log: one row per round,
    * (round, errors, w_<xCol>...) where `errors` is the misclassified
    * count UNDER THE INCOMING weights and the w columns are the
    * weights AFTER the round's update. */
  def trainBatch(features: DataFrame, xCols: Seq[String], yCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(xCols.nonEmpty, "need at least one feature column")
    val spark = features.sparkSession
    val f = features.select(
      (col(yCol).cast("long").as("y") +:
        xCols.map(c => col(c).cast("long").as(c))): _*)
      .localCheckpoint() // features computed once, reused every round
    var w = Array.fill(xCols.size)(0L)
    val log = (1 to rounds).map { r =>
      val margin = xCols.zip(w)
        .map { case (c, wj) => col(c) * lit(wj) }
        .reduce(_ + _)
      val mis = f.filter(col("y") * margin <= 0L)
      val aggs = count(lit(1)).cast("long").as("errors") +:
        xCols.map(c => coalesce(sum(col("y") * col(c)), lit(0L)).as(s"g_$c"))
      val row = mis.agg(aggs.head, aggs.tail: _*).head()
      val errors = row.getLong(0)
      w = w.indices.map(j => w(j) + row.getLong(j + 1)).toArray
      Row.fromSeq(r.toLong +: errors +: w.toSeq)
    }
    val schema = StructType(
      StructField("round", LongType, nullable = false) +:
        StructField("errors", LongType, nullable = false) +:
        xCols.map(c => StructField(s"w_$c", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(log, 1), schema)
  }

  /** Classify with a trained integer weight vector: adds a `pred`
    * column sign(⟨w, x⟩) ∈ {−1, +1} (0 margin → −1, matching the
    * training rule's "y·m ≤ 0 is an error" convention). */
  def classify(features: DataFrame, xCols: Seq[String],
      weights: Seq[Long]): DataFrame = {
    require(xCols.size == weights.size, "one weight per feature column")
    val margin = xCols.zip(weights)
      .map { case (c, wj) => col(c).cast("long") * lit(wj) }
      .reduce(_ + _)
    features.withColumn("pred",
      when(margin > 0L, lit(1L)).otherwise(lit(-1L)))
  }
}
