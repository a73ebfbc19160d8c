package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Eval, Stats}

/** Unit specs for the classifier evaluators ([[graft.ml.Eval]]) and
  * Spearman rank correlation ([[graft.ml.Stats.spearmanBp]]) against
  * hand-computed examples — in particular the tie-handling identities
  * the histogram forms must reproduce. */
class EvalMlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  private def toDf(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("score", "y")
  }

  test("aucBp: tied positive/negative pairs count half (hand case = 0.5)") {
    // positives at scores {1,3,3}, negatives at {1,2,4}:
    // pairwise wins 4, losses 4.5... enumerated: (1,1)=.5 (1,2)=0 (1,4)=0
    // (3,1)=1 (3,2)=1 (3,4)=0 twice -> total 4.5 of 9 -> AUC 0.5
    val df = toDf(Seq(1L -> 0L, 1L -> 1L, 2L -> 0L,
      3L -> 1L, 3L -> 1L, 4L -> 0L))
    val r = Eval.aucBp(df, col("score"), col("y")).head()
    assert(r.getLong(0) === 3L) // pos_n
    assert(r.getLong(1) === 3L) // neg_n
    assert(r.getLong(2) === 5000L)
  }

  test("aucBp: perfect separation = 10000, inverted = 0") {
    val perfect = toDf(Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    assert(Eval.aucBp(perfect, col("score"), col("y")).head().getLong(2)
      === 10000L)
    val inverted = toDf(Seq(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
    assert(Eval.aucBp(inverted, col("score"), col("y")).head().getLong(2)
      === 0L)
  }

  test("aucBp: single-class input yields NULL") {
    val onlyPos = toDf(Seq(1L -> 1L, 2L -> 1L))
    assert(Eval.aucBp(onlyPos, col("score"), col("y")).head().isNullAt(2))
  }

  test("ksBp: hand case — max CDF gap with deterministic threshold") {
    // pos scores {3,4}, neg scores {1,2}: at s=2 F_neg=1, F_pos=0 →
    // KS = 10000 at score 2 (perfect separation).
    val perfect = toDf(Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    val p = Eval.ksBp(perfect, col("score"), col("y")).head()
    assert(p.getLong(2) === 2L && p.getLong(3) === 10000L)
    // pos {1,3}, neg {2,4}: cumP·N−cumN·P at s=1:2, s=2:0, s=3:2, s=4:0
    // → KS = ⌊2·10⁴/4⌋ = 5000, ties → smallest score 1.
    val mixed = toDf(Seq(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
    val m = Eval.ksBp(mixed, col("score"), col("y")).head()
    assert(m.getLong(2) === 1L && m.getLong(3) === 5000L)
  }

  test("ksBp: single-class input yields NULL") {
    val onlyNeg = toDf(Seq(1L -> 0L, 2L -> 0L))
    assert(Eval.ksBp(onlyNeg, col("score"), col("y")).head().isNullAt(3))
  }

  test("avgPrecisionBp: hand case (pos at top and at 2/3 precision)") {
    // descending: s=4 pos (prec 1/1 -> 10000), s=3 neg, s=2 pos
    // (prec 2/3 -> 6666); ap = (10000 + 6666) div 2 = 8333
    val df = toDf(Seq(4L -> 1L, 3L -> 0L, 2L -> 1L))
    val r = Eval.avgPrecisionBp(df, col("score"), col("y")).head()
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 8333L)
  }

  test("calibration: fixed-width buckets, exact integer rates") {
    val df = toDf(Seq(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
    val rows = Eval.calibration(df, col("score"), col("y"), 2L)
      .orderBy("bucket").collect()
    assert(rows.length === 2)
    assert(rows(0).getLong(3) === 0L)     // bucket 0: 0% positive
    assert(rows(1).getLong(3) === 10000L) // bucket 1: 100% positive
    assert(rows(1).getLong(4) === 250L)   // mean score (2+3)/2 = 2.5 -> 250c
  }

  test("confusion: counts and F1 at threshold") {
    // threshold 2: tp=2 fp=1 fn=1 tn=1 -> P=6666 R=6666 F1=6666
    val df = toDf(Seq(1L -> 0L, 1L -> 1L, 2L -> 0L, 2L -> 1L, 3L -> 1L))
    val r = Eval.confusion(df, col("score"), col("y"), 2L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 1L, 1L, 1L)))
    assert(r.getLong(4) === 6666L) // precision 2/3
    assert(r.getLong(5) === 6666L) // recall 2/3
    assert(r.getLong(6) === 6666L) // f1 = 4/6
  }

  test("spearmanBp: identity ranks = 10000, reversed = -10000") {
    val s = spark
    import s.implicits._
    val up = Seq((1L, 10L, 1L), (2L, 20L, 2L), (3L, 30L, 3L), (4L, 40L, 4L))
      .toDF("x", "y", "id")
    assert(Stats.spearmanBp(up, col("x"), col("y"), col("id"))
      .head().getLong(2) === 10000L)
    val down = Seq((1L, 40L, 1L), (2L, 30L, 2L), (3L, 20L, 3L), (4L, 10L, 4L))
      .toDF("x", "y", "id")
    assert(Stats.spearmanBp(down, col("x"), col("y"), col("id"))
      .head().getLong(2) === -10000L)
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}
