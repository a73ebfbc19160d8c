package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Features

/** Hand-computed specs for the feature-engineering kernels
  * ([[graft.ml.Features.looEncode]] / [[graft.ml.Features.giniStump]]) —
  * in particular the leave-one-out exclusion property (a row's code
  * never contains its own target) and the stump preferring a pure
  * split over an impure one with exact integer Gini.
  */
class FeatureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  test("looEncode: each row's code excludes its own target, exactly") {
    val s = spark
    import s.implicits._
    // cat a: targets 10,20,30 (S=60) → loo = (60−x)/2 = 25,20,15;
    // cat b: single row → loo NULL, cat_mean = its own value.
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("b", 7L))
      .toDF("cat", "t")
    val r = Features.looEncode(df, "cat", "t")
      .orderBy("cat", "t")
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))
    assert(r.toSeq === Seq(
      ("a", 10L, 20L, 25L), ("a", 20L, 20L, 20L), ("a", 30L, 20L, 15L),
      ("b", 7L, 7L, -1L)))
  }

  test("looEncode: floor division matches DuckDB // on non-divisible sums") {
    val s = spark
    import s.implicits._
    // S=10, n=3: cat_mean = ⌊10/3⌋ = 3; loo for x=1: ⌊9/2⌋ = 4.
    val df = Seq(("a", 1L), ("a", 4L), ("a", 5L)).toDF("cat", "t")
    val r = Features.looEncode(df, "cat", "t").orderBy("t").collect()
    assert(r.head.getLong(2) === 3L && r.head.getLong(3) === 4L)
  }

  test("giniStump: picks the pure split and reports zero impurity") {
    val s = spark
    import s.implicits._
    // feature 1,1 all positive; feature 2,2 all negative → split at 1
    // is pure both sides: gini_bp = 0, and t=1 beats t∈{} (2 excluded
    // as the full-left split).
    val df = Seq((1L, 1L), (1L, 1L), (2L, 0L), (2L, 0L)).toDF("v", "y")
    val r = Features.giniStump(df, "v", "y").head()
    assert(r.getLong(0) === 1L) // split_value
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L) // n_left, pos_left
    assert(r.getLong(3) === 2L && r.getLong(4) === 0L) // n_right, pos_right
    assert(r.getLong(5) === 0L) // gini_bp
  }

  test("giniStump: exact weighted impurity on a hand case") {
    // v=1: (n=2, p=1), v=2: (n=2, p=2), v=3: (n=2, p=0).
    // t=1: L(2,1) A=2²−1−1=2, R(4,2) A=16−4−4=8 → num=2·4+8·2=24, den=8
    //      G = 24/8 = 3 → gini_bp = ⌊24·10⁴/(8·6)⌋ = 5000
    // t=2: L(4,3) A=16−9−1=6, R(2,0) A=4−0−4=0 → num=6·2+0·4=12, den=8
    //      G = 12/8 = 1.5 → gini_bp = ⌊12·10⁴/(8·6)⌋ = 2500 ← winner
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1L), (1L, 0L), (2L, 1L), (2L, 1L), (3L, 0L), (3L, 0L))
      .toDF("v", "y")
    val r = Features.giniStump(df, "v", "y").head()
    assert(r.getLong(0) === 2L)
    assert(r.getLong(5) === 2500L)
  }

  test("giniStump: ties break toward the smallest threshold") {
    val s = spark
    import s.implicits._
    // Symmetric data: splits at t=1 and t=2 have identical G; t=1 wins.
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L)).toDF("v", "y")
    val r = Features.giniStump(df, "v", "y").head()
    assert(r.getLong(0) === 1L)
  }
}
