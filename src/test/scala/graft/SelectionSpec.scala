package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.util.Selection

/** Hand-checked cases for the iterative exact-rank kernel: the
  * narrowing loop must agree with a plain sort at every rank, across
  * duplicates, negatives, and ranges both under and far over one
  * histogram's width (64). */
class SelectionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  private def ranks(vs: Seq[Long]): Unit = {
    val s = spark
    import s.implicits._
    val df = s.sparkContext.parallelize(vs, 4).toDF("v")
    val sorted = vs.sorted
    (1 to vs.size).foreach { k =>
      assert(Selection.exactRank(df, col("v"), k.toLong) === sorted(k - 1),
        s"rank $k of $vs")
    }
  }

  test("every rank of a small duplicate-heavy set (range < one histogram)") {
    ranks(Seq(5L, 1L, 5L, 3L, 3L, 3L, 9L, 1L))
  }

  test("every rank across a wide range with negatives (multiple rounds)") {
    ranks(Seq(-1000000L, 17L, 0L, 999999999L, 42L, 42L, -5L, 123456L, 7L))
  }

  test("constant column: all ranks return the constant") {
    ranks(Seq.fill(10)(7L))
  }

  test("AnnParams.bandBitsFor: occupancy-bounded bucket growth with clamps") {
    import graft.sim.AnnParams
    assert(AnnParams.bandBitsFor(500L) === 4) // clamp floor (sf0.01)
    assert(AnnParams.bandBitsFor(1024L) === 4) // ladder boundary inclusive
    assert(AnnParams.bandBitsFor(1025L) === 5) // first step past it
    assert(AnnParams.bandBitsFor(2000L) === 5) // sf0.1
    assert(AnnParams.bandBitsFor(20000L) === 9) // sf1: 512 buckets/band
    assert(AnnParams.bandBitsFor(1000000000L) === AnnParams.SlotBits) // clamp
    // monotone in n: more data never means fewer buckets
    val rs = Seq(1L, 10L, 100L, 10000L, 100000000L, Long.MaxValue / 2)
      .map(AnnParams.bandBitsFor)
    assert(rs === rs.sorted)
    // SQL ladder and Scala derivation agree term for term: the CASE arms
    // are generated from the same thresholds
    val sql = graft.queries.AnnSql.bandBitsCase("n")
    (4 until AnnParams.SlotBits).foreach { r =>
      assert(sql.contains(s"<= ${AnnParams.TargetOccupancy << r} THEN $r"))
    }
    // derived params stay within the signature the oracle can replay
    assert(AnnParams.forCount(Long.MaxValue / 2).planes <= 62)
  }

  test("median/p90 formulas against a known 6-element multiset") {
    val s = spark
    import s.implicits._
    val df = Seq(10L, 20L, 30L, 40L, 50L, 60L).toDF("v")
    // lower median of even n: k = (6+1)/2 = 3 → 30
    assert(Selection.exactRank(df, col("v"), (6 + 1) / 2) === 30L)
    // p90: k = ceil(0.9·6) = 6 → 60
    assert(Selection.exactRank(df, col("v"), (9 * 6 + 9) / 10) === 60L)
  }
}
