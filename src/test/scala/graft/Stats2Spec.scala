package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Stats

/** Hand-computed specs for the time-series kernels
  * ([[graft.ml.Stats.acfBp]] / [[graft.ml.Stats.theilSenBp]]) —
  * in particular the alternating-series ACF sign pattern and the
  * Theil–Sen breakdown property (one wild outlier cannot move the
  * median slope) that distinguish them from their fragile cousins. */
class Stats2Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  private def series(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("t", "x")
  }

  test("acfBp: alternating series — lag1 negative, lag2 positive, exact") {
    // x = 0,2,0,2,0,2,0,2 (n=8, S=8): dev_t = 8x−8 = ∓8 alternating,
    // den = 8·64 = 512.
    // lag1: 7 pairs, every product −64 → num=−448 → ⌊10⁴·448/512⌋ = −8750
    // lag2: 6 pairs, every product +64 → num=+384 → 10⁴·384/512 = 7500
    val df = series((1L to 8L).map(t => t -> (if (t % 2 == 0) 2L else 0L)))
    val r = Stats.acfBp(df, col("t"), col("x"), 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq === Seq((1L, 7L, -8750L), (2L, 6L, 7500L)))
  }

  test("acfBp: constant series yields NULL (den = 0), not an ANSI error") {
    val df = series((1L to 5L).map(t => t -> 3L))
    val r = Stats.acfBp(df, col("t"), col("x"), 2).collect()
    assert(r.length === 2 && r.forall(_.isNullAt(2)))
  }

  test("theilSenBp: one wild outlier cannot move the median slope") {
    // (1,1),(2,2),(3,3),(4,100): slopes bp sorted =
    // [10000,10000,10000,330000,490000,970000]; lower median (rn=3) = 10000.
    val df = series(Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 100L))
    val r = Stats.theilSenBp(df, col("t"), col("x")).head()
    assert(r.getLong(0) === 6L)
    assert(r.getLong(1) === 10000L)
    // OLS on the same points is dragged far above the pairwise median.
    val ols = Stats.olsSlopeBp(df, Seq.empty, col("t"), col("x")).head()
    assert(ols.getLong(1) > 100000L)
  }

  test("theilSenBp: negative slopes floor toward zero on both engines") {
    // (1,10),(2,7),(3,3): slopes bp = [-30000,-35000,-40000] sorted
    // ascending = [-40000,-35000,-30000]; lower median (rn=2) = -35000.
    val df = series(Seq(1L -> 10L, 2L -> 7L, 3L -> 3L))
    val r = Stats.theilSenBp(df, col("t"), col("x")).head()
    assert(r.getLong(1) === -35000L)
  }

  test("pacfBp: matches an independent fixed-point Durbin–Levinson replay") {
    val s = spark
    import s.implicits._
    val rho = Seq(6000L, -2500L, 1200L, 300L)
    // reference loop: BigInt floors, identical algebra
    def fd(a: BigInt, b: BigInt): BigInt = (a - a.mod(b)) / b
    val S = BigInt(10000)
    var phi = Vector(BigInt(rho.head))
    var expected = Vector(rho.head)
    for (k <- 1 until rho.length) {
      val num = BigInt(rho(k)) -
        fd((1 to k).map(j => phi(j - 1) * BigInt(rho(k - j))).sum, S)
      val den = S - fd((1 to k).map(j => phi(j - 1) * BigInt(rho(j - 1))).sum, S)
      val pkk = if (den <= 0) BigInt(0) else fd(num * S, den)
      phi = (1 to k).map(j => phi(j - 1) - fd(pkk * phi(k - j), S))
        .toVector :+ pkk
      expected :+= pkk.toLong
    }
    val acfDf = rho.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v) }.toDF("lag", "acf_bp")
    val r = Stats.pacfBp(acfDf, rho.length).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    (1 to rho.length).foreach(k =>
      assert(r(k.toLong) === expected(k - 1), s"lag $k"))
  }

  test("pacfBp: AR(1)-style geometric ACF cuts off after lag 1") {
    val s = spark
    import s.implicits._
    val acfDf = Seq((1L, 5000L), (2L, 2500L), (3L, 1250L))
      .toDF("lag", "acf_bp")
    val r = Stats.pacfBp(acfDf, 3).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) === 5000L)
    // exact zero up to fixed-point floor residue
    assert(math.abs(r(2L)) <= 2L && math.abs(r(3L)) <= 2L)
  }

  override def afterAll(): Unit = spark.stop()
}
