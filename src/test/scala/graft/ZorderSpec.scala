package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Zorder

/** Specs for [[graft.io.Zorder]]: the Morton interleave must match a
  * bit-twiddling reference, and the LAYOUT must actually buy 2-D file
  * skipping — the point of Z-ordering — measured from per-file min/max
  * stats exactly as a footer-pruning reader would.
  */
class ZorderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-zorder")
  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_zorder_").toString

  /** Reference Morton interleave, bit by bit. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until Zorder.Bits).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zvalue equals the bit-by-bit Morton reference") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (1L << 15, 1L), (43690L, 21845L))
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"), Zorder.zvalue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"zvalue($x, $y) = $z != ${mortonRef(x, y)}")
    }
  }

  test("z-ordered layout prunes files on BOTH dimensions; " +
      "single-key layout only on its own") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    // 64k uniform points on a 256x256 grid
    val pts = (0 until 65536).map(i => ((i % 256).toLong, (i / 256).toLong))
    val df = pts.toDF("a", "b")
    val nFiles = 16
    val zDir = tmp() + "/z"
    val aDir = tmp() + "/a"
    Zorder.zorderBy(df, "a", 0L, 255L, "b", 0L, 255L, nFiles)
      .write.parquet(zDir)
    df.repartitionByRange(nFiles, col("a")).sortWithinPartitions("a")
      .write.parquet(aDir)
    // files whose [min,max] overlaps a narrow predicate = files a
    // footer-pruning reader opens
    def overlapping(dir: String, c: String, lo: Long, hi: Long): Long =
      Zorder.fileStats(spark.read.parquet(dir), c)
        .filter(!(col("vmax") < lo || col("vmin") > hi))
        .count()
    val zA = overlapping(zDir, "a", 100L, 107L)
    val zB = overlapping(zDir, "b", 100L, 107L)
    val aA = overlapping(aDir, "a", 100L, 107L)
    val aB = overlapping(aDir, "b", 100L, 107L)
    // the a-sorted layout is perfect on a, blind on b
    assert(aA <= 2, s"a-sorted layout must prune on a, opened $aA/$nFiles")
    assert(aB == nFiles, s"a-sorted layout cannot prune on b ($aB/$nFiles)")
    // the z-ordered layout prunes meaningfully on BOTH
    assert(zA <= nFiles / 2,
      s"z-order must prune on a: opened $zA/$nFiles files")
    assert(zB <= nFiles / 2,
      s"z-order must prune on b: opened $zB/$nFiles files")
    // and content survives the reshuffle
    assert(spark.read.parquet(zDir).count() == 65536L)
  }

  test("writeZTable + readZRange: manifest z-table prunes files on " +
      "either dimension and returns exact rows") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val pts = (0 until 65536).map(i => ((i % 256).toLong, (i / 256).toLong))
    val df = pts.toDF("a", "b")
    val dir = tmp() + "/ztable"
    Zorder.writeZTable(spark, df, dir, "a", 0L, 255L, "b", 0L, 255L,
      nFiles = 16)
    val nLive = io.Sinks.manifestAt(spark, dir).count()
    assert(nLive >= 8, s"expected a multi-file table, got $nLive")
    def check(c: String): Unit = {
      val got = Zorder.readZRange(spark, dir, "a", "b", c, 100L, 107L)
      assert(got.inputFiles.length <= nLive / 2,
        s"$c-range read must prune: opened ${got.inputFiles.length}/$nLive")
      val expect = df.filter(col(c) >= 100L && col(c) <= 107L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rows = got.select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === expect, s"$c-range rows wrong: ${rows.size} vs ${expect.size}")
    }
    check("a")
    check("b")
    // an ordinary readVersioned still sees the whole table (manifest
    // compatibility of the preclustered write)
    assert(io.Sinks.readVersioned(spark, dir).count() === 65536L)
  }

  override def afterAll(): Unit = spark.stop()
}
