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

  /** Reference N-ary interleave, bit by bit. */
  private def interleaveRef(xs: Seq[Long], bits: Int): Long = {
    val n = xs.size
    xs.zipWithIndex.foldLeft(0L) { case (acc, (x, d)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a | ((x >> i) & 1L) << (i * n + d)
      }
    }
  }

  test("zvalueN: n=2 @16 bits is bit-identical to the Morton fast path; " +
      "generic n=2/n=3 match the bit-by-bit reference") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val samples = Seq((0L, 0L, 0L), (1L, 2L, 3L), (255L, 0L, 255L),
      (65535L, 65535L, 2047L), (12345L, 54321L, 999L), (170L, 85L, 204L))
    val got = samples.toDF("x", "y", "w")
      .select(
        Zorder.zvalueN(Seq(col("x"), col("y")), 16).as("z2"),
        Zorder.zvalue(col("x"), col("y")).as("zm"),
        Zorder.zvalueN(Seq(col("x"), col("y"), col("w")), 11).as("z3"),
        col("x"), col("y"), col("w"))
      .collect()
    got.foreach { r =>
      val (z2, zm, z3) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (x, y, w) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(z2 == zm, s"n=2 fast-path divergence at ($x, $y)")
      assert(z2 == interleaveRef(Seq(x, y), 16), s"n=2 ref at ($x, $y)")
      assert(z3 == interleaveRef(Seq(x & 2047, y & 2047, w & 2047), 11),
        s"n=3 ref at ($x, $y, $w): $z3")
    }
    assert(Zorder.bitsFor(2) == 16 && Zorder.bitsFor(3) == 11 &&
      Zorder.bitsFor(4) == 8)
  }

  test("3-D z-table: readVersionedColRange prunes files on EVERY " +
      "dimension and returns exact rows") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    // 32^3 uniform points on a 3-D grid
    val pts = for (i <- 0 until 32768) yield
      ((i % 32).toLong, ((i / 32) % 32).toLong, (i / 1024).toLong)
    val df = pts.toDF("a", "b", "c")
    val dir = tmp() + "/z3"
    Zorder.writeZTableDims(spark, df, dir,
      Seq(("a", 0L, 31L), ("b", 0L, 31L), ("c", 0L, 31L)), nFiles = 16)
    val nLive = io.Sinks.manifestAt(spark, dir).count()
    assert(nLive >= 8, s"expected a multi-file table, got $nLive")
    for (cName <- Seq("a", "b", "c")) {
      val got = io.Sinks.readVersionedColRange(spark, dir, cName, 4L, 7L)
      assert(got.inputFiles.length < nLive,
        s"$cName-range must prune: opened ${got.inputFiles.length}/$nLive")
      val expect = df.filter(col(cName) >= 4L && col(cName) <= 7L).count()
      assert(got.count() == expect, s"$cName-range row count")
    }
    // no sidecar coverage → loud failure, not a silent full scan
    val err = intercept[IllegalArgumentException] {
      io.Sinks.readVersionedColRange(spark, dir, "nope", 0L, 1L)
    }
    assert(err.getMessage.contains("no z-stats sidecar"))
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

  test("readZRange honors deletion vectors: DV deletes and merge-on-read " +
      "updates are reflected on both dimensions") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val pts = (0 until 65536).map(i => ((i % 256).toLong, (i / 256).toLong))
    val df = pts.toDF("a", "b")
    val dir = tmp() + "/zdv"
    Zorder.writeZTable(spark, df, dir, "a", 0L, 255L, "b", 0L, 255L,
      nFiles = 16)
    // DV DELETE of key a=100, then merge-on-read UPSERT of key a=101
    // (replaces its 256 grid rows with one new row) — both land through
    // the normal manifest/DV paths, no re-cluster
    io.Sinks.deleteByKeyDv(spark, Seq(100L).toDF("a"), dir, "a")
    io.Sinks.upsertByKeyDv(spark, Seq((101L, 999L)).toDF("a", "b"),
      dir, "a")
    // the DV-aware blessed reader is the oracle for both dimensions
    def viaVersioned(c: String, lo: Long, hi: Long) =
      io.Sinks.readVersioned(spark, dir)
        .filter(col(c) >= lo && col(c) <= hi)
        .select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def viaZ(c: String, lo: Long, hi: Long) =
      Zorder.readZRange(spark, dir, "a", "b", c, lo, hi)
        .select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotA = viaZ("a", 100L, 107L)
    assert(gotA === viaVersioned("a", 100L, 107L),
      "a-range read must match the DV-aware readVersioned")
    assert(!gotA.exists(_._1 == 100L), "DV-deleted key a=100 leaked")
    assert(gotA.count(_._1 == 101L) == 1 && gotA.contains((101L, 999L)),
      s"upserted key a=101 must surface ONLY its new row: " +
        gotA.filter(_._1 == 101L).take(5))
    // the b dimension still prunes AND still applies DVs (the upsert's
    // b=999 row is outside the old b domain — unskippable newcomer file)
    val gotB = viaZ("b", 100L, 107L)
    assert(gotB === viaVersioned("b", 100L, 107L),
      "b-range read must match the DV-aware readVersioned")
    assert(!gotB.exists(_._1 == 100L), "DV-deleted key a=100 leaked via b")
  }

  test("optimizeZTable incrementally re-clusters ONLY unskippable files: " +
      "appended + DV'd files regain sidecar pruning, rows are unchanged, " +
      "and the change feed is empty across the optimize commit") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val pts = (0 until 65536).map(i => ((i % 256).toLong, (i / 256).toLong))
    val df = pts.toDF("a", "b")
    val dir = tmp() + "/zopt"
    val dims = Seq(("a", 0L, 271L), ("b", 0L, 255L))
    Zorder.writeZTableDims(spark, df, dir, dims, nFiles = 16)
    // Post-write churn through the NORMAL paths: an append of fresh keys
    // (a in 256..271, all b values — 4 sidecar-less files) and a DV
    // delete of key a=100 (shades one clustered file).
    val appended = (0 until 4096).map(i => (256L + i % 16, (i / 16).toLong))
    io.Sinks.appendWithManifest(spark, appended.toDF("a", "b"), dir, "a",
      nFiles = 4)
    io.Sinks.deleteByKeyDv(spark, Seq(100L).toDF("a"), dir, "a")
    def allRows() = io.Sinks.readVersioned(spark, dir).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = allRows()
    val vBefore = io.Sinks.currentVersion(dir)
    val openedBefore = io.Sinks
      .readVersionedColRange(spark, dir, "b", 100L, 107L).inputFiles.length
    // The incremental pass must rewrite exactly the unskippable set:
    // the 4 appended (sidecar-less) files plus every DV'd file — a key
    // slice crosses MANY z-rectangles, so the a=100 delete shades
    // several files — and nothing else.
    val entriesBefore = io.Sinks.manifestAt(spark, dir).collect()
    val nLiveBefore = entriesBefore.length.toLong
    val coveredBefore = spark.read.parquet(dir + "/_zstats")
      .select("file").collect().map(_.getString(0)).toSet
    val expectRewrite = entriesBefore.count(r =>
      r.getAs[String]("dv_file") != null ||
        !coveredBefore(r.getAs[String]("file")))
    val n = io.Sinks.optimizeZTable(spark, dir, dims, nFiles = 2)
    assert(n == expectRewrite,
      s"expected the $expectRewrite unskippable files rewritten, got $n")
    assert(n < nLiveBefore, "incremental pass must not rewrite the table")
    // content byte-identical (DV folded, layout-only commit)
    assert(allRows() === before, "optimize changed rows")
    // every live file is sidecar-covered again → the b predicate skips
    // where it previously had to read every appended file
    val live = io.Sinks.manifestAt(spark, dir)
      .select("file").collect().map(_.getString(0)).toSet
    val sidecar = spark.read.parquet(dir + "/_zstats")
      .select("file").collect().map(_.getString(0)).toSet
    assert(live.subsetOf(sidecar),
      s"uncovered live files after optimize: ${(live -- sidecar).take(3)}")
    val prunedRead = io.Sinks
      .readVersionedColRange(spark, dir, "b", 100L, 107L)
    assert(prunedRead.inputFiles.length < openedBefore,
      s"b-range must skip more after optimize: " +
        s"${prunedRead.inputFiles.length} vs $openedBefore")
    val expect = before.filter(p => p._2 >= 100L && p._2 <= 107L)
    assert(prunedRead.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === expect)
    // CDF: the optimize commit is maintenance-only — empty change feed
    assert(io.Sinks.readChanges(spark, dir, vBefore).count() === 0L)
    // idempotent: a second pass finds nothing unskippable
    assert(io.Sinks.optimizeZTable(spark, dir, dims, nFiles = 2) === 0)
  }

  override def afterAll(): Unit = spark.stop()
}
