package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Medallion
import graft.io.{Sinks, Sources}
import graft.silver.Star

/** End-to-end medallion specs: CSV bronze ingest, task runner + logs,
  * partitioned sink with retry, keyed upsert, star build RI checks. */
class MedallionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-medallion-test")
  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String =
    Files.createTempDirectory("graft_test_").toString

  test("S1: schema-enforced CSV read round-trips") {
    val dir = tmp()
    import org.apache.spark.sql.types._
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name,score\n1,a,1.5\n2,b,\n")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val df = Sources.readCsv(spark, s"$dir/data.csv", schema)
    assert(df.schema == schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2 && rows(1).isNullAt(2), "empty cell → null")
  }

  test("S-ext: corrupt CSV rows quarantine; clean rows flow on") {
    val dir = tmp()
    import org.apache.spark.sql.types._
    // row 2: non-numeric id (cast failure); row 3: clean; row 4: extra field
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name,score\n1,a,1.5\nnope,b,2.0\n3,c,3.5\n4,d,4.0,EXTRA\n")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val (clean, bad) =
      Sources.splitQuarantine(Sources.readCsvQuarantine(spark, s"$dir/data.csv", schema))
    assert(clean.schema == schema)
    assert(clean.orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(1, 3))
    val quarantined = bad.collect().map(_.getAs[String]("_corrupt_record"))
    assert(quarantined.length == 2 &&
      quarantined.exists(_.startsWith("nope")) &&
      quarantined.exists(_.endsWith("EXTRA")),
      s"expected the two malformed raw lines, got ${quarantined.toSeq}")
  }

  test("S-ext: schema-enforced JSON-lines read round-trips with nulls") {
    val dir = tmp()
    import org.apache.spark.sql.types._
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.jsonl"),
      """{"id":1,"name":"a","score":1.5}
        |{"id":2,"name":"b"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val df = Sources.readJson(spark, s"$dir/data.jsonl", schema)
    assert(df.schema == schema)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2 && rows(1).isNullAt(2), "missing field → null")
  }

  test("S4: dateDim generates correct span with ISO day-of-week") {
    val dd = Sources.dateDim(spark, "2024-02-27", "2024-03-02")
    assert(dd.count() == 5)
    val leap = dd.filter(col("full_date") === "2024-02-29").collect()(0)
    assert(leap.getAs[Int]("date_sk") == 20240229)
    assert(leap.getAs[Int]("day_of_week") == 4) // 2024-02-29 is a Thursday
    assert(!leap.getAs[Boolean]("is_weekend"))
  }

  test("S6: partitioned sink writes partition dirs; retry surfaces failure") {
    val dir = tmp() + "/part_out"
    val df = Tables.orders(spark, sf)
      .withColumn("status", col("o_orderstatus"))
    Sinks.savePartitioned(df, dir, Seq("status"), mode = "overwrite")
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("status="))
    assert(dirs.nonEmpty, s"expected partition dirs, got ${dirs.toSeq}")
    // unwritable target → retries exhausted → original exception surfaces
    intercept[Throwable] {
      Sinks.savePartitioned(df, "/proc/nope", Seq("status"),
        retries = 2, retryDelayMs = 1)
    }
  }

  test("S11: upsertByKey inserts new keys and updates existing") {
    import spark.implicits._
    val dir = tmp() + "/upsert_target"
    Sinks.upsertByKey(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    Sinks.upsertByKey(spark,
      Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), dir, Seq("k"))
    val out = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "B2"), (3L, "c")))
  }

  test("S11: partition-scoped upsert rewrites only touched partitions") {
    import spark.implicits._
    val dir = tmp() + "/upsert_part"
    // keys = (dt, k): dt is the partition column AND part of the merge key,
    // so a key's row can only live in one partition (the contract).
    Sinks.upsertByKeyPartitioned(spark,
      Seq(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
          ("2024-01-02", 3L, "c")).toDF("dt", "k", "v"),
      dir, Seq("dt", "k"), "dt")
    def partFiles(p: String): Map[String, Long] = {
      val d = new java.io.File(s"$dir/dt=$p")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = partFiles("2024-01-01")
    val beforeBytes = before.keys.map(f =>
      f -> Files.readAllBytes(java.nio.file.Paths.get(s"$dir/dt=2024-01-01/$f")).toSeq).toMap
    // update touches only 2024-01-02 (+ inserts 2024-01-03)
    Sinks.upsertByKeyPartitioned(spark,
      Seq(("2024-01-02", 3L, "C2"), ("2024-01-03", 4L, "d")).toDF("dt", "k", "v"),
      dir, Seq("dt", "k"), "dt")
    val after = partFiles("2024-01-01")
    assert(after == before, "untouched partition files must not be rewritten")
    after.keys.foreach { f =>
      assert(Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/dt=2024-01-01/$f")).toSeq == beforeBytes(f),
        s"untouched partition file $f must stay byte-identical")
    }
    // partition-dir values are type-inferred (dt comes back as DATE) —
    // compare via toString
    val out = spark.read.parquet(dir).orderBy("k")
      .collect().map(r => (String.valueOf(r.getAs[Any]("dt")),
        r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq
    assert(out == Seq(("2024-01-01", 1L, "a"), ("2024-01-01", 2L, "b"),
      ("2024-01-02", 3L, "C2"), ("2024-01-03", 4L, "d")))
    // partition col not in keys → rejected (a matched key could live
    // outside the rewritten partitions)
    intercept[IllegalArgumentException] {
      Sinks.upsertByKeyPartitioned(spark,
        Seq(("2024-01-02", 3L, "x")).toDF("dt", "k", "v"), dir, Seq("k"), "dt")
    }
  }

  test("S11: manifest merge rewrites only hit files; versions time-travel; vacuum GCs") {
    import spark.implicits._
    val dir = tmp() + "/upsert_manifest"
    // 1000 keys range-partitioned into 8 files with disjoint key ranges;
    // the merge key is NOT a partition column — this is the non-partition-
    // aligned MERGE the partition-scoped path cannot serve.
    val v1Rows = (0L until 1000L).map(k => (k, s"v$k"))
    Sinks.writeWithManifest(spark, v1Rows.toDF("k", "v"), dir, "k", nFiles = 8)
    def files(): Map[String, Seq[Byte]] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    // live file set of a version, through the public chain-fold API
    // (version dirs now hold add/remove DELTAS, not full listings)
    def manifestFiles(v: Long): Set[String] =
      Sinks.manifestAt(spark, dir, v)
        .select("file").collect().map(_.getString(0)).toSet
    val before = files()
    assert(before.size == 8, s"expected 8 data files, got ${before.size}")
    assert(Sinks.currentVersion(dir) == 1L)
    // updates hit a narrow key range (+ one brand-new key well outside)
    Sinks.upsertByKeyManifest(spark,
      Seq((100L, "U100"), (101L, "U101"), (5000L, "NEW")).toDF("k", "v"), dir, "k")
    assert(Sinks.currentVersion(dir) == 2L)
    // v2 must REUSE at least 6 of v1's files (data skipping), and every
    // v1 file is still on disk byte-identical (immutability = time travel)
    val reused = manifestFiles(1L).intersect(manifestFiles(2L))
    assert(reused.size >= 6, s"merge must reuse unhit files; reused only $reused")
    val after = files()
    before.foreach { case (f, bytes) =>
      assert(after(f) == bytes, s"immutable file $f changed") }
    // current read equals the full-merge oracle…
    val out = Sinks.readVersioned(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val oracle = (v1Rows.filterNot(r => Set(100L, 101L)(r._1)) ++
      Seq((100L, "U100"), (101L, "U101"), (5000L, "NEW"))).sortBy(_._1)
    assert(out == oracle)
    // …while version 1 still reads as the ORIGINAL table (time travel)
    val v1Read = Sinks.readVersioned(spark, dir, version = 1L).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v1Read == v1Rows.sortBy(_._1))
    // O(merge footprint) commit: the v2 version dir holds only the
    // DELTA (adds for rewritten files + removes for hit files), never
    // the full live listing
    val v2delta = spark.read.parquet(s"$dir/_manifest/v=2")
    assert(v2delta.select("action").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("add", "remove")))
    assert(v2delta.count() < manifestFiles(2L).size,
      s"commit must write a delta, not the ${manifestFiles(2L).size}-file listing")
    // the spliced manifest's ranges match the live files exactly
    Sinks.manifestAt(spark, dir, 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .foreach { case (f, kmin, kmax) =>
        val actual = spark.read.parquet(s"$dir/$f").agg(
          org.apache.spark.sql.functions.min("k"),
          org.apache.spark.sql.functions.max("k")).collect()(0)
        assert(actual.getLong(0) == kmin && actual.getLong(1) == kmax,
          s"manifest range for $f is stale")
      }
    // a merge with only out-of-range keys reuses EVERY current file
    Sinks.upsertByKeyManifest(spark, Seq((9000L, "N2")).toDF("k", "v"), dir, "k")
    assert(manifestFiles(2L).subsetOf(manifestFiles(3L)),
      "a no-match merge must reuse every current file")
    // key-range read: the manifest prunes files BEFORE the scan (the
    // SELECT-side benefit of the same min/max stats the merge uses)
    val ranged = Sinks.readVersionedKeyRange(spark, dir, "k", 100L, 120L)
    assert(ranged.inputFiles.length < files().size,
      s"range read must open fewer files (${ranged.inputFiles.length} of ${files().size})")
    val rangedRows = ranged.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rangedRows == ((102L to 120L).map(k => (k, s"v$k")) ++
      Seq((100L, "U100"), (101L, "U101"))).sortBy(_._1))
    // schema-evolving merge (v4): a new column arrives with the updates;
    // untouched files are NOT rewritten and read back with w = null
    Sinks.upsertByKeyManifest(spark,
      Seq((100L, "U100e", 7L), (103L, "U103e", 8L)).toDF("k", "v", "w"),
      dir, "k", allowSchemaEvolution = true)
    val evolved = Sinks.readVersioned(spark, dir)
    assert(evolved.columns.toSet == Set("k", "v", "w"))
    val byK = evolved.filter(col("k").isin(100L, 103L, 5000L)).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    assert(byK == Seq((100L, "U100e", 7L), (103L, "U103e", 8L),
      (5000L, "NEW", null)), s"evolved read wrong: $byK")
    // …while the strict default still rejects a genuinely NEW column
    intercept[IllegalArgumentException] {
      Sinks.upsertByKeyManifest(spark,
        Seq((1L, "x", 1L)).toDF("k", "v", "w2"), dir, "k")
    }
    // v5: a PLAIN merge (no evolution flag) touching an old+evolved file
    // mix — 101 sits beside the evolved rows, 900 in a pre-evolution
    // file. The touched-file re-read must mergeSchema across the mix:
    // unmatched evolved rows keep their w values (no silent column drop),
    // and `updates` lacking an already-committed column is fine.
    Sinks.upsertByKeyManifest(spark,
      Seq((101L, "U101f"), (900L, "U900")).toDF("k", "v"), dir, "k")
    val afterMix = Sinks.readVersioned(spark, dir)
      .filter(col("k").isin(100L, 101L, 103L, 900L)).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getAs[String]("v"),
        if (r.isNullAt(r.fieldIndex("w"))) null else r.getAs[Long]("w"))).toSeq
    assert(afterMix == Seq((100L, "U100e", 7L), (101L, "U101f", null),
      (103L, "U103e", 8L), (900L, "U900", null)),
      s"mixed-schema merge lost evolved values: $afterMix")
    // vacuum(keep=1): only v5's files survive; the evolved table stays
    // readable (mergeSchema) with the same content
    Sinks.vacuum(spark, dir, keepVersions = 1)
    assert(files().keySet == manifestFiles(5L),
      "vacuum must delete exactly the unreferenced files")
    assert(!new java.io.File(s"$dir/_manifest/v=1").exists())
    val plain = Sinks.readVersioned(spark, dir).select("k", "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(plain == ((oracle.filterNot(r => Set(100L, 101L, 103L, 900L)(r._1)) :+
      (100L, "U100e") :+ (101L, "U101f") :+ (103L, "U103e") :+
      (900L, "U900") :+ (9000L, "N2")).sortBy(_._1)))
  }

  test("S11 manifest: readChanges is the minimal insert/delete diff (CDF)") {
    import spark.implicits._
    val dir = tmp() + "/cdf_manifest"
    Sinks.writeWithManifest(spark,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", nFiles = 4)
    // v2: update 2 keys in one file's range + insert a new key
    Sinks.upsertByKeyManifest(spark,
      Seq((10L, "U10"), (11L, "U11"), (9000L, "NEW")).toDF("k", "v"), dir, "k")
    val ch = Sinks.readChanges(spark, dir, 1L).orderBy("k", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // the merge REWROTE a whole ~100-row file, but unchanged rewritten
    // rows must cancel: the CDF is exactly the 3 inserts + 2 deletes
    assert(ch == Seq(
      (10L, "v10", "delete"), (10L, "U10", "insert"),
      (11L, "v11", "delete"), (11L, "U11", "insert"),
      (9000L, "NEW", "insert")).sortBy(t => (t._1, t._3)),
      s"CDF not minimal: $ch")
    // v3: another disjoint update; ranges compose (1→3 sees both) and
    // a same-version range is empty
    Sinks.upsertByKeyManifest(spark, Seq((200L, "U200")).toDF("k", "v"), dir, "k")
    val full = Sinks.readChanges(spark, dir, 1L, 3L)
    assert(full.count() == 7)
    assert(Sinks.readChanges(spark, dir, 3L, 3L).count() == 0)
    // delete+insert of the same key across versions keeps BOTH rows
    // (update = delete old + insert new, the Delta CDF contract)
    val k200 = full.filter(col("k") === 200L)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(k200 == Set(("v200", "delete"), ("U200", "insert")))
    // v4 evolves the schema: the CDF over the evolving range aligns on
    // the union schema — pre-evolution delete rows surface the new
    // column as null, the insert carries its value
    Sinks.upsertByKeyManifest(spark,
      Seq((200L, "U200e", 9L)).toDF("k", "v", "w"), dir, "k",
      allowSchemaEvolution = true)
    val ev = Sinks.readChanges(spark, dir, 3L, 4L).filter(col("k") === 200L)
      .collect().map(r => (r.getString(1),
        if (r.isNullAt(r.fieldIndex("w"))) null else r.getAs[Long]("w"),
        r.getAs[String]("_change_type"))).toSet
    assert(ev == Set(("U200", null, "delete"), ("U200e", 9L, "insert")),
      s"evolving CDF misaligned: $ev")
  }

  test("S11 manifest: OPTIMIZE bin-packs small files; reads identical; " +
      "CDF skips the maintenance range; vacuum reclaims the packed-away files") {
    import spark.implicits._
    val dir = tmp() + "/optimize_manifest"
    Sinks.writeWithManifest(spark,
      (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", nFiles = 4)
    // three incremental appends → 6 more small files (the small-files
    // problem OPTIMIZE exists for)
    (0 until 3).foreach(i =>
      Sinks.appendWithManifest(spark,
        (1000L + i * 10 until 1010L + i * 10).map(k => (k, s"a$k")).toDF("k", "v"),
        dir, "k", nFiles = 2))
    val vPre = Sinks.currentVersion(dir)
    assert(vPre == 4L)
    def live(v: Long): Set[String] =
      Sinks.manifestAt(spark, dir, v).select("file")
        .collect().map(_.getString(0)).toSet
    val filesPre = live(vPre)
    assert(filesPre.size == 10)
    val contentPre = Sinks.readVersioned(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    // bin-pack everything (targetRows far above any file) into ONE file
    val packed = Sinks.optimizeTable(spark, dir, "k", targetRows = 100000L)
    assert(packed == 10, s"expected all 10 small files packed, got $packed")
    assert(Sinks.currentVersion(dir) == vPre + 1)
    val filesPost = live(vPre + 1)
    assert(filesPost.size == 1 && filesPost.intersect(filesPre).isEmpty,
      s"expected one fresh packed file, got $filesPost")
    // content is bit-identical across the rewrite
    val contentPost = Sinks.readVersioned(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(contentPost == contentPre)
    // ... and time travel to the pre-optimize version still reads the
    // old layout
    assert(Sinks.readVersioned(spark, dir, vPre).count() == 230L)
    // CDF: the optimize-only range is EMPTY (data_change=false commit),
    // resolved from manifest metadata alone; a range spanning the last
    // append + the optimize surfaces exactly that append's rows
    assert(Sinks.readChanges(spark, dir, vPre, vPre + 1).isEmpty)
    val spanning = Sinks.readChanges(spark, dir, vPre - 1, vPre + 1)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(spanning.size == 10 && spanning.forall(_._2 == "insert") &&
      spanning.map(_._1).sorted == (1020L until 1030L).toSeq,
      s"spanning CDF wrong: $spanning")
    // a second optimize is a no-op (single live file ≥ nothing to pack)
    assert(Sinks.optimizeTable(spark, dir, "k", targetRows = 100000L) == 0)
    assert(Sinks.currentVersion(dir) == vPre + 1)
    // vacuum to the optimized head reclaims all 10 packed-away files
    Sinks.vacuum(spark, dir, keepVersions = 1)
    val onDisk = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(onDisk == filesPost, s"vacuum left orphans: ${onDisk -- filesPost}")
    val contentFinal = Sinks.readVersioned(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(contentFinal == contentPre)
  }

  test("S11-DV: merge-on-read upsert ≡ eager merge; OPTIMIZE folds DVs; " +
      "update cost ∝ update size") {
    import spark.implicits._
    val dirDv = tmp() + "/dv_table"
    val dirEager = tmp() + "/eager_table"
    val v1Rows = (0L until 1000L).map(k => (k, s"v$k"))
    Sinks.writeWithManifest(spark, v1Rows.toDF("k", "v"), dirDv, "k", nFiles = 8)
    Sinks.writeWithManifest(spark, v1Rows.toDF("k", "v"), dirEager, "k", nFiles = 8)
    def bytes(dir: String): Map[String, Long] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length()).toMap
    val dvBefore = bytes(dirDv)
    // the same small update (2 in-range updates + 1 insert) both ways
    val upd = Seq((100L, "U100"), (101L, "U101"), (5000L, "NEW")).toDF("k", "v")
    Sinks.upsertByKeyDv(spark, upd, dirDv, "k", nFiles = 1)
    Sinks.upsertByKeyManifest(spark, upd, dirEager, "k")
    def content(dir: String): Seq[(Long, String)] =
      Sinks.readVersioned(spark, dir).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dvOut = content(dirDv)
    assert(dvOut == content(dirEager),
      "merge-on-read rows must equal the eager merge's")
    assert(dvOut.count(_._1 == 100L) == 1 && dvOut.exists(_ == (100L, "U100"))
      && dvOut.exists(_ == (5000L, "NEW")) && dvOut.size == 1001,
      s"updated+inserted rows wrong: ${dvOut.filter(t => t._1 >= 100 && t._1 <= 101)}")
    // cost ∝ update size: every pre-existing data file is UNTOUCHED
    // (byte-length identical, still live) — only new small files appear
    val dvAfter = bytes(dirDv)
    dvBefore.foreach { case (f, len) =>
      assert(dvAfter.get(f).contains(len), s"DV path rewrote old file $f") }
    val newFiles = dvAfter.keySet -- dvBefore.keySet
    assert(newFiles.nonEmpty &&
      newFiles.map(dvAfter).sum < dvBefore.values.sum / 2,
      s"new files must be small vs the 1000-row footprint: $newFiles")
    // the read path resolves only add/dv manifest entries: the touched
    // file carries a dv_file pointer, untouched files carry none
    val m = Sinks.manifestAt(spark, dirDv)
      .select("file", "dv_file").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(m.count(_._2.nonEmpty) >= 1, "touched file must carry a DV")
    assert(m.count(_._2.isEmpty) >= 8, "untouched files must carry no DV")
    // second DV update on the SAME key: cumulative DV, still one live row
    Sinks.upsertByKeyDv(spark, Seq((100L, "U100b")).toDF("k", "v"),
      dirDv, "k", nFiles = 1)
    val out2 = content(dirDv)
    assert(out2.count(_._1 == 100L) == 1 && out2.exists(_ == (100L, "U100b")),
      "second DV update must supersede both prior versions of the key")
    // DELETE via DV only: no data file written
    Sinks.deleteByKeyDv(spark, Seq(101L).toDF("k"), dirDv, "k")
    val out3 = content(dirDv)
    assert(!out3.exists(_._1 == 101L) && out3.size == 1000,
      "DV delete must remove the key")
    // CDF across the delete commit: exactly one delete row, no inserts
    val cdf = Sinks.readChanges(spark, dirDv,
        fromVersion = Sinks.currentVersion(dirDv) - 1)
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(cdf == Seq((101L, "delete")), s"CDF across DV delete: $cdf")
    // OPTIMIZE folds the DVs: reads identical, and NO live file carries
    // a dv pointer afterwards (Delta REORG/PURGE semantics)
    val folded = Sinks.optimizeTable(spark, dirDv, "k", targetRows = 100000L)
    assert(folded > 0, "optimize must rewrite the dv-carrying files")
    assert(content(dirDv) == out3, "OPTIMIZE must not change rows")
    val mPost = Sinks.manifestAt(spark, dirDv).select("dv_file").collect()
    assert(mPost.forall(_.isNullAt(0)), "all DVs must be folded away")
    // eager merge AFTER a DV history must still agree end-to-end
    Sinks.upsertByKeyManifest(spark, Seq((0L, "Z")).toDF("k", "v"), dirDv, "k")
    assert(content(dirDv).take(1) == Seq((0L, "Z")))
    // vacuum reclaims superseded DV parquets once old versions drop
    Sinks.vacuum(spark, dirDv, keepVersions = 1)
    val dvDirF = new java.io.File(dirDv + "/_dv")
    assert(!dvDirF.exists() || dvDirF.listFiles()
      .count(_.getName.endsWith(".parquet")) == 0,
      "no version references a DV after folding — vacuum must reclaim them")
    assert(content(dirDv).size == 1000)
  }

  test("S11-DV: eager merge on a DV-carrying file does not resurrect rows") {
    import spark.implicits._
    val dir = tmp() + "/dv_eager_mix"
    Sinks.writeWithManifest(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", nFiles = 2)
    // DV-delete key 10, then EAGER-merge key 11 (same file's range):
    // the eager rewrite must apply the DV, not resurrect key 10
    Sinks.deleteByKeyDv(spark, Seq(10L).toDF("k"), dir, "k")
    Sinks.upsertByKeyManifest(spark, Seq((11L, "U11")).toDF("k", "v"), dir, "k")
    val out = Sinks.readVersioned(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(!out.exists(_._1 == 10L), "eager merge resurrected a DV'd row")
    assert(out.exists(_ == (11L, "U11")) && out.size == 99)
  }

  test("S11 manifest: time travel to a vacuumed version fails loudly") {
    import spark.implicits._
    val dir = tmp() + "/vacuumed_read"
    Sinks.writeWithManifest(spark,
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", nFiles = 4)
    Sinks.upsertByKeyManifest(spark, Seq((5L, "U5")).toDF("k", "v"), dir, "k")
    Sinks.upsertByKeyManifest(spark, Seq((6L, "U6")).toDF("k", "v"), dir, "k")
    assert(Sinks.currentVersion(dir) == 3L)
    Sinks.vacuum(spark, dir, keepVersions = 1)
    // v1/v2's commit markers and unreferenced files are gone: resolving
    // them must fail LOUDLY at the manifest require — a reader must
    // never fall through to a partial/wrong file list (the documented
    // retention contract: vacuum trades time travel for space).
    val e1 = intercept[IllegalArgumentException] {
      Sinks.readVersioned(spark, dir, version = 1L)
    }
    assert(e1.getMessage.contains("not committed (or was vacuumed)"),
      s"wrong failure mode: ${e1.getMessage}")
    intercept[IllegalArgumentException] { Sinks.manifestAt(spark, dir, 2L) }
    intercept[IllegalArgumentException] {
      Sinks.readVersionedKeyRange(spark, dir, "k", 0L, 10L, version = 2L)
    }
    // …while the retained version still reads complete and exact
    val out = Sinks.readVersioned(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val oracle = ((0L until 100L).filterNot(Set(5L, 6L))
      .map(k => (k, s"v$k")) ++ Seq((5L, "U5"), (6L, "U6"))).sortBy(_._1)
    assert(out == oracle)
  }

  test("S11 manifest: concurrent merges both land — no silent lost update") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val dir = tmp() + "/concurrent_manifest"
    Sinks.writeWithManifest(spark,
      (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", nFiles = 4)
    // 5 rounds of two overlapping writers on disjoint keys: every commit
    // is an atomic version-dir rename, so losers rebase and retry — all
    // 10 updates must land regardless of interleaving.
    (1 to 5).foreach { i =>
      val a = Future(Sinks.upsertByKeyManifest(spark,
        Seq((i * 10L, s"A$i")).toDF("k", "v"), dir, "k"))
      val b = Future(Sinks.upsertByKeyManifest(spark,
        Seq((100L + i * 10L, s"B$i")).toDF("k", "v"), dir, "k"))
      Await.result(a, 300.seconds)
      Await.result(b, 300.seconds)
    }
    assert(Sinks.currentVersion(dir) == 11L,
      s"expected 11 serialized versions, got ${Sinks.currentVersion(dir)}")
    val got = Sinks.readVersioned(spark, dir)
      .filter((col("k") % 10 === 0) && col("k") < 200)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = (0L until 200L by 10L).map { k =>
      if (k >= 10 && k <= 50) (k, s"A${k / 10}")
      else if (k >= 110 && k <= 150) (k, s"B${(k - 100) / 10}")
      else (k, s"v$k")
    }
    assert(got == want, s"lost update detected: $got")
  }

  test("manifest checkpoint: byte-identical reads before/after compaction") {
    import spark.implicits._
    val dir = tmp() + "/ckpt_manifest"
    Sinks.writeWithManifest(spark,
      (0L until 500L).map(k => (k, s"v$k")).toDF("k", "v"), dir, "k", nFiles = 4)
    // auto-compaction every 3 commits: merges land ckpts at v4 and v7
    (1 to 6).foreach(i => Sinks.upsertByKeyManifest(spark,
      Seq((i * 10L, s"u$i")).toDF("k", "v"), dir, "k", compactEvery = 3))
    // chain lengths: v1-v3 = 3 ≥ 3 → ckpt=3; v4-v6 above it → ckpt=6
    assert(new java.io.File(s"$dir/_manifest/ckpt=3").exists() &&
      new java.io.File(s"$dir/_manifest/ckpt=6").exists(),
      "auto-compaction must fold the chain every compactEvery commits")
    val before = Sinks.readVersioned(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val beforeFiles = Sinks.readVersioned(spark, dir).inputFiles.sorted.toSeq
    Sinks.compactManifest(spark, dir)
    assert(new java.io.File(s"$dir/_manifest/ckpt=7").exists())
    Sinks.compactManifest(spark, dir) // idempotent
    // byte-identical read: same files opened, same rows out
    assert(Sinks.readVersioned(spark, dir).inputFiles.sorted.toSeq == beforeFiles,
      "compaction must not change which files a read opens")
    val after = Sinks.readVersioned(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == before, "compaction must not change read content")
    // time travel across the checkpoint boundary still resolves
    val v1 = Sinks.readVersioned(spark, dir, version = 1L).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v1 == (0L until 500L).map(k => (k, s"v$k")))
    // merges after compaction fold from the checkpoint
    Sinks.upsertByKeyManifest(spark, Seq((123L, "post")).toDF("k", "v"), dir, "k")
    assert(Sinks.readVersioned(spark, dir).filter(col("k") === 123L)
      .collect()(0).getString(1) == "post")
  }

  test("compaction shrinks file counts and preserves rows") {
    import spark.implicits._
    val flat = tmp() + "/compact_flat"
    val part = tmp() + "/compact_part"
    // many small appends — the streaming-sink accretion shape
    (1 to 5).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v").write.mode("append").parquet(flat)
      Seq((s"2024-01-0${i % 2 + 1}", i.toLong, s"v$i")).toDF("dt", "k", "v")
        .write.mode("append").partitionBy("dt").parquet(part)
    }
    def parquetFiles(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(dir))
    }
    val beforeFlat = spark.read.parquet(flat).orderBy("k").collect().toSeq
    assert(parquetFiles(flat) >= 5)
    Sinks.compact(spark, flat)
    assert(parquetFiles(flat) == 1, "small files must merge into one")
    assert(spark.read.parquet(flat).orderBy("k").collect().toSeq == beforeFlat)
    val beforePart = spark.read.parquet(part).orderBy("k")
      .collect().map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v")))).toSeq
    Sinks.compact(spark, part, partitionCols = Seq("dt"))
    assert(parquetFiles(part) == 2, "one file per partition dir after compaction")
    assert(spark.read.parquet(part).orderBy("k")
      .collect().map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v")))).toSeq
      == beforePart)
  }

  test("task runner threads DataFrames, logs, and isolates failures") {
    val outDir = tmp() + "/bronze_li"
    val tasks =
      Medallion.entityTasks("lineitem",
        read = s => Tables.lineitem(s, sf),
        transform = etl.Cleaning.addPipelineMetadata("p1", "r1", "t1"),
        write = df => df.write.mode("overwrite").parquet(outDir)) ++
      Medallion.entityTasks("broken",
        read = s => s.read.parquet("/nope/missing"),
        transform = identity,
        write = _ => ())
    val logs = Medallion.runTasks(spark, tasks)
    assert(logs.count(_.status == "success") == 3)
    val failed = logs.filter(_.status == "failed")
    assert(failed.map(_.entity) == Seq("broken"),
      "read failure stops only that entity's chain")
    val writeLogs = logs.filter(l => l.entity == "lineitem" && l.task.endsWith("_write"))
    assert(writeLogs.nonEmpty && writeLogs.forall(_.rowCount > 0))
    val written = spark.read.parquet(outDir)
    assert(written.columns.contains("metadata") &&
      written.count() == Tables.lineitem(spark, sf).count())
    val logDf = Medallion.logsToDf(spark, "dev", logs)
    assert(logDf.filter(col("environment") === "dev").count() == logs.size)
  }

  test("declarative pipeline config builds and runs the 3-entity bronze DAG") {
    import graft.etl.PipelineConfig
    val out = tmp()
    val config =
      """pipelines:
        |  lineitem:
        |    tasks:
        |      - operation: read_lineitem_raw
        |        input_from: null
        |      - operation: transform_lineitem
        |        input_from: read_lineitem_raw
        |      - operation: write_lineitem_bronze
        |        input_from: transform_lineitem
        |  orders:
        |    tasks:
        |      # dependency declared before its producer: topo sort must fix it
        |      - operation: write_orders_bronze
        |        input_from: read_orders_raw
        |      - operation: read_orders_raw
        |        input_from: null
        |  nation:
        |    tasks:
        |      - operation: read_nation_raw
        |        input_from: null
        |      - operation: write_nation_bronze
        |        input_from: read_nation_raw
        |""".stripMargin
    val parsed = PipelineConfig.parse(config)
    assert(parsed.map(_.name) == Seq("lineitem", "orders", "nation"))
    assert(parsed.head.tasks.map(_.inputFrom) ==
      Seq(None, Some("read_lineitem_raw"), Some("transform_lineitem")))
    val ops = Map[String, (SparkSession, Option[org.apache.spark.sql.DataFrame]) => Option[org.apache.spark.sql.DataFrame]](
      "read_lineitem_raw" -> ((s, _) => Some(Tables.lineitem(s, sf))),
      "transform_lineitem" -> ((_, in) =>
        in.map(etl.Cleaning.addPipelineMetadata("p1", "r1", "t1"))),
      "write_lineitem_bronze" -> ((_, in) =>
        { in.foreach(_.write.mode("overwrite").parquet(s"$out/lineitem")); in }),
      "read_orders_raw" -> ((s, _) => Some(Tables.orders(s, sf))),
      "write_orders_bronze" -> ((_, in) =>
        { in.foreach(_.write.mode("overwrite").parquet(s"$out/orders")); in }),
      "read_nation_raw" -> ((s, _) => Some(Tables.nation(s, sf))),
      "write_nation_bronze" -> ((_, in) =>
        { in.foreach(_.write.mode("overwrite").parquet(s"$out/nation")); in }))
    val logs = PipelineConfig.runPipelines(spark, config, ops)
    assert(logs.size == 7 && logs.forall(_.status == "success"))
    // topo order put read before write despite declaration order
    val orderTasks = logs.filter(_.entity == "orders").map(_.task)
    assert(orderTasks == Seq("read_orders_raw", "write_orders_bronze"))
    assert(spark.read.parquet(s"$out/lineitem").columns.contains("metadata"))
    assert(spark.read.parquet(s"$out/orders").count() ==
      Tables.orders(spark, sf).count())
    // cycle → loud failure
    intercept[IllegalArgumentException] {
      PipelineConfig.ordered(PipelineConfig.PipelineDef("bad", Seq(
        PipelineConfig.PipelineTask("a", Some("b")),
        PipelineConfig.PipelineTask("b", Some("a")))))
    }
  }

  test("corpus-prep DAG runs dedup→quality→decontam→split→pack end-to-end with row accounting") {
    import graft.etl.CorpusPipeline
    val out = tmp()
    val logs = CorpusPipeline.run(spark, s => Tables.documents(s, sf), out)
    assert(logs.size == 7 && logs.forall(_.status == "success"),
      s"all 7 corpus tasks must succeed: $logs")
    assert(logs.map(_.task) == Seq("read_documents_raw", "transform_dedup",
      "transform_quality_filter", "transform_decontam", "transform_split",
      "transform_pack", "write_packed_corpus"),
      "tasks must run in dependency order")
    val packed = spark.read.parquet(s"$out/packed")
    // row accounting, replayed stage by stage through the SAME stage
    // functions the DAG binds — each stage must shrink (or preserve) the
    // corpus exactly as its standalone operator does
    val docs = Tables.documents(spark, sf)
    val n0 = docs.count()
    val deduped = CorpusPipeline.dedupStage(docs)
    val n1 = deduped.count()
    val gated = CorpusPipeline.qualityStage(deduped)
    val n2 = gated.count()
    val clean = CorpusPipeline.decontamStage(gated)
    val n3 = clean.count()
    val train = CorpusPipeline.splitStage(clean)
    val n4 = train.count()
    assert(n1 < n0, s"dedup must drop the planted duplicate bags ($n1 of $n0)")
    assert(n1 == docs.select(graft.text.Text.bagOfWordsFingerprint(col("text")))
      .distinct().count(), "dedup keeps exactly one row per fingerprint")
    assert(n2 <= n1, s"quality gate cannot add rows ($n2 of $n1)")
    assert(n3 < n2, s"decontam must at least drop the bench slice ($n3 of $n2)")
    assert(n4 < n3 && n4 > 0, s"train split is a strict non-empty subset ($n4 of $n3)")
    assert(packed.count() == n4,
      "packing assigns every surviving train doc to exactly one bin")
    // the write task's logged row count is the packed-manifest count
    assert(logs.find(_.kind == "write").get.rowCount == n4)
    // packing respects the token budget: no multi-doc bin exceeds it
    val overflowing = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("docs"))
      .filter(col("tok") > 256L && col("docs") > 1L)
    assert(overflowing.isEmpty, "multi-doc bins must respect the budget")
  }

  test("full 23-column task-log schema round-trips through the S6 sink") {
    import graft.etl.{Medallion, PipelineConfig}
    val logs = Seq(
      Medallion.TaskLog("flights", "tsk_flights_read", "read", "success", -1L, 12L, "", ""),
      Medallion.TaskLog("flights", "tsk_flights_write", "write", "success", 42L, 34L, "", ""),
      Medallion.TaskLog("airports", "tsk_airports_read", "read", "failed", -1L, 5L,
        "AnalysisException", "path missing"))
    val ctx = Medallion.RunContext("pl1", "unikargo_etl", "dev", "run42", "nightly",
      tags = Map("team" -> "data"))
    val df = Medallion.taskLogTable(spark, ctx, logs,
      sourcePaths = Map("flights" -> "/raw/flights"),
      targetPaths = Map("flights" -> "/bronze/flights"))
    val expected = Seq("pipeline_id", "pipeline_name", "environment", "run_id",
      "run_name", "task_id", "step_index", "step_type", "parent_task_id",
      "attempt_number", "status", "rows_processed", "execution_time_ms",
      "source_path", "target_path", "error_type", "error_message",
      "worker_node", "executor_id", "timestamp", "log_date", "tags", "etl_metrics")
    assert(df.columns.toSeq == expected, "23 columns, reference names, in order")
    val dir = tmp() + "/task_logs"
    Medallion.writeTaskLogs(df, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 3)
    // partitioned by environment/log_date (S6 end-to-end)
    assert(new java.io.File(dir).listFiles().exists(_.getName == "environment=dev"))
    val failedRow = back.filter(col("status") === "FAILED").collect()(0)
    assert(failedRow.getAs[String]("error_type") == "AnalysisException")
    // step_index is per-chain position: airports' first task is 0 even
    // though it is the third log row overall
    assert(failedRow.getAs[Int]("step_index") == 0)
    assert(back.filter(col("task_id") === "tsk_flights_write").collect()(0)
      .getAs[Int]("step_index") == 1)
    assert(failedRow.getAs[Map[String, String]]("tags") == Map("team" -> "data"))
    val w = back.filter(col("task_id") === "tsk_flights_write").collect()(0)
    assert(w.getAs[Map[String, String]]("etl_metrics")("rows_processed") == "42")
    assert(w.getAs[String]("source_path") == "/raw/flights")
  }

  test("S2/S5/S7/S12: catalog DDL, managed-table write/read, table stream") {
    val wh = tmp()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_test LOCATION '$wh/graft_test'")
    assert(spark.sql("SHOW DATABASES").collect()
      .map(_.getString(0)).contains("graft_test"))
    io.Sinks.saveToTable(
      Tables.region(spark, sf), "graft_test.region_bronze", mode = "overwrite")
    val back = io.Sources.readTable(spark, "graft_test.region_bronze")
    assert(back.count() == 5)
    assert(spark.sql("DESCRIBE TABLE graft_test.region_bronze").collect()
      .map(_.getString(0)).contains("r_name"))
    // S7: stream FROM the managed table into a path sink
    val dst = tmp() + "/s7_out"
    val q = streaming.Relay.writeStreamPath(
      streaming.Relay.readStreamTable(spark, "graft_test.region_bronze"),
      dst, tmp() + "/s7_ckp", queryName = "s7relay")
    q.awaitTermination()
    assert(spark.read.parquet(dst).count() == 5)
    spark.sql("DROP TABLE graft_test.region_bronze")
    spark.sql("DROP DATABASE graft_test")
  }

  test("star build: RI orphan counts are zero for every dim") {
    val fact = Star.factLineitem(spark, sf)
    assert(Star.riOrphans(fact,
      Star.dimCustomer(spark, sf).select("customer_sk"), "customer_sk") == 0)
    assert(Star.riOrphans(fact,
      Star.dimPart(spark, sf).select("part_sk"), "part_sk") == 0)
    assert(Star.riOrphans(fact,
      Star.dimSupplier(spark, sf).select("supplier_sk"), "supplier_sk") == 0)
    assert(Star.riOrphans(fact,
      Star.dimDate(spark).select(col("date_sk").as("ship_date_sk")),
      "ship_date_sk") == 0)
  }

  test("entry() works on a vanilla session (driver t1 smoke contract)") {
    // the driver calls entry(spark) with ITS session, which won't have
    // Sessions.local's conveniences; prove entry doesn't need nanosAsLong
    // (getOrCreate would reuse the extended session, so clone + flip conf)
    val vanilla = spark.newSession()
    vanilla.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    assert(SparkEntry.entry(vanilla).count() > 0)
  }

  test("S11 materialized agg: incremental refresh from the CDF ≡ full recompute") {
    import spark.implicits._
    import graft.io.Materialized
    val dir = tmp() + "/ivm_manifest"
    // (k merge-key, g group, v nullable measure). Group 99 will vanish
    // entirely (cnt→0 drop); group 98's only non-null v will be nulled
    // (sum must flip back to NULL via the non-null count).
    val v1Rows = (0L until 290L).map(k => (k, k % 7, if (k % 5 == 0) None else Some(k * 10))) ++
      (290L until 295L).map(k => (k, 99L, Some(k))) ++
      Seq((295L, 98L, Some(7L)), (296L, 98L, None), (297L, 98L, None))
    Sinks.writeWithManifest(spark, v1Rows.toDF("k", "g", "v"), dir, "k", nFiles = 4)
    val (agg1, ver1) = Materialized.fullRefresh(spark, dir, Seq("g"), Seq("v"))
    assert(ver1 == 1L)
    val stored = agg1.collect()  // "persist" the v1 aggregate
    val prev = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(stored.toSeq).asJava), agg1.schema)
    // v2: move every g=99 row into g=0, change values, insert new keys
    Sinks.upsertByKeyManifest(spark,
      ((290L until 295L).map(k => (k, 0L, Some(k * 100))) ++
        Seq((1L, 1L, Some(999L)), (5L, 2L, Some(50L))) ++
        (1000L until 1005L).map(k => (k, 3L, Some(k)))).toDF("k", "g", "v"),
      dir, "k")
    // v3: null out group 98's only non-null measure + one more update
    Sinks.upsertByKeyManifest(spark,
      Seq((295L, 98L, None: Option[Long]), (2L, 2L, Some(4L)))
        .toDF("k", "g", "v"), dir, "k")
    val (inc, verInc) = Materialized.incrementalRefresh(
      spark, dir, prev, ver1, Seq("g"), Seq("v"))
    val (full, verFull) = Materialized.fullRefresh(spark, dir, Seq("g"), Seq("v"))
    assert(verInc == 3L && verFull == 3L)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toSet
    val incSet = shape(inc)
    assert(incSet == shape(full),
      "incremental aggregate must equal the full recompute bit-for-bit")
    assert(!incSet.exists(_._1 == 99L), "emptied group must drop out")
    val g98 = incSet.find(_._1 == 98L).get
    assert(g98._3.isEmpty && g98._4 == 0L,
      s"all-null group must read sum NULL via nn=0, got $g98")
    // no-op refresh: already at the current version → prev passes through
    val (same, v3b) = Materialized.incrementalRefresh(
      spark, dir, inc, verInc, Seq("g"), Seq("v"))
    assert(v3b == 3L && shape(same) == incSet)
  }

  test("S11 star-join IVM: fact-delta refresh ⋈ dim ≡ full join recompute") {
    import spark.implicits._
    import graft.io.Materialized
    val dir = tmp() + "/ivm_join_manifest"
    // fact (k merge-key, dk dim-key, v measure); dim maps dk → region.
    // dk=4 (v1) and dk=7 (v2 insert) have NO dim row: those facts must
    // stay invisible through both the full and the incremental path
    // (inner-join semantics carry over to the delta).
    val dim = Seq((0L, "r0"), (1L, "r1"), (2L, "r2"), (3L, "r0"))
      .toDF("dk", "region")
    val v1 = (0L until 200L).map(k => (k, k % 5, k * 10))
    Sinks.writeWithManifest(spark, v1.toDF("k", "dk", "v"), dir, "k",
      nFiles = 3)
    val (agg1, ver1) = Materialized.fullJoinRefresh(spark, dir, dim,
      Seq("dk"), Seq("region"), Seq("v"))
    val prev = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(agg1.collect().toSeq).asJava), agg1.schema)
    // v2: move facts across dim keys (0→2), insert new keys on a
    // matched and an UNMATCHED dim key, and rewrite one value
    Sinks.upsertByKeyManifest(spark,
      ((0L until 40L).map(k => (k, 2L, k * 100)) ++
        Seq((500L, 1L, 7L), (501L, 7L, 999L), (3L, 3L, 4L)))
        .toDF("k", "dk", "v"), dir, "k")
    val (inc, verInc) = Materialized.incrementalJoinRefresh(spark, dir,
      dim, prev, ver1, Seq("dk"), Seq("region"), Seq("v"))
    val (full, verFull) = Materialized.fullJoinRefresh(spark, dir, dim,
      Seq("dk"), Seq("region"), Seq("v"))
    assert(verInc == verFull)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toSet
    assert(shape(inc) == shape(full),
      "fact-delta join refresh must equal the full join recompute")
    // dk=7's inserted fact never surfaces (no dim row)
    assert(shape(inc).map(_._2).sum ==
      full.agg(sum("cnt")).collect()(0).getLong(0))
    // no-op refresh passes prev through untouched
    val (same, v2b) = Materialized.incrementalJoinRefresh(spark, dir,
      dim, inc, verInc, Seq("dk"), Seq("region"), Seq("v"))
    assert(v2b == verInc && shape(same) == shape(inc))
  }

  test("star fact: surrogate keys are collision-free") {
    val fact = Star.factLineitem(spark, sf)
    val n = fact.count()
    assert(fact.select("lineitem_sk").distinct().count() == n)
  }

  override def afterAll(): Unit = spark.stop()
}
