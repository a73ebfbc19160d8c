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

  test("star fact: surrogate keys are collision-free") {
    val fact = Star.factLineitem(spark, sf)
    val n = fact.count()
    assert(fact.select("lineitem_sk").distinct().count() == n)
  }

  override def afterAll(): Unit = spark.stop()
}
