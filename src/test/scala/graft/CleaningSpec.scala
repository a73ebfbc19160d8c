package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Cleaning

/** Unit specs for the cleaning operators (reference semantics:
  * `src/data_quality/cleaning.py` in the surveyed repo). */
class CleaningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row

  private def df = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    spark.createDataFrame(
      Seq(
        Row(1L, "a", 1.5), Row(2L, null, null), Row(2L, null, null),
        Row(3L, "c", null)).asJava,
      schema)
  }

  test("dropColumns drops present, skips absent") {
    val out = Cleaning.dropColumns(Seq("score", "nope"))(df)
    assert(out.columns.toSeq == Seq("id", "name"))
  }

  test("removeDuplicates all-column dedup is idempotent") {
    val once = Cleaning.removeDuplicates()(df)
    val twice = Cleaning.removeDuplicates()(once)
    assert(once.count() == 3 && twice.count() == 3)
  }

  test("handleNulls: custom fill wins, then type defaults") {
    val out = Cleaning.handleNulls(custom = Map("score" -> 9.9))(df)
      .orderBy("id", "name").collect()
    assert(out.forall(r => !r.anyNull))
    assert(out.count(_.getDouble(2) == 9.9) == 3)
    assert(out.count(_.getString(1) == "Unknown") == 2)
  }

  test("nullAudit counts all columns in one pass") {
    val (n, nulls) = Cleaning.nullAudit(df)
    assert(n == 4)
    assert(nulls == Map("id" -> 0L, "name" -> 2L, "score" -> 3L))
  }

  test("observedNullAudit collects the audit during the caller's action") {
    val (observed, obs) = Cleaning.observedNullAudit(df)
    // the caller's OWN action — no separate audit job runs
    observed.write.mode("overwrite")
      .parquet(java.nio.file.Files.createTempDirectory("graft_obs_").toString + "/t")
    val m = obs.get
    assert(m("row_count") == 4L)
    assert(m("nulls_id") == 0L && m("nulls_name") == 2L && m("nulls_score") == 3L)
  }

  test("validateDataQuality fails over threshold, passes under") {
    Cleaning.validateDataQuality(df, Seq("id"), maxNullPct = 5.0)
    intercept[IllegalArgumentException] {
      Cleaning.validateDataQuality(df, Seq("name"), maxNullPct = 5.0)
    }
    intercept[IllegalArgumentException] {
      Cleaning.validateDataQuality(df.limit(0), Seq("id"))
    }
  }

  test("latestByKey keeps greatest order col per key, deterministically") {
    val events = spark.range(6).select(
      (col("id") % 2).as("k"), col("id").as("seq"),
      concat(lit("v"), col("id")).as("v"))
    val out = Cleaning.latestByKey(Seq("k"), Seq(col("seq")))(events)
      .orderBy("k").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 5L))
  }

  test("addPipelineMetadata adds lineage map + timestamp") {
    val out = Cleaning.addPipelineMetadata("p", "r", "t")(df)
    val m = out.select(col("metadata")).first().getMap[String, String](0)
    assert(m == Map("pipeline_id" -> "p", "run_id" -> "r", "task_id" -> "t"))
    assert(out.columns.contains("processed_timestamp"))
  }

  test("fromConfig resolves named ops in order; unknown op fails fast") {
    val cfg = Cleaning.CleaningConfig(
      operations = Seq("drop_columns", "handle_nulls", "remove_duplicates"),
      dropCols = Seq("score"))
    val out = Cleaning.fromConfig(cfg)(df)
    assert(out.columns.toSeq == Seq("id", "name") && out.count() == 3)
    intercept[IllegalArgumentException] {
      Cleaning.fromConfig(Cleaning.CleaningConfig(operations = Seq("nope")))
    }
  }

  test("PipelineRun brackets a run with events and survives failure") {
    val run = new graft.etl.Medallion.PipelineRun("pl1", "r1", "dev")
    run.bracket { 42 }
    intercept[RuntimeException] {
      new graft.etl.Medallion.PipelineRun("pl2", "r2", "dev")
        .bracket { throw new RuntimeException("boom") }
    }
    val events = run.eventsDf(spark).collect()
    assert(events.map(_.getString(1)).toSeq == Seq("started", "completed"))
    assert(events.forall(_.getAs[String]("pipeline_id") == "pl1"))
  }

  test("pipeline folds steps in order") {
    val out = Cleaning.pipeline(Seq(
      Cleaning.dropColumns(Seq("score")),
      Cleaning.handleNulls(),
      Cleaning.removeDuplicates()))(df)
    assert(out.columns.toSeq == Seq("id", "name") && out.count() == 3)
  }

  override def afterAll(): Unit = spark.stop()
}
