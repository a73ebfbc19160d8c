package graft.etl

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Medallion orchestration control plane (SURVEY §2.11) — Spark-native
  * re-expression of the reference's config + task factory + sequential
  * runner + structured task logging (`src/config/table_config_utils
  * .py:80-180`, `unicargo_etl/scripts/01_bronze/task_factory.py:3-27`,
  * `bronze_orchestrator.py:140-224`, `src/logging_utils/task_logger_utils
  * .py:102-221`).
  *
  * Config is plain Scala values (no YAML dependency offline); the resolved
  * name shape mirrors the reference's `catalog.schema.table` →
  * `<env>_<layer>` database + table two-level namespace (SURVEY §1.4).
  */
object Medallion {

  /** Layer → schema-name mapping (reference `configs/environments.yaml`). */
  val layerSchema: Map[String, String] =
    Map("bronze" -> "01_bronze", "silver" -> "02_silver", "gold" -> "03_gold")

  /** Reference TableConfig.full_name (`table_config_utils.py:110-112`),
    * flattened for a two-level catalog: `unikargo_dev_01_bronze.tbl`. */
  final case class TableConfig(entity: String, layer: String, env: String,
      table: String, rawPath: Option[String] = None) {
    def database: String = s"unikargo_${env}_${layerSchema(layer)}"
    def fullName: String = s"$database.$table"
  }

  /** Task = one read/transform/write step bound to an entity (reference
    * `task_factory.py:3-27`). */
  final case class Task(entity: String, name: String, kind: String,
      run: (SparkSession, Option[DataFrame]) => Option[DataFrame])

  /** Structured task-log row — the runner's compact record. [[taskLogTable]]
    * expands these to the reference's full 23-column schema. */
  final case class TaskLog(entity: String, task: String, kind: String,
      status: String, rowCount: Long, durationMs: Long,
      errorType: String, error: String)

  /** Reference task factory: per entity, [read, transform, write]. */
  def entityTasks(entity: String,
      read: SparkSession => DataFrame,
      transform: DataFrame => DataFrame,
      write: DataFrame => Unit): Seq[Task] = Seq(
    Task(entity, s"tsk_${entity}_read", "read",
      (s, _) => Some(read(s))),
    Task(entity, s"tsk_${entity}_transform", "transform",
      (_, df) => df.map(transform)),
    Task(entity, s"tsk_${entity}_write", "write",
      (_, df) => { df.foreach(write); df }))

  /** Sequential task runner with per-entity DataFrame threading and
    * structured logs (reference `run_tasks`, `bronze_orchestrator
    * .py:140-224`). Unlike the reference it does NOT count rows after
    * every task (each count re-executes the plan — the N+1-jobs
    * anti-pattern flagged in SURVEY §4): the row count is measured once,
    * on the write task's output.
    * Returns the logs; failures are logged and stop that entity's chain
    * but not other entities. */
  def runTasks(spark: SparkSession, tasks: Seq[Task]): Seq[TaskLog] = {
    val logs = ListBuffer.empty[TaskLog]
    val current = scala.collection.mutable.Map.empty[String, Option[DataFrame]]
    val failed = scala.collection.mutable.Set.empty[String]
    tasks.foreach { t =>
      if (!failed(t.entity)) {
        val t0 = System.nanoTime()
        try {
          val out = t.run(spark, current.getOrElse(t.entity, None))
          current(t.entity) = out
          val rows = if (t.kind == "write") out.map(_.count()).getOrElse(0L) else -1L
          logs += TaskLog(t.entity, t.name, t.kind, "success", rows,
            (System.nanoTime() - t0) / 1000000, "", "")
        } catch {
          case e: Throwable =>
            failed += t.entity
            logs += TaskLog(t.entity, t.name, t.kind, "failed", -1L,
              (System.nanoTime() - t0) / 1000000,
              e.getClass.getSimpleName, String.valueOf(e.getMessage))
        }
      }
    }
    logs.toSeq
  }

  /** Persist logs as a partitioned table (reference writes log rows to a
    * Delta path partitioned by environment/log_date,
    * `task_logger_utils.py:175-176`). */
  def logsToDf(spark: SparkSession, env: String, logs: Seq[TaskLog]): DataFrame = {
    import spark.implicits._
    logs.toDF()
      .withColumn("environment", lit(env))
      .withColumn("log_date", current_date())
  }

  /** Pipeline/run identity for the full task-log schema (the reference
    * resolves these from widgets/job context, `task_logger_utils.py:60-95`). */
  final case class RunContext(pipelineId: String, pipelineName: String,
      env: String, runId: String, runName: String,
      tags: Map[String, String] = Map.empty)

  /** The reference's FULL 23-column task-log schema
    * (`task_logger_utils.py:102-139`): identifiers, execution metrics,
    * I/O paths, error tracking, cluster info, timestamps + the log_date
    * partition key, and the `tags` / `etl_metrics` map columns. Column
    * names match the reference exactly so downstream log consumers port
    * 1:1. Cluster info reflects the driver (local mode); the paths come
    * from per-entity maps when the caller tracks them. */
  def taskLogTable(spark: SparkSession, ctx: RunContext, logs: Seq[TaskLog],
      sourcePaths: Map[String, String] = Map.empty,
      targetPaths: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // 23 fields > Scala's Tuple22 limit → explicit Row + schema.
    val schema = StructType(Seq(
      StructField("pipeline_id", StringType), StructField("pipeline_name", StringType),
      StructField("environment", StringType), StructField("run_id", StringType),
      StructField("run_name", StringType), StructField("task_id", StringType),
      StructField("step_index", IntegerType), StructField("step_type", StringType),
      StructField("parent_task_id", StringType), StructField("attempt_number", IntegerType),
      StructField("status", StringType), StructField("rows_processed", LongType),
      StructField("execution_time_ms", LongType), StructField("source_path", StringType),
      StructField("target_path", StringType), StructField("error_type", StringType),
      StructField("error_message", StringType), StructField("worker_node", StringType),
      StructField("executor_id", StringType), StructField("timestamp", TimestampType),
      StructField("log_date", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("etl_metrics", MapType(StringType, StringType))))
    val host = java.net.InetAddress.getLocalHost.getHostName
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val today = java.time.LocalDate.now().toString
    // step_index is the position WITHIN the entity's chain (the
    // reference's per-chain step order), not a global row number.
    val stepCounters = scala.collection.mutable.Map.empty[String, Int]
    val rows = logs.map { l =>
      val i = stepCounters.getOrElse(l.entity, 0)
      stepCounters(l.entity) = i + 1
      Row(ctx.pipelineId, ctx.pipelineName, ctx.env, ctx.runId, ctx.runName,
        l.task, i, l.kind, l.entity, 1,
        l.status.toUpperCase, l.rowCount, l.durationMs,
        sourcePaths.get(l.entity).orNull, targetPaths.get(l.entity).orNull,
        if (l.errorType.isEmpty) null else l.errorType,
        if (l.error.isEmpty) null else l.error,
        host, "driver", now, today,
        ctx.tags, Map("rows_processed" -> l.rowCount.toString,
          "execution_time_ms" -> l.durationMs.toString))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** Write a task-log table to its partitioned path (environment/log_date,
    * `task_logger_utils.py:175-176`) through the S6 partitioned sink. */
  def writeTaskLogs(logDf: DataFrame, path: String): Unit =
    graft.io.Sinks.savePartitioned(logDf, path,
      Seq("environment", "log_date"), mode = "append")

  /** Pipeline-level event log (reference `PipelineLogger` +
    * `log_pipeline_event`, `src/logging_utils/pipeline_logger_utils
    * .py:27-152`): start/complete/fail events around a whole run,
    * accumulated driver-side (events are O(tasks), not O(rows)) and
    * persisted like task logs. */
  final class PipelineRun(val pipelineId: String, val runId: String,
      val env: String) {
    private val events = ListBuffer.empty[(String, String, java.sql.Timestamp)]

    def logEvent(event: String, status: String): Unit =
      events += ((event, status, new java.sql.Timestamp(System.currentTimeMillis())))

    /** Run `body` bracketed by started/completed|failed events (the
      * reference's context-manager semantics). */
    def bracket[T](body: => T): T = {
      logEvent("pipeline", "started")
      try { val r = body; logEvent("pipeline", "completed"); r }
      catch { case e: Throwable => logEvent("pipeline", "failed"); throw e }
    }

    def eventsDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      events.toSeq.toDF("event", "status", "event_time")
        .withColumn("pipeline_id", lit(pipelineId))
        .withColumn("run_id", lit(runId))
        .withColumn("environment", lit(env))
        .withColumn("log_date", current_date())
    }
  }
}
