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

  /** Structured task-log row (subset of the reference's 23-column schema,
    * `task_logger_utils.py:102-139`). */
  final case class TaskLog(entity: String, task: String, status: String,
      rowCount: Long, durationMs: Long, error: String)

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
          logs += TaskLog(t.entity, t.name, "success", rows,
            (System.nanoTime() - t0) / 1000000, "")
        } catch {
          case e: Throwable =>
            failed += t.entity
            logs += TaskLog(t.entity, t.name, "failed", -1L,
              (System.nanoTime() - t0) / 1000000, String.valueOf(e.getMessage))
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
