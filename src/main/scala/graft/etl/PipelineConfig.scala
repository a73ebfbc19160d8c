package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Declarative pipeline-DAG config (SURVEY §2.11) — Spark-native
  * re-expression of the reference's YAML task chains
  * (`configs/pipelines.yaml:1-18`: `pipelines.<name>.tasks[]` with
  * `operation` + `input_from` dependency edges) and job DAGs
  * (`resources/unikargo_etl_pipeline_nb.job.yml:5-48`).
  *
  * The parser handles exactly the reference's config shape (a two-level
  * mapping with a `tasks` list of `operation` / `input_from` entries) with
  * no YAML dependency — the config is data, the operations registry binds
  * names to code, and [[runPipelines]] executes each pipeline's tasks in
  * dependency order through [[Medallion.runTasks]]'s logging/isolation
  * semantics.
  */
object PipelineConfig {

  /** One task node: `operation` names the bound function, `inputFrom`
    * names the upstream task whose output it consumes (None = source). */
  final case class PipelineTask(operation: String, inputFrom: Option[String])

  final case class PipelineDef(name: String, tasks: Seq[PipelineTask])

  /** Parse the reference's `pipelines.yaml` shape:
    * {{{
    * pipelines:
    *   flights:
    *     tasks:
    *       - operation: read_flights_raw
    *         input_from: null
    *       - operation: transform_flights
    *         input_from: read_flights_raw
    * }}}
    * Comments (#) and blank lines are ignored. Unknown keys are rejected
    * loudly — a typo'd config must not silently drop a task. */
  def parse(text: String): Seq[PipelineDef] = {
    val lines = text.linesIterator
      .map(l => l.takeWhile(_ != '#'))
      .filter(_.trim.nonEmpty)
      .toSeq
    require(lines.headOption.exists(_.trim == "pipelines:"),
      "config must start with 'pipelines:'")
    val pipelines = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ListBuffer[PipelineTask]]
    var current: Option[String] = None
    var pendingOp: Option[String] = None
    def flushPending(): Unit = pendingOp.foreach { op =>
      pipelines(current.get) += PipelineTask(op, None); pendingOp = None
    }
    lines.drop(1).foreach { line =>
      val indent = line.takeWhile(_ == ' ').length
      val t = line.trim
      (indent, t) match {
        case (2, name) if name.endsWith(":") =>
          flushPending()
          current = Some(name.dropRight(1))
          require(!pipelines.contains(current.get),
            s"duplicate pipeline section '${current.get}' — the second would silently replace the first")
          pipelines(current.get) = scala.collection.mutable.ListBuffer.empty
        case (4, "tasks:") => // structural
        case (6, op) if op.startsWith("- operation:") =>
          flushPending()
          pendingOp = Some(op.stripPrefix("- operation:").trim)
        case (8, in) if in.startsWith("input_from:") =>
          val v = in.stripPrefix("input_from:").trim
          val inputFrom = if (v == "null" || v == "~" || v.isEmpty) None else Some(v)
          pipelines(current.get) += PipelineTask(pendingOp.getOrElse(
            sys.error(s"input_from without operation: $line")), inputFrom)
          pendingOp = None
        case _ => sys.error(s"unrecognized config line (indent $indent): '$t'")
      }
    }
    flushPending()
    pipelines.map { case (n, ts) => PipelineDef(n, ts.toSeq) }.toSeq
  }

  /** Tasks in dependency order (Kahn's algorithm over `input_from` edges).
    * Rejects cycles and edges to unknown tasks — a config error must fail
    * the build, not reorder silently. Declaration order breaks ties, so
    * the result is deterministic. */
  def ordered(p: PipelineDef): Seq[PipelineTask] = {
    val byOp = p.tasks.map(t => t.operation -> t).toMap
    require(byOp.size == p.tasks.size,
      s"pipeline ${p.name}: duplicate operation names")
    p.tasks.foreach(t => t.inputFrom.foreach(i => require(byOp.contains(i),
      s"pipeline ${p.name}: task ${t.operation} depends on unknown task $i")))
    val out = scala.collection.mutable.ListBuffer.empty[PipelineTask]
    val done = scala.collection.mutable.Set.empty[String]
    var remaining = p.tasks
    while (remaining.nonEmpty) {
      val (ready, blocked) =
        remaining.partition(_.inputFrom.forall(done.contains))
      require(ready.nonEmpty,
        s"pipeline ${p.name}: dependency cycle among ${remaining.map(_.operation).mkString(",")}")
      ready.foreach { t => out += t; done += t.operation }
      remaining = blocked
    }
    out.toSeq
  }

  /** Step type from the reference's operation naming convention
    * (`read_*` / `transform_*` / `write_*`, `task_factory.py:3-27`). */
  def stepType(operation: String): String = operation.takeWhile(_ != '_')

  /** Bind a pipeline to an operations registry and run it: each operation
    * receives the output of its `input_from` task (None for sources) and
    * its own output is stored under its name. Logging, timing, and
    * failure isolation come from [[Medallion.runTasks]] — a failed task
    * marks the whole pipeline's remaining tasks failed-by-skip (the
    * reference's per-entity chain isolation, with the pipeline as the
    * entity). */
  def toTasks(p: PipelineDef,
      ops: Map[String, (SparkSession, Option[DataFrame]) => Option[DataFrame]])
      : Seq[Medallion.Task] = {
    val missing = p.tasks.map(_.operation).filterNot(ops.contains)
    require(missing.isEmpty,
      s"pipeline ${p.name}: no operation bound for ${missing.mkString(",")}")
    // outputs threaded by task name, not by entity-implicit state: the
    // runner's per-entity slot carries a map of completed task outputs.
    val outputs = scala.collection.mutable.Map.empty[String, Option[DataFrame]]
    ordered(p).map { t =>
      Medallion.Task(p.name, t.operation, stepType(t.operation),
        (s, _) => {
          val in = t.inputFrom.flatMap(outputs.getOrElse(_, None))
          val out = ops(t.operation)(s, in)
          outputs(t.operation) = out
          out
        })
    }
  }

  /** Parse + bind + run every pipeline in the config; returns the task
    * logs (one chain per pipeline, failures isolated per pipeline). */
  def runPipelines(spark: SparkSession, configText: String,
      ops: Map[String, (SparkSession, Option[DataFrame]) => Option[DataFrame]])
      : Seq[Medallion.TaskLog] =
    Medallion.runTasks(spark, parse(configText).flatMap(toTasks(_, ops)))
}
