package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data-cleaning operators — Spark-native re-expression of the reference's
  * cleaning module (`src/data_quality/cleaning.py:1-176` and
  * `src/unikargo_utils/df_transform_utils.py:5-35` in
  * akin11235/unicargo-medallion-data-pipeline).
  *
  * Every operator is a pure `DataFrame => DataFrame` so pipelines compose as
  * function folds (the reference drives the same ops from an ordered config
  * list, `cleaning.py:132-176`). All are single-pass, shuffle-free column
  * expressions except [[removeDuplicates]], which shuffles on the dedup key
  * exactly like a groupBy — at 100 TB that is the minimal possible cost for
  * exact dedup.
  */
object Cleaning {

  /** Reference `add_ingestion_timestamp` (`cleaning.py:18-26`). */
  def addIngestionTimestamp(colName: String = "ingestion_timestamp")(df: DataFrame): DataFrame =
    df.withColumn(colName, current_timestamp())

  /** Reference `drop_columns` with existence validation
    * (`cleaning.py:28-58`): silently skips absent columns rather than
    * failing mid-pipeline. */
  def dropColumns(cols: Seq[String])(df: DataFrame): DataFrame = {
    val present = cols.filter(df.columns.contains)
    df.drop(present: _*)
  }

  /** Reference `remove_duplicates` (`cleaning.py:60-87`): all-column or
    * key-subset dedup. Subset dedup keeps an arbitrary survivor per key —
    * callers that need deterministic survivors should use
    * [[latestByKey]] instead. */
  def removeDuplicates(subset: Seq[String] = Nil)(df: DataFrame): DataFrame =
    if (subset.isEmpty) df.dropDuplicates()
    else df.dropDuplicates(subset)

  /** Deterministic dedup: keep the row with the greatest `orderCols` tuple
    * per key. This is the scalable MERGE-style "latest wins" upsert
    * primitive. Implemented as max_by over a struct — a hash aggregate
    * with map-side partial combine, which beats the equivalent
    * row_number window (full shuffle + per-key SORT) and, unlike it,
    * reduces data before the shuffle. Survivor choice is identical to
    * `row_number over (order by orderCols desc) = 1` provided the
    * ordering is total (pass enough columns to break all ties). */
  def latestByKey(keys: Seq[String], orderCols: Seq[Column])(df: DataFrame): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains).toIndexedSeq
    val packed = df.groupBy(keys.map(col): _*)
      .agg(max_by(
        struct(valueCols.map(col): _*),
        struct(orderCols: _*)).as("__row"))
    packed.select(keys.map(col) ++
      valueCols.map(c => col(s"__row.$c").as(c)): _*)
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Reference `handle_null_values` (`cleaning.py:89-130`): per-column
    * custom fills first, then type-dispatched defaults — strings →
    * `stringDefault`, numerics → `numericDefault`. */
  def handleNulls(
      custom: Map[String, Any] = Map.empty,
      stringDefault: String = "Unknown",
      numericDefault: Double = 0d)(df: DataFrame): DataFrame = {
    val custFilled = if (custom.nonEmpty) df.na.fill(custom) else df
    val remaining = df.schema.filterNot(f => custom.contains(f.name))
    val stringCols = remaining.collect { case f if f.dataType == StringType => f.name }
    val numCols = remaining.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }
    custFilled
      .na.fill(stringDefault, stringCols)
      .na.fill(numericDefault, numCols)
  }

  /** Reference `validate_data_quality` (`validate_data_quality.py:3-23`),
    * fixed for scale: the reference runs one Spark job per column
    * (`bronze_orchestrator.py:185-192`, N+1 jobs); here all per-column null
    * counts and the row count come from ONE aggregate pass.
    * Returns (rowCount, colName -> nullCount). */
  def nullAudit(df: DataFrame, cols: Seq[String] = Nil): (Long, Map[String, Long]) = {
    val audited = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = count(lit(1)).as("__n") +:
      audited.map(c => sum(col(c).isNull.cast("long")).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("__n")
    (n, audited.map(c => c -> row.getAs[Long](c)).toMap)
  }

  /** Single-row DataFrame version of [[nullAudit]] for pipelines that
    * persist DQ metrics as data (reference logs metrics to a Delta table).
    */
  def nullAuditDf(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val audited = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = count(lit(1)).as("row_count") +:
      audited.map(c => sum(col(c).isNull.cast("long")).as(s"nulls_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Zero-extra-pass twin of [[nullAudit]]: attaches the same metrics as
    * an `Observation`, so they are collected DURING whatever action the
    * caller already runs (typically the layer's write) instead of a
    * second full scan — at 100 TB the difference between auditing and
    * re-reading the table. Usage:
    * {{{
    *   val (observed, obs) = Cleaning.observedNullAudit(df)
    *   observed.write.parquet(out)          // the caller's own action
    *   val metrics = obs.get                // rows + nulls_<col> counts
    * }}} */
  def observedNullAudit(df: DataFrame, cols: Seq[String] = Nil)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val audited = if (cols.nonEmpty) cols else df.columns.toSeq
    val obs = org.apache.spark.sql.Observation("dq_null_audit")
    val aggs = count(lit(1)).as("row_count") +:
      audited.map(c => sum(col(c).isNull.cast("long")).as(s"nulls_$c"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** DQ gate (reference threshold semantics, `validate_data_quality.py:17`):
    * fail if empty or any required column exceeds `maxNullPct` percent
    * nulls. One job total. */
  def validateDataQuality(df: DataFrame, requiredCols: Seq[String],
      maxNullPct: Double = 5.0): Unit = {
    val (n, nulls) = nullAudit(df, requiredCols)
    require(n > 0, "DataFrame is empty")
    val over = nulls.filter { case (_, k) => k * 100.0 / n > maxNullPct }
    require(over.isEmpty,
      s"Null threshold exceeded: ${over.map { case (c, k) => s"$c=${k * 100.0 / n}%" }.mkString(", ")}")
  }

  /** Reference `add_pipeline_metadata` (`df_transform_utils.py:5-35`):
    * lineage map column + processing timestamp. */
  def addPipelineMetadata(pipelineId: String, runId: String, taskId: String)(
      df: DataFrame): DataFrame =
    df.withColumn("metadata", map(
        lit("pipeline_id"), lit(pipelineId),
        lit("run_id"), lit(runId),
        lit("task_id"), lit(taskId)))
      .withColumn("processed_timestamp", current_timestamp())

  /** Reference `clean_dataframe` (`cleaning.py:132-176`): ordered fold of
    * cleaning steps. */
  def pipeline(steps: Seq[DataFrame => DataFrame])(df: DataFrame): DataFrame =
    steps.foldLeft(df)((acc, step) => step(acc))

  /** Reference `CleaningConfig` (`src/config/cleaning_config.py:5-41`):
    * declarative cleaning plan — operation names in execution order plus
    * their parameters. */
  final case class CleaningConfig(
      operations: Seq[String] =
        Seq("add_timestamp", "drop_columns", "remove_duplicates", "handle_nulls"),
      dropCols: Seq[String] = Nil,
      dedupSubset: Seq[String] = Nil,
      customFills: Map[String, Any] = Map.empty,
      stringDefault: String = "Unknown",
      numericDefault: Double = 0d,
      timestampCol: String = "ingestion_timestamp")

  /** Reference `clean_dataframe(df, config)`: resolve the named operation
    * list to concrete steps and fold. Unknown operation names fail fast
    * (config typos surface at build time, not as silently-skipped steps).
    */
  def fromConfig(cfg: CleaningConfig): DataFrame => DataFrame = {
    val steps = cfg.operations.map {
      case "add_timestamp" => addIngestionTimestamp(cfg.timestampCol) _
      case "drop_columns" => dropColumns(cfg.dropCols) _
      case "remove_duplicates" => removeDuplicates(cfg.dedupSubset) _
      case "handle_nulls" =>
        handleNulls(cfg.customFills, cfg.stringDefault, cfg.numericDefault) _
      case other =>
        throw new IllegalArgumentException(s"unknown cleaning operation: $other")
    }
    pipeline(steps)
  }
}
