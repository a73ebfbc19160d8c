package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

import graft.etl.Cleaning
import graft.io.Sinks

/** Structured Streaming surface (SURVEY §2.1 S7–S10, §2.9) — Spark-native
  * re-expression of the reference's streaming module
  * (`src/streaming/readers.py:11-94`, `writers.py:12-132`,
  * `checkpoints.py:4-20`).
  *
  * The reference's streaming model is INCREMENTAL RELAY (no watermarks, no
  * event-time windows): layer-to-layer append with batch-style
  * `availableNow` triggers plus a foreachBatch MERGE upsert. Both are
  * preserved; checkpoints are per-(layer, query) directories exactly like
  * `streaming_config.py:6-48`.
  */
object Relay {

  /** Per-(layer, query) checkpoint directory layout (reference
    * `src/streaming/checkpoints.py:4-20` + `streaming_config.py:6-48`):
    * one checkpoint root per environment, isolated subdirectory per
    * relay query so restarts resume the right offsets. */
  def checkpointPath(root: String, layer: String, queryName: String): String =
    s"$root/_checkpoints/$layer/$queryName"

  /** S7 — streaming table source (reference `read_stream_from_table`). */
  def readStreamTable(spark: SparkSession, table: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.readStream.format(format))((r, kv) =>
      r.option(kv._1, kv._2)).table(table)

  /** S8 — streaming path source with explicit schema (reference
    * `read_stream_from_path`; schema is REQUIRED for file streams). */
  def readStreamPath(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.readStream.schema(schema).format(format))((r, kv) =>
      r.option(kv._1, kv._2)).load(path)

  /** Trigger names → Spark triggers (reference `writers.py:53-59`:
    * availableNow default, processingTime, once). */
  def trigger(name: String, interval: String = "10 seconds"): Trigger =
    name match {
      case "availableNow" => Trigger.AvailableNow()
      case "processingTime" => Trigger.ProcessingTime(interval)
      case "once" => Trigger.Once()
      case other => throw new IllegalArgumentException(s"unknown trigger: $other")
    }

  /** S9 — streaming sink to a path (reference `write_stream_to_table`,
    * `writers.py:12-76`): checkpointed, named, triggered; output modes
    * append/complete/update. Returns the started query; call
    * `processAllAvailable()`/`awaitTermination()` per the reference's
    * optional await. */
  def writeStreamPath(df: DataFrame, path: String, checkpoint: String,
      outputMode: String = "append", queryName: String = "relay",
      trig: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
      .queryName(queryName)
      .trigger(trig)
      .start()

  /** S10 — streaming upsert sink via foreachBatch (reference
    * `write_stream_upsert`, `writers.py:78-132`: MERGE INTO per batch).
    * Each micro-batch is upserted into the target keyed on `keys` with
    * latest-wins semantics ([[Sinks.upsertByKey]] — the Delta-less MERGE).
    * Late/duplicate data is thereby deduplicated per key exactly like the
    * reference's MERGE strategy (README.md:433-439). */
  def writeStreamUpsert(df: DataFrame, targetPath: String, checkpoint: String,
      keys: Seq[String], queryName: String = "upsert",
      trig: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode("update")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trig)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsertByKey(batch.sparkSession, batch, targetPath, keys)
      }
      .start()
}
