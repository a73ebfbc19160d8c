package graft.mm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch-shaped decode/feature stages.
  * (Extension surface — BASELINE.json north star.)
  *
  * The Spark-side mechanics are real — schema, partition-parallel batch
  * processing via mapPartitions over an Iterator (the JVM analogue of a
  * Pandas-UDF batch loop), deterministic output schema. The codec itself is
  * STUBBED (this container has no image/audio libraries): [[StubCodec]]
  * produces deterministic fake features from the bytes, and is the single
  * seam to swap for a real decoder (JavaCPP/ffmpeg/ImageIO) in production.
  */
object Multimodal {

  /** Canonical multimodal record schema: opaque payload + typed metadata.
    * Kept flat (no nested struct for the hot columns) so parquet column
    * pruning can drop the heavy `content` bytes when a query only touches
    * metadata — the single most important I/O optimization at 100 TB. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = true),
    StructField("byte_len", LongType, nullable = true)))

  /** Deterministic stand-in for a real media decoder. Every value derives
    * only from the payload bytes → reproducible across engines and runs. */
  object StubCodec {
    /** ??? in production: decode image dims. Fake: derived from length. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) =
      (bytes.length % 640, (bytes.length * 7) % 480)

    /** ??? in production: mean luminance etc. Fake: mean unsigned byte. */
    def meanByte(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length

    /** ??? in production: frame sampling. Fake: every nth byte as a
      * "frame" checksum. */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Int] =
      bytes.grouped(math.max(1, bytes.length / math.max(n, 1)))
        .take(n).map(_.foldLeft(0)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffff))
        .toSeq
  }

  /** Wrap any table into media records by treating a string column as the
    * opaque payload (the testdata has no real binaries; the plumbing is
    * payload-agnostic). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      lit(mediaType).as("media_type"),
      length(col(payloadCol).cast("binary")).cast("long").as("byte_len"))

  /** Frame-sampling stage: one output row per sampled "frame"
    * (media_id, frame_idx, frame_checksum) — the Spark-side shape of
    * video frame extraction: mapPartitions + flatMap, rows ∝ frames. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame_checksum", IntegerType, nullable = false)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        StubCodec.sampleFrames(bytes, n).zipWithIndex.map {
          case (ck, i) => Row(id, i, ck)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize stage (stub): deterministic fake target-bound dimensions —
    * the real implementation would decode, scale, re-encode; the Spark
    * shape (projection over binary + metadata) is identical. */
  def resize(features: DataFrame, targetW: Int, targetH: Int): DataFrame =
    features
      .withColumn("resized_w", least(col("width"), lit(targetW)))
      .withColumn("resized_h", least(col("height"), lit(targetH)))

  /** Batch decode stage: mapPartitions so the (stub) codec amortizes any
    * per-batch init across the partition — the same batch shape a Pandas
    * UDF / mapInPandas stage has in PySpark. Output schema is fixed and
    * explicit. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_byte", DoubleType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      // per-partition codec init would happen here (once per batch)
      it.map { row =>
        val id = row.getLong(0)
        val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (w, h) = StubCodec.decodeDims(bytes)
        Row(id, w, h, StubCodec.meanByte(bytes), StubCodec.sampleFrames(bytes, 4).size)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
