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

  /** Per-media average-hash (aHash) from the sampled frame checksums:
    * bit i = 1 iff frame i's checksum exceeds the per-media mean —
    * the classic perceptual-hash recipe (mean-threshold bits) applied
    * to whatever the codec emits per frame. The comparison is a strict
    * integer cross-multiplication (c·nf > Σc), no float division, so
    * the bits are engine-identical. One partial-agg pass over the
    * frame rows, then a second to pack the bits. */
  def aHash(frames: DataFrame): DataFrame = {
    val ag = frames.groupBy("media_id").agg(
      count(lit(1)).as("nf"),
      sum(col("frame_checksum").cast("long")).as("s"))
    frames.join(ag, Seq("media_id"))
      .select(col("media_id"),
        when(col("frame_checksum").cast("long") * col("nf") > col("s"),
          expr("shiftleft(CAST(1 AS BIGINT), frame_idx)"))
          .otherwise(lit(0L)).as("bit"))
      .groupBy("media_id").agg(sum(col("bit")).as("ahash"))
  }

  /** Banded aHash near-dup pairs — LSH-style media dedup on the hash
    * bits: split the `frames`-bit hash into `bands` equal slices,
    * candidate any two media sharing a slice value (pigeonhole: a pair
    * within Hamming distance `bands − 1` ALWAYS shares a band, so the
    * banding is lossless for maxHamming < bands), then verify with the
    * exact popcount of the XOR. The candidate join touches buckets, not
    * all pairs — the [[graft.dedup.Dedup.simhashPairs]] scale shape on
    * a multimodal column. Returns (id_a, id_b, hamming). */
  def aHashNearDupPairs(media: DataFrame, frames: Int = 32, bands: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole completeness needs maxHamming < bands, got $maxHamming/$bands")
    val b = aHashBandIndex(media, frames, bands)
    val cand = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** The persisted aHash banding artifact — (media_id, ahash, band, bv)
    * rows, buildable once per corpus and appended per ingest batch (the
    * [[graft.io.Sinks.appendWithManifest]] discipline applied to the
    * multimodal dedup index, mirroring
    * [[graft.dedup.Dedup.lshBandIndex]] on the text side). */
  def aHashBandIndex(media: DataFrame, frames: Int = 32,
      bands: Int = 4): DataFrame = {
    require(frames % bands == 0, s"bands must divide frames")
    val bpb = frames / bands
    val mask = (1L << bpb) - 1
    aHash(sampleFrames(media, frames))
      .select(col("media_id"), col("ahash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bv", expr(s"shiftright(ahash, band * $bpb) & $mask"))
  }

  /** Incremental media near-dup after a corpus APPEND — the
    * continuous-ingest path on the multimodal column: with index(A) on
    * disk, a new batch B needs only index(B) built (|B| payloads hashed,
    * not |A∪B|) and the band join run NEW-sided against old ∪ new. The
    * A×A side — the quadratically dominant part of a cold rerun — is
    * never recomputed.
    *
    * Exactness law (spec-asserted, the
    * [[graft.dedup.Dedup.minhashLshPairsIncremental]] law): the aHash
    * and its band slices are per-payload deterministic, so
    * pairs(A∪B) = pairs(A) ∪ incremental(B) exactly. Returns
    * (updatedIndex, newPairs): the index to persist for the next batch
    * and the verified pairs touching ≥ 1 new payload. */
  def aHashNearDupPairsIncremental(oldIndex: DataFrame, newMedia: DataFrame,
      frames: Int = 32, bands: Int = 4,
      maxHamming: Int = 3): (DataFrame, DataFrame) = {
    require(maxHamming < bands,
      s"pigeonhole completeness needs maxHamming < bands, got $maxHamming/$bands")
    val newIndex = aHashBandIndex(newMedia, frames, bands)
    val full = oldIndex.unionByName(newIndex)
    val cand = newIndex.as("x").join(full.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.media_id") =!= col("y.media_id"))
      .select(least(col("x.media_id"), col("y.media_id")).as("id_a"),
        greatest(col("x.media_id"), col("y.media_id")).as("id_b"),
        // ha/hb ride the band rows; re-order to match (id_a, id_b)
        when(col("x.media_id") < col("y.media_id"), col("x.ahash"))
          .otherwise(col("y.ahash")).as("ha"),
        when(col("x.media_id") < col("y.media_id"), col("y.ahash"))
          .otherwise(col("x.ahash")).as("hb"))
      .distinct()
    val pairs = cand
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    (full, pairs)
  }

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
