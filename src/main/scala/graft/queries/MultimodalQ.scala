package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.mm.Multimodal

/** Multimodal-column coverage (LLM-data-pipeline extension): opaque binary
  * payloads + typed metadata + a batch decode stage. The testdata has no
  * real media, so document text is the payload; the stub codec's outputs
  * are deterministic functions of the bytes, which is exactly what makes
  * them oracle-checkable (SQL mirrors the byte math).
  */
object MultimodalQ extends QueryPack {

  /** Binary ingest + metadata + batch "decode": media schema from
    * [[Multimodal.asMedia]], features from the mapPartitions stage. */
  private def mmDecode(spark: SparkSession, d: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.documents(spark, d), "doc_id", "text", "text/plain")
    val features = Multimodal.decodeFeatures(media)
    media.select("media_id", "media_type", "byte_len")
      .join(features, Seq("media_id"))
      .orderBy("media_id")
  }

  private val mmDecodeSql =
    """SELECT doc_id AS media_id, 'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(octet_length(encode(text)) % 640 AS INT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
       CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE)
         / octet_length(encode(text)) AS mean_byte,
       4 AS n_frames
       FROM documents ORDER BY media_id"""

  /** Frame sampling: one row per sampled frame with a rolling checksum —
    * the oracle reproduces the chunking and fold byte-for-byte via
    * list_reduce over ascii codes (docs are pure ASCII). */
  private def mmFrames(spark: SparkSession, d: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.documents(spark, d), "doc_id", "text", "text/plain")
    Multimodal.sampleFrames(media, 4).orderBy("media_id", "frame_idx")
  }

  private val mmFramesSql =
    """WITH codes AS (
         SELECT doc_id,
                list_transform(string_split(text, ''),
                  c -> CAST(ascii(c) AS BIGINT)) AS cs,
                length(text) AS n
         FROM documents),
       frames AS (
         SELECT doc_id, unnest(range(0, 4)) AS frame_idx,
                cs, n, greatest(n // 4, 1) AS chunk
         FROM codes)
       SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
              CAST(list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                  cs[(frame_idx * chunk) + 1 :
                     least((frame_idx + 1) * chunk, n)]),
                (a, b) -> (a * 31 + b) & 2147483647) AS INT) AS frame_checksum
       FROM frames
       WHERE frame_idx * chunk < n
       ORDER BY media_id, frame_idx"""

  /** Resize metadata stage over decoded features. */
  private def mmResize(spark: SparkSession, d: String): DataFrame = {
    val media = Multimodal.asMedia(
      Tables.documents(spark, d), "doc_id", "text", "text/plain")
    Multimodal.resize(Multimodal.decodeFeatures(media), 320, 240)
      .select("media_id", "width", "height", "resized_w", "resized_h")
      .orderBy("media_id")
  }

  private val mmResizeSql =
    """SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) % 640 AS INT) AS width,
       CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
       CAST(least(octet_length(encode(text)) % 640, 320) AS INT) AS resized_w,
       CAST(least((octet_length(encode(text)) * 7) % 480, 240) AS INT) AS resized_h
       FROM documents ORDER BY media_id"""

  override def queries: Seq[Q] = Seq(
    Q("mm_decode", mmDecode, Some(mmDecodeSql)),
    Q("mm_frames", mmFrames, Some(mmFramesSql)),
    Q("mm_resize", mmResize, Some(mmResizeSql)))
}
