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

  override def queries: Seq[Q] = Seq(
    Q("mm_decode", mmDecode, Some(mmDecodeSql)))
}
