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

  /** Perceptual near-dup over media payloads ([[Multimodal.aHashNearDupPairs]]):
    * each document payload gets a "re-encoded" twin (two bytes appended —
    * the few-byte perturbation a re-encode of the same image produces),
    * and the banded 32-bit aHash join must find the twins again. Output:
    * the verified-pair histogram by Hamming distance with the twin pairs
    * attributed (`n_twins`). The deliberate recall story: a twin whose
    * payload growth shifts the frame-chunk grid (length crossing a
    * multiple of 32) hashes differently everywhere — the known aHash
    * failure mode, REPORTED by the histogram rather than hidden. */
  private def mmAhashPairs(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val base = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val twins = Multimodal.asMedia(
      docs.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" x")).as("text")),
      "doc_id", "text", "text/plain")
    Multimodal.aHashNearDupPairs(base.unionByName(twins))
      .withColumn("is_twin",
        when(col("id_b") === col("id_a") + 100000L, 1L).otherwise(0L))
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"), sum(col("is_twin")).as("n_twins"))
      .orderBy("hamming")
  }

  private val mmAhashPairsSql =
    """WITH m AS (SELECT doc_id AS media_id, text AS payload FROM documents
              UNION ALL
              SELECT doc_id + 100000, text || ' x' FROM documents),
       codes AS (SELECT media_id,
                list_transform(string_split(payload, ''),
                  c -> CAST(ascii(c) AS BIGINT)) AS cs,
                length(payload) AS n
         FROM m),
       fr AS (SELECT media_id, unnest(range(0, 32)) AS frame_idx,
                     cs, n, greatest(n // 32, 1) AS chunk
              FROM codes),
       ck AS (SELECT media_id, frame_idx,
                     CAST(list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         cs[(frame_idx * chunk) + 1 :
                            least((frame_idx + 1) * chunk, n)]),
                       (a, b) -> (a * 31 + b) & 2147483647) AS BIGINT) AS c
              FROM fr WHERE frame_idx * chunk < n),
       ag AS (SELECT media_id, COUNT(*) AS nf, SUM(c) AS s
              FROM ck GROUP BY 1),
       bits AS (SELECT ck.media_id, frame_idx,
                       CASE WHEN c * nf > s THEN 1 ELSE 0 END AS b
                FROM ck JOIN ag USING (media_id)),
       h AS (SELECT media_id,
                    CAST(SUM(b * (CAST(1 AS BIGINT) << frame_idx)) AS BIGINT)
                      AS ahash
             FROM bits GROUP BY 1),
       bd AS (SELECT media_id, ahash, unnest(range(0, 4)) AS band FROM h),
       bv AS (SELECT media_id, ahash, band,
                     (ahash >> (band * 8)) & 255 AS v
              FROM bd),
       cand AS (SELECT DISTINCT x.media_id AS id_a, y.media_id AS id_b,
                       x.ahash AS ha, y.ahash AS hb
                FROM bv x JOIN bv y
                  ON x.band = y.band AND x.v = y.v
                     AND x.media_id < y.media_id),
       pr AS (SELECT id_a, id_b,
                     CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
              FROM cand WHERE bit_count(xor(ha, hb)) <= 3)
       SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(SUM(CASE WHEN id_b = id_a + 100000 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_twins
       FROM pr GROUP BY 1 ORDER BY hamming"""

  override def queries: Seq[Q] = Seq(
    Q("mm_ahash_pairs", mmAhashPairs, Some(mmAhashPairsSql)),
    Q("mm_decode", mmDecode, Some(mmDecodeSql)),
    Q("mm_frames", mmFrames, Some(mmFramesSql)),
    Q("mm_resize", mmResize, Some(mmResizeSql)))
}
