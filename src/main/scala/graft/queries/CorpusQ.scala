package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.{Corpus, Text}

/** Corpus-management coverage over `documents` (LLM-data-pipeline
  * extension): deterministic train/val/test split, stratified per-source
  * capping, token-budget chunking. All md5/window-deterministic → exact
  * DuckDB oracles.
  */
object CorpusQ extends QueryPack {

  /** 80/10/10 split by doc_id hash: per-(lang, split) counts — the shape
    * a split audit dashboard reads. Split membership is a pure function
    * of the key, reproducible on any engine or partitioning. */
  private def cSplit(spark: SparkSession, d: String): DataFrame =
    Corpus.splitByHash(Tables.documents(spark, d), "doc_id")
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")

  private val cSplitSql =
    """WITH s AS (
         SELECT lang,
                CASE WHEN b < 80 THEN 'train'
                     WHEN b < 90 THEN 'val'
                     ELSE 'test' END AS split
         FROM (SELECT lang,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 100 AS b
               FROM documents) t)
       SELECT lang, split, COUNT(*) AS n_docs
       FROM s GROUP BY 1, 2 ORDER BY lang, split"""

  /** Stratified cap: at most 15 docs per source, chosen by md5-rank of
    * doc_id (deterministic source balancing). */
  private def cStratified(spark: SparkSession, d: String): DataFrame =
    Corpus.stratifiedCap(Tables.documents(spark, d), "source", "doc_id", 15)
      .select("doc_id", "source")
      .orderBy("doc_id")

  private val cStratifiedSql =
    """SELECT doc_id, source FROM (
         SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r
         FROM documents) t
       WHERE r <= 15 ORDER BY doc_id"""

  /** Token-budget chunking: space-split token counts (the t_tokens
    * convention), contiguous by doc_id within each source, ~2000-token
    * chunks; per-chunk doc/token totals. */
  private def cChunks(spark: SparkSession, d: String): DataFrame =
    Corpus.chunkByTokenBudget(
        Tables.documents(spark, d)
          .select(col("doc_id"), col("source"),
            size(Text.tokens(col("text"))).cast("long").as("n_tokens")),
        "source", "doc_id", "n_tokens", budget = 2000)
      .groupBy("source", "chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("chunk_tokens"))
      .orderBy("source", "chunk_id")

  private val cChunksSql =
    """WITH toks AS (
         SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         FROM documents),
       cums AS (
         SELECT doc_id, source, n_tokens,
                SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS cum
         FROM toks)
       SELECT source,
              CAST(FLOOR((cum - n_tokens) / 2000) AS BIGINT) AS chunk_id,
              COUNT(*) AS n_docs,
              CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens
       FROM cums GROUP BY 1, 2 ORDER BY source, chunk_id"""

  /** Exact greedy sequence packing into 512-token bins over 8 id-hash
    * shards; the oracle replays the per-shard greedy fold as a recursive
    * CTE, so bin assignments are value-checked, not just counted. */
  private def cPack(spark: SparkSession, d: String): DataFrame =
    Corpus.packGreedy(Tables.documents(spark, d), budget = 512, shards = 8)
      .orderBy("doc_id")

  private val cPackSql =
    """WITH RECURSIVE
       lens AS (SELECT doc_id, doc_id % 8 AS shard,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS len
            FROM documents),
       t AS (SELECT doc_id, shard, len,
              ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
            FROM lens),
       fill AS (
         SELECT shard, rn, doc_id, len, CAST(0 AS BIGINT) AS bin, len AS cum
         FROM t WHERE rn = 1
         UNION ALL
         SELECT t.shard, t.rn, t.doc_id, t.len,
                CASE WHEN f.cum + t.len > 512 THEN f.bin + 1 ELSE f.bin END,
                CASE WHEN f.cum + t.len > 512 THEN t.len ELSE f.cum + t.len END
         FROM fill f JOIN t ON t.shard = f.shard AND t.rn = f.rn + 1)
       SELECT doc_id, shard, bin, len AS n_tokens
       FROM fill ORDER BY doc_id"""

  /** Weighted epoch mixing: high-priority sources (src0-src2) run 2.5
    * epochs, the mid tier 1.0, the tail 0.4 — [[Corpus.mixSources]]
    * turns the weights into deterministic copy multiplicities (full
    * copies + md5-bucket fractional slice, no RNG). Output is the
    * mixed stream's (doc_id, source, copy) manifest. */
  private def cMix(spark: SparkSession, d: String): DataFrame = {
    val idx = substring(col("source"), 4, 10).cast("int")
    val wpct = when(idx < 3, 250L).when(idx < 10, 100L).otherwise(40L)
    Corpus.mixSources(
        Tables.documents(spark, d).select(col("doc_id"), col("source")),
        wpct, "doc_id")
      .select("doc_id", "source", "copy")
      .orderBy("doc_id", "copy")
  }

  private val cMixSql =
    """WITH w AS (SELECT doc_id, source,
                CASE WHEN CAST(substr(source, 4) AS INT) < 3 THEN 250
                     WHEN CAST(substr(source, 4) AS INT) < 10 THEN 100
                     ELSE 40 END AS wpct,
                CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 100 AS b
              FROM documents),
       cop AS (SELECT doc_id, source,
                wpct // 100 + CASE WHEN b < wpct % 100 THEN 1 ELSE 0 END AS copies
              FROM w)
       SELECT doc_id, source, u.copy
       FROM cop, UNNEST(generate_series(0, copies - 1)) AS u(copy)
       WHERE copies > 0
       ORDER BY doc_id, copy"""

  override def queries: Seq[Q] = Seq(
    Q("c_split_hash", cSplit, Some(cSplitSql)),
    Q("c_mix", cMix, Some(cMixSql)),
    Q("c_stratified_cap", cStratified, Some(cStratifiedSql)),
    Q("c_chunk_budget", cChunks, Some(cChunksSql)),
    Q("c_pack", cPack, Some(cPackSql)))
}
