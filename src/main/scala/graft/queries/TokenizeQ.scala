package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Unigram

/** Round-9 tokenizer pack: unigram-LM (SentencePiece-style) subword
  * segmentation as relational shortest path ([[graft.text.Unigram]]) —
  * vocabulary induction, per-word Viterbi segmentation, and per-doc
  * corpus encoding, all integer-exact so the DuckDB oracle replays the
  * derivation AND the DP (exhaustively, via a recursive CTE — the
  * oracle enumerates paths; the engine never does).
  *
  * Parameters (maxPieceLen = 4, minCount = 1500, maxWordLen = 8) are
  * tuned to the testdata corpus: whole-word pieces (freq ≤ ~1000) fall
  * below minCount, so the DP genuinely composes multi-piece
  * segmentations from shared substrings rather than memorizing words.
  */
object TokenizeQ extends QueryPack {

  private val MaxPieceLen = 4
  private val MinCount = 1500L
  private val MaxWordLen = 8

  private def wordFreq(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** The segmentation map feeds BOTH the map report and the corpus
    * encoder, and its Viterbi DP is the pack's whole cost — build it
    * once per (session, sfDir) as a managed checkpoint cache (the
    * DedupQ ccLabels discipline; checkpoint because the DP loop's
    * lineage is per-round). Bench times the build as its own warm row
    * so member rows measure query cost against the warm map. */
  private val segCache = graft.util.ManagedCaches.register()

  private def segMap(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.checkpointCache(segCache, spark, d) {
      val wf = wordFreq(spark, d)
      Unigram.segmentWords(wf,
        Unigram.pieceVocab(wf, MaxPieceLen, MinCount),
        MaxPieceLen, MaxWordLen)
    }

  override def warms: Seq[Q] = Seq(
    Q("unigram_seg_build", (s, d) => segMap(s, d), None))

  /** Shared oracle CTE prelude: word frequencies → substring pieces →
    * surviving vocabulary with integer costs. */
  private val vocabCtes =
    s"""wf AS (SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
            WHERE tok <> '' GROUP BY 1),
       sl AS (SELECT word, freq, s, l
              FROM wf, range(1, ${MaxWordLen + 1}) rs(s),
                   range(1, ${MaxPieceLen + 1}) rl(l)
              WHERE s + l - 1 <= len(word)),
       pieces AS (SELECT substr(word, s, l) AS piece, SUM(freq) AS pfreq
                  FROM sl GROUP BY 1),
       vocab AS (SELECT piece,
                   CAST(GREATEST(1, 40 - length(bin(pfreq))) AS BIGINT) AS cost
                 FROM pieces WHERE pfreq >= $MinCount OR len(piece) = 1)"""

  /** Recursive-CTE Viterbi replay: exhaustive path enumeration over the
    * word-position DAG, then the (cost, path)-lexicographic minimum per
    * word — the oracle-side mirror of [[Unigram.segmentWords]]'s DP. */
  private val segmentCtes =
    s"""$vocabCtes,
       vocab2 AS (SELECT piece, cost, len(piece) AS l FROM vocab),
       words AS (SELECT word FROM wf
                 WHERE len(word) BETWEEN 1 AND $MaxWordLen),
       paths(word, pos, cost, path) AS (
         SELECT word, 0, CAST(0 AS BIGINT), '' FROM words
         UNION ALL
         SELECT p.word, p.pos + v.l, p.cost + v.cost,
                CASE WHEN p.path = '' THEN v.piece
                     ELSE p.path || ' ' || v.piece END
         FROM paths p JOIN vocab2 v
           ON substr(p.word, p.pos + 1, v.l) = v.piece
         WHERE p.pos + v.l <= len(p.word)),
       best AS (SELECT word, cost, path,
                  ROW_NUMBER() OVER (PARTITION BY word
                                     ORDER BY cost, path) AS r
                FROM paths WHERE pos = len(word))"""

  /** The induced piece vocabulary (piece, cost): whole corpus reduced
    * to the construction-bounded substring table — the broadcast side
    * of every later join. */
  private def tUnigramVocab(spark: SparkSession, d: String): DataFrame =
    Unigram.pieceVocab(wordFreq(spark, d), MaxPieceLen, MinCount)
      .orderBy("piece")

  private val tUnigramVocabSql =
    s"""WITH $vocabCtes
       SELECT piece, cost FROM vocab ORDER BY piece"""

  /** Per-word Viterbi segmentation (word, cost, n_pieces, pieces):
    * |distinct words| rows — the segmentation MAP, computed once and
    * broadcast for corpus encoding. */
  private def tUnigramSegments(spark: SparkSession, d: String): DataFrame =
    segMap(spark, d).orderBy("word")

  private val tUnigramSegmentsSql =
    s"""WITH RECURSIVE $segmentCtes
       SELECT word, cost,
              CAST(len(string_split(path, ' ')) AS BIGINT) AS n_pieces,
              path AS pieces
       FROM best WHERE r = 1 ORDER BY word"""

  /** Corpus encoding: every document's words joined against the
    * broadcast segmentation map, aggregated to (doc_id, n_words,
    * total_cost, total_pieces) — ONE corpus scan, one broadcast join,
    * one aggregate; the DP never touches the corpus. */
  private def tUnigramEncode(spark: SparkSession, d: String): DataFrame = {
    val seg = segMap(spark, d)
    Tables.documents(spark, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(seg), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("cost")).as("total_cost"),
        sum(col("n_pieces")).as("total_pieces"))
      .orderBy("doc_id")
  }

  private val tUnigramEncodeSql =
    s"""WITH RECURSIVE $segmentCtes,
       seg AS (SELECT word, cost,
                 CAST(len(string_split(path, ' ')) AS BIGINT) AS np
               FROM best WHERE r = 1),
       toks AS (SELECT doc_id, tok FROM
                  (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                   FROM documents) WHERE tok <> '')
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
              CAST(SUM(s.cost) AS BIGINT) AS total_cost,
              CAST(SUM(s.np) AS BIGINT) AS total_pieces
       FROM toks t JOIN seg s ON t.tok = s.word
       GROUP BY 1 ORDER BY 1"""

  /** Tokenizer fertility per source — pieces emitted per input word
    * under the unigram-LM tokenizer: the cost-of-tokenization dial that
    * decides which sources eat the token budget (code/URL-heavy sources
    * fragment worst). Rides the SAME broadcast segmentation map as the
    * encoder; one corpus scan, per-source partial aggs. fertility_bp =
    * total_pieces·10⁴ div total words. */
  private def tFertility(spark: SparkSession, d: String): DataFrame = {
    val seg = segMap(spark, d)
    Tables.documents(spark, d)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(seg), Seq("word"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("cost")).as("total_cost"))
      .withColumn("fertility_bp", expr("(n_pieces * 10000) div n_words"))
      .orderBy("source")
  }

  private val tFertilitySql =
    s"""WITH RECURSIVE $segmentCtes,
       seg AS (SELECT word, cost,
                 CAST(len(string_split(path, ' ')) AS BIGINT) AS np
               FROM best WHERE r = 1),
       toks AS (SELECT source, tok FROM
                  (SELECT source, unnest(string_split(text, ' ')) AS tok
                   FROM documents) WHERE tok <> '')
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
              CAST(SUM(s.np) AS BIGINT) AS n_pieces,
              CAST(SUM(s.cost) AS BIGINT) AS total_cost,
              CAST((SUM(s.np) * 10000) // COUNT(*) AS BIGINT) AS fertility_bp
       FROM toks t JOIN seg s ON t.tok = s.word
       GROUP BY 1 ORDER BY 1"""

  def queries: Seq[Q] = Seq(
    Q("t_unigram_vocab", tUnigramVocab, Some(tUnigramVocabSql)),
    Q("t_unigram_segments", tUnigramSegments, Some(tUnigramSegmentsSql)),
    Q("t_unigram_encode", tUnigramEncode, Some(tUnigramEncodeSql)),
    Q("t_fertility", tFertility, Some(tFertilitySql)))
}
