package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextRank

/** Round-9 TextRank pack: unsupervised per-document keyword extraction
  * as corpus-wide iterated relational rounds
  * ([[graft.text.TextRank.keywords]]) — the graph-text crossover the
  * keyword/tagging stage of a training-data pipeline needs. The oracle
  * unrolls all PageRank rounds with the integer fixed-point algebra
  * (`AS MATERIALIZED` per round — the BPE-unroll discipline).
  */
object Text2Q extends QueryPack {

  private val Iters = 5
  private val TopK = 3

  /** Top-3 TextRank keywords per document after 5 fixed-point rounds. */
  private def tTextrank(spark: SparkSession, d: String): DataFrame =
    TextRank.keywords(Tables.documents(spark, d), col("text"),
        iters = Iters, topK = TopK)
      .orderBy("doc_id", "rank")

  private def roundCte(i: Int): String =
    s"""c$i AS (SELECT e.doc_id, e.dst AS w, s.score // d.deg AS c
             FROM edges e
             JOIN s${i - 1} s ON e.doc_id = s.doc_id AND e.src = s.w
             JOIN deg d ON d.doc_id = e.doc_id AND d.src = e.src),
       s$i AS MATERIALIZED (SELECT doc_id, w,
                CAST(150000 + (85 * SUM(c)) // 100 AS BIGINT) AS score
              FROM c$i GROUP BY 1, 2)"""

  private val tTextrankSql =
    s"""WITH toks AS (SELECT doc_id, u.pos AS pos, u.w AS w
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
                 UNNEST(list_transform(range(len(t)),
                   p -> {'pos': p, 'w': t[p+1]})) AS r(u)),
       prs AS (SELECT doc_id,
                      LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS src,
                      w AS dst
               FROM toks),
       edges AS MATERIALIZED (SELECT DISTINCT doc_id, src, dst FROM (
                 SELECT doc_id, src, dst FROM prs
                 WHERE src IS NOT NULL AND src <> dst
                 UNION ALL
                 SELECT doc_id, dst AS src, src AS dst FROM prs
                 WHERE src IS NOT NULL AND src <> dst)),
       deg AS MATERIALIZED (SELECT doc_id, src,
                CAST(COUNT(*) AS BIGINT) AS deg
              FROM edges GROUP BY 1, 2),
       s0 AS (SELECT doc_id, src AS w, CAST(1000000 AS BIGINT) AS score
              FROM deg),
       ${(1 to Iters).map(roundCte).mkString(",\n")}
       SELECT doc_id, rank, word, score FROM (
         SELECT doc_id, w AS word, score,
                CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, w) AS INT) AS rank
         FROM s$Iters) t
       WHERE rank <= $TopK ORDER BY doc_id, rank"""

  def queries: Seq[Q] = Seq(
    Q("t_textrank", tTextrank, Some(tTextrankSql)))
}
