package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sketch.Sketch
import graft.text.{Bm25, Corpus}

/** Round-9 curation pack (part 3): nDCG retrieval eval, leakage-free
  * (cluster-aware) train/test splitting, the all-pairs source-overlap
  * matrix from KMV sketches, and content-defined chunking — registered
  * as its own trailing bench group (the r7 discipline), so established
  * groups keep their round-over-round rows.
  */
object Curate3Q extends QueryPack {

  /** The CDC chunk table feeds three queries (the dedup-debt report,
    * the pair generator, and the heavy-chunk audit) — built once per
    * (session, sfDir), timed by Bench as its own warm row. */
  private val cdcCache = graft.util.ManagedCaches.register()

  private def cdcChunks(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(cdcCache, spark, d)(
      Corpus.chunkCdc(Tables.documents(spark, d), "doc_id", "text",
        modulus = 17))

  override def warms: Seq[Q] = Seq(
    Q("cdc_chunk_build", (s, d) => cdcChunks(s, d), None))

  // ---------------------------------------------------------------- t_ndcg

  /** Rank discounts for nDCG@10 in basis points: disc(i) =
    * round(10⁴ / log₂(i+1)). Computed ONCE here and embedded as the SAME
    * integer literals in both the Spark plan and the DuckDB oracle — no
    * transcendental function ever runs inside either engine, so the
    * metric is integer-exact by construction (the `d_lsh_scurve`
    * fixed-literal discipline). */
  private val ndcgDisc: Seq[(Long, Long)] = (1 to 10).map(i =>
    i.toLong -> math.round(10000.0 / (math.log(i + 1.0) / math.log(2.0))))

  /** Ideal-DCG prefix sums: idcg(m) = Σ_{i=1..m} disc(i) for
    * m = 0..10 — joined EQUI on m = least(n_rel, 10), so the ideal
    * ranking never needs a non-equi join against the discount table. */
  private val ndcgIdcg: Seq[(Long, Long)] =
    (0 to 10).map(m => m.toLong -> ndcgDisc.take(m).map(_._2).sum)

  /** nDCG@10 of the BM25 batch ranking against the all-terms-present
    * relevance oracle — completes the rank-eval family (`t_mrr` = first
    * hit, `t_rank_eval` = MAP/P@10/R@10, this = graded position
    * discounting). Query 4 matches nothing → the n_rel=0 / ndcg=0 row
    * is oracle-covered.
    *
    * Scale shape: one postings pass for the ranking (k=10 keeps only the
    * per-query top-10 via TakeOrderedAndProject-style windows), a
    * |queries|-bounded relevance join, and two ≤11-row broadcast literal
    * tables (discounts, IDCG prefix sums). The corpus is never globally
    * sorted. */
  private def tNdcg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val queries = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "merge"),
      (2L, "join"), (2L, "scan"),
      (3L, "stream"), (3L, "window"), (3L, "sort"),
      (4L, "zzz_unseen_term")) // matches nothing: the all-zero row
      .toDF("query_id", "term")
    val docs = Tables.documents(spark, d)
    val index = Bm25.buildIndex(docs)
    val ranked = Bm25.scoreBatchFromIndex(index, queries, k = 10,
      docLengths = Some(Bm25.docLengths(docs)))
    val discDf = ndcgDisc.toDF("i", "disc_bp")
    val idcgDf = ndcgIdcg.toDF("m", "idcg_bp")
    val dtoks = index.select("doc_id", "tok")
    val q = queries.select(col("query_id"), col("term").as("tok")).distinct()
    val qn = q.groupBy("query_id").agg(count(lit(1)).as("nt"))
    val rel = dtoks.join(q, Seq("tok"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("m"))
      .join(qn, Seq("query_id"))
      .filter(col("m") === col("nt"))
      .select("query_id", "doc_id")
    val nr = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val dcg = ranked.join(rel, Seq("query_id", "doc_id"))
      .join(broadcast(discDf), col("rank") === col("i"))
      .groupBy("query_id").agg(sum(col("disc_bp")).as("dcg_bp"))
    q.select("query_id").distinct()
      .join(nr, Seq("query_id"), "left")
      .join(dcg, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("dcg_bp", coalesce(col("dcg_bp"), lit(0L)))
      .join(broadcast(idcgDf), least(col("n_rel"), lit(10L)) === col("m"))
      .select(col("query_id"), col("n_rel"), col("dcg_bp"), col("idcg_bp"),
        expr("CASE WHEN idcg_bp = 0 THEN cast(0 as bigint) " +
          "ELSE (dcg_bp * 10000) div idcg_bp END").as("ndcg_bp"))
      .orderBy("query_id")
  }

  private val tNdcgSql = {
    val discVals = ndcgDisc
      .map { case (i, v) => s"(CAST($i AS BIGINT), CAST($v AS BIGINT))" }
      .mkString(", ")
    val idcgVals = ndcgIdcg
      .map { case (m, v) => s"(CAST($m AS BIGINT), CAST($v AS BIGINT))" }
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, SUM(dlen) AS tot FROM dl),
       q(query_id, tok) AS (VALUES
         (CAST(1 AS BIGINT), 'vector'), (1, 'hash'), (1, 'merge'),
         (2, 'join'), (2, 'scan'),
         (3, 'stream'), (3, 'window'), (3, 'sort'),
         (4, 'zzz_unseen_term')),
       disc(i, disc_bp) AS (VALUES $discVals),
       idcg(m, idcg_bp) AS (VALUES $idcgVals),
       dft AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
               WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
       tf AS (SELECT doc_id, tok, COUNT(*) AS tfreq FROM toks
              WHERE tok IN (SELECT tok FROM q) GROUP BY 1, 2),
       scored AS (SELECT q.query_id, tf.doc_id,
             CAST(round(
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tfreq AS DOUBLE) * 2.2)
                  / (CAST(tfreq AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dlen AS DOUBLE)
                         / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
               6) AS DECIMAL(18,6)) AS contrib
           FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id)
                JOIN q USING (tok)
           CROSS JOIN stats),
       agg AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS DOUBLE) AS score
               FROM scored GROUP BY 1, 2),
       rk AS (SELECT query_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS rnk
              FROM agg),
       dtoks AS (SELECT DISTINCT doc_id, tok FROM toks),
       qn AS (SELECT query_id, COUNT(DISTINCT tok) AS nt FROM q GROUP BY 1),
       rel AS (SELECT q.query_id, dt.doc_id
               FROM dtoks dt JOIN q ON dt.tok = q.tok
               JOIN qn ON qn.query_id = q.query_id
               GROUP BY q.query_id, dt.doc_id, qn.nt
               HAVING COUNT(*) = qn.nt),
       nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
              FROM rel GROUP BY 1),
       dcg AS (SELECT query_id, CAST(SUM(disc_bp) AS BIGINT) AS dcg_bp
               FROM rk JOIN rel USING (query_id, doc_id)
               JOIN disc ON rk.rnk = disc.i
               WHERE rnk <= 10 GROUP BY 1)
       SELECT query_id,
              COALESCE(n_rel, 0) AS n_rel,
              COALESCE(dcg_bp, 0) AS dcg_bp,
              idcg_bp,
              CAST(CASE WHEN idcg_bp = 0 THEN 0
                        ELSE (COALESCE(dcg_bp, 0) * 10000) // idcg_bp
                   END AS BIGINT) AS ndcg_bp
       FROM (SELECT DISTINCT query_id FROM q) qq
       LEFT JOIN nr USING (query_id)
       LEFT JOIN dcg USING (query_id)
       JOIN idcg ON LEAST(COALESCE(n_rel, 0), 10) = idcg.m
       ORDER BY query_id"""
  }

  // -------------------------------------------------------- c_split_leakfree

  /** Leakage-free train/val/test split: documents in the same near-dup
    * CLUSTER always land in the same split. A plain per-doc hash split
    * ([[Corpus.splitByHash]]) puts ~20% of each near-dup cluster's
    * members in val/test — the eval then grades the model on paraphrases
    * of its own training data, the classic inflated-benchmark failure.
    * Here the split key is the cluster representative (min doc_id label
    * from the MinHash-LSH connected components) for clustered docs and
    * the doc's own id otherwise, so the md5 bucket decides per CLUSTER
    * (DedupSpec asserts zero straddling pairs).
    *
    * Scale shape: the CC label set is |clustered docs| rows (built by the
    * banded-LSH + fixpoint path audited in `d_cc`); the split itself is
    * the same zero-shuffle hash projection as `c_split_hash`, and
    * late-arriving members of a KNOWN cluster still route to the
    * cluster's split — reproducible at any corpus size. */
  private def cSplitLeakfree(spark: SparkSession, d: String): DataFrame = {
    val cc = DedupQ.ccLabels(spark, d)
    Tables.documents(spark, d).select("doc_id")
      .join(cc, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("b", Corpus.hashBucket(col("split_key"), 100))
      .select(col("doc_id"), col("split_key"),
        when(col("b") < 80, "train")
          .when(col("b") < 90, "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  private val cSplitLeakfreeSql =
    s"""${DedupQ.dCcCtes},
       cc AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
              FROM reach GROUP BY u),
       s AS (SELECT d.doc_id,
                    COALESCE(cc.cluster_id, d.doc_id) AS split_key
             FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id)
       SELECT doc_id, split_key,
              CASE WHEN b < 80 THEN 'train'
                   WHEN b < 90 THEN 'val'
                   ELSE 'test' END AS split
       FROM (SELECT doc_id, split_key,
                    CAST(('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 AS b
             FROM s) t
       ORDER BY doc_id"""

  // ------------------------------------------------------- sk_source_overlap

  /** All-pairs source-overlap matrix ([[Sketch.kmvJaccardMatrix]], k=128)
    * over the documents table's 20 sources — the cross-source
    * contamination dial (see the kernel's scaladoc for the O(pairs·k)
    * scale argument). The oracle replays the naive per-source bottom-k,
    * which [[Sketch.kmvSketchBy]] is provably bit-identical to. */
  private def skSourceOverlap(spark: SparkSession, d: String): DataFrame =
    Sketch.kmvJaccardMatrix(
        Tables.documents(spark, d)
          .select(col("source").as("g"),
            explode(split(col("text"), " ")).as("tok")),
        k = 128)
      .orderBy("src_a", "src_b")

  private val skSourceOverlapSql =
    """WITH toks AS (SELECT source AS g, UNNEST(string_split(text, ' ')) AS tok
                    FROM documents),
       hs AS (SELECT DISTINCT g,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
              FROM toks),
       sk AS (SELECT g, h FROM (
                SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS r
                FROM hs) t
              WHERE r <= 128),
       srcs AS (SELECT DISTINCT g FROM sk),
       p AS (SELECT a.g AS src_a, b.g AS src_b
             FROM srcs a JOIN srcs b ON a.g < b.g),
       u AS (SELECT src_a, src_b, h, MAX(ia) AS ia, MAX(ib) AS ib FROM (
               SELECT p.src_a, p.src_b, s.h, 1 AS ia, 0 AS ib
               FROM p JOIN sk s ON s.g = p.src_a
               UNION ALL
               SELECT p.src_a, p.src_b, s.h, 0 AS ia, 1 AS ib
               FROM p JOIN sk s ON s.g = p.src_b) e
             GROUP BY 1, 2, 3),
       m AS (SELECT * FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b
                         ORDER BY h) AS r
               FROM u) t
             WHERE r <= 128)
       SELECT src_a, src_b,
              CAST(COUNT(*) AS BIGINT) AS k_eff,
              CAST(SUM(ia * ib) AS BIGINT) AS n_inter,
              CAST((SUM(ia * ib) * 10000) // COUNT(*) AS BIGINT) AS jacc_bp
       FROM m GROUP BY 1, 2 ORDER BY 1, 2"""

  // ----------------------------------------------------------- c_chunk_cdc

  /** Content-defined chunking of the documents table
    * ([[Corpus.chunkCdc]], modulus 17 ⇒ ~17-token expected chunks) —
    * boundaries are a function of local CONTENT, so edits above a chunk
    * never invalidate its hash (the kernel's scaladoc carries the LBFS
    * argument and the one-partition scale shape; Curate3Spec asserts
    * the shift-invariance law). */
  private def cChunkCdc(spark: SparkSession, d: String): DataFrame =
    cdcChunks(spark, d).orderBy("doc_id", "chunk_id")

  private val cChunkCdcSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       p AS (SELECT doc_id, t, UNNEST(range(1, len(t) + 1)) AS pos FROM toks),
       tok AS (SELECT doc_id, pos, t[pos] AS tok,
                      CASE WHEN pos > 1 THEN t[pos - 1] ELSE NULL END AS prev
               FROM p),
       b AS (SELECT doc_id, pos, tok,
                    CASE WHEN prev IS NOT NULL AND
                      CAST(('0x' || substr(md5(prev || ' ' || tok), 1, 8))
                        AS BIGINT) % 17 = 0
                    THEN 1 ELSE 0 END AS bnd
             FROM tok),
       c AS (SELECT doc_id, pos, tok,
                    SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos)
                      AS chunk_id
             FROM b)
       SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
              CAST(MIN(pos) - 1 AS BIGINT) AS start_pos,
              CAST(COUNT(*) AS BIGINT) AS n_tok,
              md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
       FROM c GROUP BY doc_id, chunk_id
       ORDER BY doc_id, chunk_id"""

  // ------------------------------------------------------------ d_cdc_dedup

  /** Chunk-level dedup report over the CDC chunking — the ACTION
    * [[Corpus.chunkCdc]] exists for: per SOURCE, how many chunk
    * occurrences are duplicates of a chunk seen earlier (first
    * occurrence by (doc_id, start_pos) — global, cross-doc AND
    * within-doc) and the token mass chunk-level dedup would reclaim.
    * This is strictly finer-grained than doc-level near-dup
    * (`d_dedup_debt`): boilerplate headers/footers shared across
    * otherwise-distinct pages show up here and nowhere else.
    *
    * Scale shape: the CDC pass (one partition by doc), ONE shuffle on
    * chunk_hash for the first-occurrence window, and a |chunks|-row
    * equi-join back to (doc_id, source). Duplicate attribution goes to
    * the occurrence's OWN source (the `d_dedup_debt` discipline). */
  private def dCdcDedup(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val cdc = cdcChunks(spark, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chunk_hash")
      .orderBy(col("doc_id").asc, col("start_pos").asc)
    cdc.withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_dup_chunks"),
        sum(col("n_tok")).as("tok_removable"))
      .orderBy("source")
  }

  private val dCdcDedupSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       p AS (SELECT doc_id, t, UNNEST(range(1, len(t) + 1)) AS pos FROM toks),
       tok AS (SELECT doc_id, pos, t[pos] AS tok,
                      CASE WHEN pos > 1 THEN t[pos - 1] ELSE NULL END AS prev
               FROM p),
       b AS (SELECT doc_id, pos, tok,
                    CASE WHEN prev IS NOT NULL AND
                      CAST(('0x' || substr(md5(prev || ' ' || tok), 1, 8))
                        AS BIGINT) % 17 = 0
                    THEN 1 ELSE 0 END AS bnd
             FROM tok),
       c AS (SELECT doc_id, pos, tok,
                    SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos)
                      AS chunk_id
             FROM b),
       ch AS (SELECT doc_id, chunk_id,
                     CAST(MIN(pos) - 1 AS BIGINT) AS start_pos,
                     CAST(COUNT(*) AS BIGINT) AS n_tok,
                     md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
              FROM c GROUP BY doc_id, chunk_id),
       rk AS (SELECT doc_id, n_tok, chunk_hash,
                     ROW_NUMBER() OVER (PARTITION BY chunk_hash
                       ORDER BY doc_id, start_pos) AS rk
              FROM ch)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dup_chunks,
              CAST(SUM(n_tok) AS BIGINT) AS tok_removable
       FROM rk JOIN documents USING (doc_id)
       WHERE rk.rk > 1 GROUP BY source ORDER BY source"""

  // ------------------------------------------------------------ t_distinct_n

  /** Corpus diversity per source: distinct-n ratios for n ∈ {1,2,3} —
    * the templated-content dial (a source whose bigram diversity
    * collapses is boilerplate/spam even when its unigram mix looks
    * healthy; Li et al. 2016's distinct-n, applied to sources instead
    * of generations). n_grams totals come from LENGTH ARITHMETIC on one
    * scan (Σ max(len−n+1, 0) — the occurrence stream is never
    * exploded); distinct counts ride the per-doc distinct shingle
    * arrays ([[graft.dedup.Dedup.shinglesFast]], codegen'd) into a
    * per-source exact countDistinct — one (source, shingle) shuffle per
    * n, partial-agg collapsed. */
  private def tDistinctN(spark: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(spark, d).select(col("source"), col("text"))
    val tot = base
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("len"))
      .groupBy("source")
      .agg(sum(col("len")).as("g1"),
        sum(greatest(col("len") - 1, lit(0L))).as("g2"),
        sum(greatest(col("len") - 2, lit(0L))).as("g3"))
    val totN = tot.select(col("source"), lit(1L).as("n"), col("g1").as("n_grams"))
      .unionByName(tot.select(col("source"), lit(2L).as("n"), col("g2").as("n_grams")))
      .unionByName(tot.select(col("source"), lit(3L).as("n"), col("g3").as("n_grams")))
    def dn(n: Int): DataFrame = base
      .select(col("source"),
        explode(graft.dedup.Dedup.shinglesFast(col("text"), n)).as("sh"))
      .groupBy("source").agg(countDistinct(col("sh")).as("n_distinct"))
      .withColumn("n", lit(n.toLong))
    totN.join(dn(1).unionByName(dn(2)).unionByName(dn(3)), Seq("source", "n"))
      .withColumn("distinct_bp", expr("(n_distinct * 10000) div n_grams"))
      .orderBy("source", "n")
  }

  private val tDistinctNSql =
    """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
       tot AS (SELECT source,
                      CAST(SUM(len(t)) AS BIGINT) AS g1,
                      CAST(SUM(GREATEST(len(t) - 1, 0)) AS BIGINT) AS g2,
                      CAST(SUM(GREATEST(len(t) - 2, 0)) AS BIGINT) AS g3
               FROM toks GROUP BY 1),
       totn AS (SELECT source, CAST(1 AS BIGINT) AS n, g1 AS n_grams FROM tot
                UNION ALL
                SELECT source, 2, g2 FROM tot
                UNION ALL
                SELECT source, 3, g3 FROM tot),
       d1 AS (SELECT source, CAST(1 AS BIGINT) AS n,
                     CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct
              FROM (SELECT source, UNNEST(t) AS sh FROM toks) g GROUP BY 1),
       d2 AS (SELECT source, CAST(2 AS BIGINT) AS n,
                     CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct
              FROM (SELECT source,
                      UNNEST(list_transform(range(1, len(t)),
                        i -> t[i] || ' ' || t[i+1])) AS sh
                    FROM toks WHERE len(t) >= 2) g GROUP BY 1),
       d3 AS (SELECT source, CAST(3 AS BIGINT) AS n,
                     CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct
              FROM (SELECT source,
                      UNNEST(list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
                    FROM toks WHERE len(t) >= 3) g GROUP BY 1),
       dist AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2
                UNION ALL SELECT * FROM d3)
       SELECT source, n, n_grams, n_distinct,
              CAST((n_distinct * 10000) // n_grams AS BIGINT) AS distinct_bp
       FROM totn JOIN dist USING (source, n)
       ORDER BY source, n"""

  // ----------------------------------------------------------- e_attribution

  /** Multi-touch revenue attribution ([[graft.etl.Attribution.report]],
    * 1-hour lookback) — first/last-touch/linear per channel with the
    * unattributable mass as a 'direct' row; integer cents throughout.
    * The kernel's scaladoc carries the join shape;
    * [[graft.streaming.Relay.attributionStream]] is the incremental
    * twin, and Curate3Spec holds the conservation laws. */
  private def eAttribution(spark: SparkSession, d: String): DataFrame =
    graft.etl.Attribution.report(Tables.events(spark, d))
      .orderBy("channel")

  private val eAttributionSql =
    """WITH p AS (SELECT event_id AS pid, user_id, ts AS pts,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events WHERE event_type = 'purchase'),
       t AS (SELECT user_id, ts AS tts, event_id AS tid,
                    event_type AS tchannel
             FROM events WHERE event_type IN ('view', 'click', 'signup')),
       j AS (SELECT p.pid, p.cents, t.tts, t.tid, t.tchannel
             FROM p LEFT JOIN t ON p.user_id = t.user_id
               AND t.tts <= p.pts AND t.tts > p.pts - INTERVAL 1 HOUR),
       r AS (SELECT pid, cents, tchannel,
                    COUNT(tid) OVER (PARTITION BY pid) AS n,
                    ROW_NUMBER() OVER (PARTITION BY pid
                      ORDER BY tts ASC, tid ASC) AS ra,
                    ROW_NUMBER() OVER (PARTITION BY pid
                      ORDER BY tts DESC, tid DESC) AS rd
             FROM j)
       SELECT COALESCE(tchannel, 'direct') AS channel,
              CAST(SUM(CASE WHEN ra = 1 THEN cents ELSE 0 END) AS BIGINT)
                AS ft_cents,
              CAST(SUM(CASE WHEN rd = 1 THEN cents ELSE 0 END) AS BIGINT)
                AS lt_cents,
              CAST(SUM(CASE WHEN n = 0 THEN cents * 1000000
                            ELSE (cents * 1000000) // n END) AS BIGINT)
                AS lin_micro
       FROM r GROUP BY 1 ORDER BY 1"""

  // ---------------------------------------------- d_cdc_pairs / d_cdc_heavy

  /** The CDC chunk-table oracle chain (documents → boundaries → chunk
    * hashes → per-doc presence → per-hash doc counts), shared by the
    * pair generator and the heavy-chunk audit. */
  private val cdcPresCtes =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       p AS (SELECT doc_id, t, UNNEST(range(1, len(t) + 1)) AS pos FROM toks),
       tok AS (SELECT doc_id, pos, t[pos] AS tok,
                      CASE WHEN pos > 1 THEN t[pos - 1] ELSE NULL END AS prev
               FROM p),
       b AS (SELECT doc_id, pos, tok,
                    CASE WHEN prev IS NOT NULL AND
                      CAST(('0x' || substr(md5(prev || ' ' || tok), 1, 8))
                        AS BIGINT) % 17 = 0
                    THEN 1 ELSE 0 END AS bnd
             FROM tok),
       c AS (SELECT doc_id, pos, tok,
                    SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos)
                      AS chunk_id
             FROM b),
       ch AS (SELECT doc_id, chunk_id,
                     CAST(COUNT(*) AS BIGINT) AS n_tok,
                     md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
              FROM c GROUP BY doc_id, chunk_id),
       pres AS (SELECT DISTINCT chunk_hash, doc_id FROM ch),
       cnt AS (SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM pres GROUP BY 1)"""

  /** CDC-based near-dup candidate pairs: doc pairs sharing ≥ 2 distinct
    * duplicate chunks — an independent near-dup signal that catches
    * partial-overlap pages (a shared section, not a whole-doc
    * paraphrase) that MinHash-LSH's whole-doc Jaccard threshold misses.
    * Chunks present in MORE than `maxDocs`=8 documents are EXCLUDED
    * from pair generation (they are boilerplate, and would generate
    * C(n_docs, 2) pairs each — the classic stop-shingle blowup); the
    * exclusion is NOT silent: `d_cdc_heavy` reports exactly the dropped
    * hashes (the no-silent-caps discipline). Per eligible hash the pair
    * fan-out is ≤ C(8,2)=28 BY CONSTRUCTION, so pair volume is
    * O(|dup chunks|), never |docs|². */
  private def dCdcPairs(spark: SparkSession, d: String): DataFrame = {
    val present = cdcChunks(spark, d)
      .select("chunk_hash", "doc_id").distinct()
    val counts = present.groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_docs"))
    val elig = counts.filter(col("n_docs").between(2, 8))
      .select("chunk_hash")
    val e = present.join(elig, Seq("chunk_hash"), "left_semi")
    e.as("a").join(e.as("b"),
        col("a.chunk_hash") === col("b.chunk_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .orderBy("id_a", "id_b")
  }

  private val dCdcPairsSql =
    s"""$cdcPresCtes,
       elig AS (SELECT chunk_hash FROM cnt WHERE n_docs BETWEEN 2 AND 8),
       e AS (SELECT p.chunk_hash, p.doc_id FROM pres p
             WHERE p.chunk_hash IN (SELECT chunk_hash FROM elig))
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(COUNT(*) AS BIGINT) AS n_shared
       FROM e a JOIN e b
         ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
       GROUP BY 1, 2 HAVING COUNT(*) >= 2
       ORDER BY id_a, id_b"""

  /** The heavy-chunk audit: every chunk hash `d_cdc_pairs` EXCLUDED
    * (present in > 8 docs), with its spread and token size — the
    * boilerplate catalog (headers, footers, license blocks) that a
    * scrubbing pass would target directly. Keeping the cap visible is
    * the point: pair generation bounded + exclusions enumerated =
    * nothing silently dropped. */
  private def dCdcHeavy(spark: SparkSession, d: String): DataFrame = {
    val cdc = cdcChunks(spark, d)
    val present = cdc.select("chunk_hash", "doc_id").distinct()
    val heavy = present.groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 8)
    // identical hash ⇒ identical content ⇒ identical n_tok: min = the value
    val size = cdc.groupBy("chunk_hash").agg(min(col("n_tok")).as("n_tok"))
    heavy.join(size, Seq("chunk_hash"))
      .select("chunk_hash", "n_docs", "n_tok")
      .orderBy("chunk_hash")
  }

  private val dCdcHeavySql =
    s"""$cdcPresCtes,
       sz AS (SELECT chunk_hash, MIN(n_tok) AS n_tok FROM ch GROUP BY 1)
       SELECT chunk_hash, n_docs, CAST(n_tok AS BIGINT) AS n_tok
       FROM cnt JOIN sz USING (chunk_hash)
       WHERE n_docs > 8 ORDER BY chunk_hash"""

  // ---------------------------------------------------------- t_vocab_growth

  /** Heaps-law vocabulary growth per source: distinct types vs tokens
    * at the 25/50/75/100% document checkpoints (doc_id order) — a
    * source whose type curve flattens early is templated/repetitive; a
    * near-linear curve is open vocabulary (URLs, ids, code). The
    * measured growth CURVE, not a fitted exponent — no transcendental
    * ever runs (the `t_ndcg` discipline).
    *
    * Scale shape: one (source, type) shuffle for first-occurrence ranks
    * (min over a per-source window rank), a 20-row checkpoint dim
    * broadcast into two conditional aggs, and a 4-row-per-source melt.
    * The corpus is scanned twice (token mass; type first-ranks) and
    * never sorted globally. */
  private def tVocabGrowth(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy("doc_id")))
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val ck = ranked.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .select(col("source"),
        expr("n_docs div 4").as("c1"),
        expr("(n_docs * 2) div 4").as("c2"),
        expr("(n_docs * 3) div 4").as("c3"),
        col("n_docs").as("c4"))
    def tokSums(qc: String) =
      sum(when(col("rank") <= col(qc), col("n_tok")).otherwise(0L))
    val tokAt = ranked.join(broadcast(ck), Seq("source"))
      .groupBy("source")
      .agg(tokSums("c1").as("tok1"), tokSums("c2").as("tok2"),
        tokSums("c3").as("tok3"), tokSums("c4").as("tok4"))
    def tySums(qc: String) =
      sum(when(col("first_rank") <= col(qc), 1L).otherwise(0L))
    val tyAt = ranked
      .select(col("source"), col("rank"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("source", "tok").agg(min(col("rank")).as("first_rank"))
      .join(broadcast(ck), Seq("source"))
      .groupBy("source")
      .agg(tySums("c1").as("ty1"), tySums("c2").as("ty2"),
        tySums("c3").as("ty3"), tySums("c4").as("ty4"))
    val wide = tokAt.join(tyAt, Seq("source")).join(ck, Seq("source"))
    def qrow(q: Int) = wide.select(col("source"), lit(q.toLong).as("q"),
      col(s"c$q").cast("long").as("ckpt_docs"),
      col(s"tok$q").as("n_tokens"), col(s"ty$q").as("n_types"),
      expr(s"CASE WHEN tok$q = 0 THEN cast(0 as bigint) " +
        s"ELSE (ty$q * 10000) div tok$q END").as("types_per_tok_bp"))
    qrow(1).unionByName(qrow(2)).unionByName(qrow(3)).unionByName(qrow(4))
      .orderBy("source", "q")
  }

  private val tVocabGrowthSql =
    """WITH ranked AS (SELECT doc_id, source, text,
                ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                  AS rank,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
       ck AS (SELECT source,
                     COUNT(*) // 4 AS c1,
                     (COUNT(*) * 2) // 4 AS c2,
                     (COUNT(*) * 3) // 4 AS c3,
                     COUNT(*) AS c4
              FROM ranked GROUP BY 1),
       tokat AS (SELECT r.source,
                   SUM(CASE WHEN rank <= c1 THEN n_tok ELSE 0 END) AS tok1,
                   SUM(CASE WHEN rank <= c2 THEN n_tok ELSE 0 END) AS tok2,
                   SUM(CASE WHEN rank <= c3 THEN n_tok ELSE 0 END) AS tok3,
                   SUM(CASE WHEN rank <= c4 THEN n_tok ELSE 0 END) AS tok4
                 FROM ranked r JOIN ck USING (source) GROUP BY 1),
       fr AS (SELECT source, tok, MIN(rank) AS first_rank
              FROM (SELECT source, rank, UNNEST(string_split(text, ' ')) AS tok
                    FROM ranked) t
              WHERE tok <> '' GROUP BY 1, 2),
       tyat AS (SELECT f.source,
                  SUM(CASE WHEN first_rank <= c1 THEN 1 ELSE 0 END) AS ty1,
                  SUM(CASE WHEN first_rank <= c2 THEN 1 ELSE 0 END) AS ty2,
                  SUM(CASE WHEN first_rank <= c3 THEN 1 ELSE 0 END) AS ty3,
                  SUM(CASE WHEN first_rank <= c4 THEN 1 ELSE 0 END) AS ty4
                FROM fr f JOIN ck USING (source) GROUP BY 1),
       wide AS (SELECT * FROM tokat JOIN tyat USING (source)
                JOIN ck USING (source))
       SELECT source, CAST(q AS BIGINT) AS q,
              CAST(CASE q WHEN 1 THEN c1 WHEN 2 THEN c2
                          WHEN 3 THEN c3 ELSE c4 END AS BIGINT) AS ckpt_docs,
              CAST(CASE q WHEN 1 THEN tok1 WHEN 2 THEN tok2
                          WHEN 3 THEN tok3 ELSE tok4 END AS BIGINT) AS n_tokens,
              CAST(CASE q WHEN 1 THEN ty1 WHEN 2 THEN ty2
                          WHEN 3 THEN ty3 ELSE ty4 END AS BIGINT) AS n_types,
              CAST(CASE WHEN (CASE q WHEN 1 THEN tok1 WHEN 2 THEN tok2
                                     WHEN 3 THEN tok3 ELSE tok4 END) = 0 THEN 0
                   ELSE ((CASE q WHEN 1 THEN ty1 WHEN 2 THEN ty2
                                 WHEN 3 THEN ty3 ELSE ty4 END) * 10000)
                        // (CASE q WHEN 1 THEN tok1 WHEN 2 THEN tok2
                                   WHEN 3 THEN tok3 ELSE tok4 END)
                   END AS BIGINT) AS types_per_tok_bp
       FROM wide CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS q) qs
       ORDER BY source, q"""

  override def queries: Seq[Q] = Seq(
    Q("t_ndcg", tNdcg, Some(tNdcgSql)),
    Q("c_split_leakfree", cSplitLeakfree, Some(cSplitLeakfreeSql)),
    Q("sk_source_overlap", skSourceOverlap, Some(skSourceOverlapSql)),
    Q("c_chunk_cdc", cChunkCdc, Some(cChunkCdcSql)),
    Q("d_cdc_dedup", dCdcDedup, Some(dCdcDedupSql)),
    Q("t_distinct_n", tDistinctN, Some(tDistinctNSql)),
    Q("e_attribution", eAttribution, Some(eAttributionSql)),
    Q("t_vocab_growth", tVocabGrowth, Some(tVocabGrowthSql)),
    Q("d_cdc_pairs", dCdcPairs, Some(dCdcPairsSql)),
    Q("d_cdc_heavy", dCdcHeavy, Some(dCdcHeavySql)))
}
