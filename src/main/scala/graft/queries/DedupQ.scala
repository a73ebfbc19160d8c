package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.Text

/** Deduplication coverage over `documents` (LLM-data-pipeline extension):
  * exact, n-gram Jaccard, MinHash+LSH, SimHash — all md5-based so the
  * DuckDB oracle reproduces every hash bit-for-bit.
  */
object DedupQ extends QueryPack {

  /** The MinHash-LSH pair set feeds two queries (the pair report and the
    * cluster assignment), so it's built once per (session, sfDir) as a
    * managed cache — same intra-group reuse discipline as the silver
    * fact cache; Bench clears it at the dedup group boundary. */
  private val pairCache = graft.util.ManagedCaches.register()

  private def lshPairs(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.cache(pairCache, spark, d)(
      Dedup.minhashLshPairs(Tables.documents(spark, d), "doc_id", "text",
        n = 3, k = 16, bands = 4, threshold = 0.8))

  /** Exact dedup by bag-of-words fingerprint: deterministic min-id survivor
    * per content group (446 survivors of 500 docs at sf0.01). */
  private def dExact(spark: SparkSession, d: String): DataFrame =
    Dedup.exactDedup(
        Tables.documents(spark, d)
          .withColumn("fingerprint", Text.bagOfWordsFingerprint(col("text"))),
        col("fingerprint"), "doc_id")
      .select("doc_id", "lang", "source", "fingerprint")
      .orderBy("doc_id")

  private val dExactSql =
    """WITH f AS (
         SELECT doc_id, lang, source,
                md5(list_aggregate(list_sort(list_distinct(string_split(text, ' '))),
                    'string_agg', ' ')) AS fingerprint
         FROM documents)
       SELECT doc_id, lang, source, fingerprint
       FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY fingerprint) AS m FROM f) t
       WHERE doc_id = m ORDER BY doc_id"""

  /** All-pairs 3-gram Jaccard near-dup join at θ=0.8 (exact baseline; the
    * LSH query below is the scale path). */
  private def dJaccard(spark: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, d), "doc_id", "text",
        n = 3, threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** PPJoin-style PREFIX-FILTERED exact Jaccard — the 100 TB answer to
    * `d_jaccard_pairs`' deliberately naive all-pairs shape FOR LARGE-
    * VOCABULARY corpora: candidates come from each document's rarest-
    * shingle prefix only (provably lossless at the threshold), so the
    * self-join's cost tracks rare-shingle postings, not hot-posting
    * df². Its winning regime needs rare shingles to exist — the base
    * testdata corpus has none (27 k distinct shingles over 50 k sf1
    * docs, min df ≈ 50), so here it roughly ties the naive join; the
    * `d_jaccard_ab_*` pair below A/Bs both plans on a derived slice
    * with a realistic rare-shingle tail, where the filter wins
    * outright. Output is IDENTICAL to `d_jaccard_pairs` (same rows,
    * same hash — the oracle SQL is verbatim the naive oracle), which
    * is exactly the point: the scale path must not change answers. */
  private def dJaccardPrefix(spark: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairsPrefix(Tables.documents(spark, d), "doc_id", "text",
        n = 3, threshold = 0.8)
      .orderBy("id_a", "id_b")

  private val dJaccardSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
              FROM toks WHERE len(t) >= 3),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT id_a, id_b,
              CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       FROM inter
       JOIN sizes sa ON id_a = sa.doc_id
       JOIN sizes sb ON id_b = sb.doc_id
       WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
       ORDER BY id_a, id_b"""

  /** The DUPLICATE-HEAVY LARGE-VOCABULARY bench slice for the
    * naive-vs-prefix A/B — the regime the prefix filter exists for,
    * derived deterministically from `documents` (both engines replay
    * it): every doc gets 16 doc-unique suffix tokens (a Zipfian rare
    * tail: the ~18 suffix trigrams are df ≤ 2 where the base corpus
    * has NO rare shingles, min df ≈ 50 — which is why a rarest-first
    * prefix cannot help there), and every 5th doc is duplicated
    * verbatim under doc_id + 10⁹ — far above the testdata's
    * replica-offset id space, which reaches 9·10⁷ at sf1 (a +10⁷
    * offset COLLIDED there: one id, two texts, and the two engines
    * dedup shingles across the collision differently). At τ = 0.8 a
    * ~90-shingle doc's prefix is ~19 slots, so the suffix shingles
    * FILL the prefix — candidates collapse to true duplicate pairs
    * while the naive join still pays the hot head's Σ df². Letters
    * a..p, id appended (the copy keeps the ORIGINAL id's tokens — it
    * must share them). */
  private val UqTokens = ('a' to 'p').toSeq

  private[graft] def dupHeavy(docs: DataFrame): DataFrame = {
    val t = concat(col("text") +:
      UqTokens.flatMap(c => Seq(lit(s" uq$c"), col("doc_id"))): _*)
    // Loud guard (the triangleCounts raise_error discipline, zero extra
    // jobs): at a scale factor whose replica-offset doc_ids reach 10⁹
    // the +10⁹ copy offset would COLLIDE again (the exact bug class the
    // r12 sf1 hash check caught at +10⁷) — fail at scan time instead of
    // silently diverging the two engines' shingle dedup.
    val id = when(col("doc_id") >= lit(1000000000L), raise_error(
        lit("dupHeavy: doc_id >= 1e9 collides with the +1e9 copy offset")))
      .otherwise(col("doc_id"))
    docs.select(id.as("doc_id"), t.as("text"))
      .unionAll(docs.filter(col("doc_id") % 5 === 0)
        .select((id + 1000000000L).as("doc_id"), t.as("text")))
  }

  private def dJaccardAbNaive(spark: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(dupHeavy(Tables.documents(spark, d)),
        "doc_id", "text", n = 3, threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** dictVocabMax = 0 pins the PREFIX branch: the A/B must measure the
    * prefix filter itself (and the correctness gate must exercise it),
    * not the adaptive default, which would pick the dictionary plan
    * whenever the derived corpus stays under the broadcast cap. */
  private def dJaccardAbPrefix(spark: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairsPrefix(dupHeavy(Tables.documents(spark, d)),
        "doc_id", "text", n = 3, threshold = 0.8, dictVocabMax = 0L)
      .orderBy("id_a", "id_b")

  /** One oracle for BOTH A/B rows (they must be row- and hash-identical
    * — the A/B measures plans, not answers): the naive join over the
    * derived corpus. */
  private val dJaccardAbSql = {
    val sfx = UqTokens.map(c => s"' uq$c' || doc_id").mkString(" || ")
    s"""WITH corpus AS (
         SELECT doc_id, text || $sfx AS text
         FROM documents
         UNION ALL
         SELECT doc_id + 1000000000, text || $sfx
         FROM documents WHERE doc_id % 5 = 0),
       toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
              FROM toks WHERE len(t) >= 3),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
                 FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT id_a, id_b,
              CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       FROM inter
       JOIN sizes sa ON id_a = sa.doc_id
       JOIN sizes sb ON id_b = sb.doc_id
       WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
       ORDER BY id_a, id_b"""
  }

  /** MinHash(k=16) + LSH(4 bands × 4 rows) with exact-Jaccard verification
    * at θ=0.8 — the 100 TB dedup path: candidates come from band-bucket
    * collisions, so the pairwise work is proportional to true duplicates,
    * not n². md5-minima signatures make the oracle exact. */
  private def dMinhashLsh(spark: SparkSession, d: String): DataFrame =
    lshPairs(spark, d).orderBy("id_a", "id_b")

  private val dMinhashSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
              FROM toks WHERE len(t) >= 3),
       mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || '|' || sh)) AS m
              FROM sh CROSS JOIN range(16) r(i) GROUP BY 1, 2),
       bands AS (SELECT doc_id, i // 4 AS band,
                        md5(string_agg(m, '|' ORDER BY i)) AS bucket
                 FROM mh GROUP BY 1, 2),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                     AND a.doc_id < b.doc_id),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       inter AS (SELECT id_a, id_b, COUNT(*) AS n_inter
                 FROM cand
                 JOIN sh a ON a.doc_id = id_a
                 JOIN sh b ON b.doc_id = id_b AND a.sh = b.sh
                 GROUP BY 1, 2)
       SELECT id_a, id_b,
              CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
       FROM inter
       JOIN sizes sa ON id_a = sa.doc_id
       JOIN sizes sb ON id_b = sb.doc_id
       WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
       ORDER BY id_a, id_b"""

  /** SimHash near-dup: 64-bit md5-vote simhash per doc, pairs at Hamming
    * distance ≤ 3 via 4×16-bit pigeonhole bands (65k buckets/band — the
    * scale-safe width). The oracle carries the signature as two 32-bit
    * halves because DuckDB's signed BIGINT can't shift into bit 63; the
    * output (hamming = popcount of the XOR) is representation-agnostic. */
  private def dSimhash(spark: SparkSession, d: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, d), "doc_id", "text",
        maxHamming = 3)
      .orderBy("id_a", "id_b")

  private val dSimhashSql =
    """WITH toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
                     FROM documents),
       th AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h
              FROM (SELECT doc_id, unnest(t) AS tok FROM toks)),
       votes AS (SELECT doc_id, j,
                        SUM(CAST((h >> j) & 1 AS BIGINT) * 2 - 1) AS vote
                 FROM th CROSS JOIN range(64) r(j) GROUP BY 1, 2),
       sims AS (SELECT doc_id,
                       SUM(CASE WHEN vote > 0 AND j < 32
                                THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS lo,
                       SUM(CASE WHEN vote > 0 AND j >= 32
                                THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END) AS hi
                FROM votes GROUP BY 1)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT)
                AS hamming
       FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
       ORDER BY id_a, id_b"""

  /** Duplicate-cluster assignment: MinHash-LSH pairs → connected
    * components → (doc_id, cluster_id = min id in the component). This is
    * the step that makes pairwise near-dup output actionable (keep one
    * doc per cluster); the oracle recomputes the SAME md5-exact pair set
    * and closes it transitively with a recursive CTE. */
  private val ccCache = graft.util.ManagedCaches.register()

  /** Cluster assignment, shared by the assignment report and the survivor
    * selection. checkpointCache: the fixpoint loop already truncates
    * lineage internally, and the cache keeps the SECOND consumer from
    * re-running the whole iteration. (private[queries]: Curate3Q's
    * leakage-free split consumes the same labels — rebuilt in its own
    * bench group, so DedupQ's rows keep their r8 attribution.) */
  private[queries] def ccLabels(spark: SparkSession, d: String): DataFrame =
    graft.util.ManagedCaches.checkpointCache(ccCache, spark, d)(
      Dedup.connectedComponents(lshPairs(spark, d))
        .select(col("id").as("doc_id"), col("cluster_id")))

  private def dCc(spark: SparkSession, d: String): DataFrame =
    ccLabels(spark, d).orderBy("doc_id")

  /** The recursive pair-set + transitive-closure CTE chain, shared by the
    * cluster-assignment oracle and the survivor-selection oracle (and
    * Curate3Q's leakage-free-split oracle). */
  private[queries] val dCcCtes =
    """WITH RECURSIVE
       toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
              FROM toks WHERE len(t) >= 3),
       mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || '|' || sh)) AS m
              FROM sh CROSS JOIN range(16) r(i) GROUP BY 1, 2),
       bands AS (SELECT doc_id, i // 4 AS band,
                        md5(string_agg(m, '|' ORDER BY i)) AS bucket
                 FROM mh GROUP BY 1, 2),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                     AND a.doc_id < b.doc_id),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       inter AS (SELECT id_a, id_b, COUNT(*) AS n_inter
                 FROM cand
                 JOIN sh a ON a.doc_id = id_a
                 JOIN sh b ON b.doc_id = id_b AND a.sh = b.sh
                 GROUP BY 1, 2),
       pairs AS (SELECT id_a, id_b
                 FROM inter
                 JOIN sizes sa ON id_a = sa.doc_id
                 JOIN sizes sb ON id_b = sb.doc_id
                 WHERE CAST(n_inter AS DOUBLE)
                       / (sa.n_sh + sb.n_sh - n_inter) >= 0.8),
       edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                 UNION ALL
                 SELECT id_b, id_a FROM pairs),
       reach AS (SELECT u, v FROM edges
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)"""

  private val dCcSql =
    s"""$dCcCtes
       SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
       FROM reach GROUP BY u ORDER BY doc_id"""

  /** Survivor selection — the dedup ACTION the cluster assignment exists
    * for: per duplicate cluster, keep the highest-quality member
    * (doc_id as the deterministic tiebreak) and report the cluster size.
    * Quality joins in AFTER clustering on |clustered docs| rows; the
    * per-cluster argmax is one row_number window over tiny groups. */
  private def dCcKeep(spark: SparkSession, d: String): DataFrame = {
    val enStop = Text.langStopwords.toMap.apply("en")
    val cc = ccLabels(spark, d)
    val scored = cc.join(
      Tables.documents(spark, d).select(col("doc_id"),
        Text.qualityStatsFast(col("text"), enStop).getField("quality")
          .as("quality")),
      Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("quality").desc, col("doc_id"))
    scored
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("survivor_id"),
        col("n_members"), col("quality").as("best_quality"))
      .orderBy("cluster_id")
  }

  private val dCcKeepSql = {
    val stopList = Text.langStopwords.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""$dCcCtes,
       cc AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
              FROM reach GROUP BY u),
       q AS (SELECT doc_id,
               (CAST(len(list_distinct(t)) AS DOUBLE) / len(t)) * 0.5
                 + (CAST(len(list_filter(t, x -> list_contains($stopList, x)))
                         AS DOUBLE) / len(t)) * 0.25
                 + (CASE WHEN len(t) BETWEEN 10 AND 1000
                         THEN 1.0 ELSE 0.5 END) * 0.25 AS quality
             FROM toks),
       scored AS (SELECT cc.doc_id, cluster_id, quality,
                         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
                  FROM cc JOIN q USING (doc_id))
       SELECT cluster_id, doc_id AS survivor_id, n_members,
              quality AS best_quality
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                       ORDER BY quality DESC, doc_id) AS rk FROM scored)
       WHERE rk = 1 ORDER BY cluster_id"""
  }

  /** Dedup-debt accounting — the business report the cluster assignment
    * feeds: per SOURCE, how many documents and tokens would deduplication
    * reclaim if each near-dup cluster kept only its largest member
    * (max n_tok, doc_id tiebreak — the keep-the-most-data policy;
    * `d_cc_keep` is the keep-the-best-quality sibling). Removable docs
    * are attributed to THEIR OWN source, so a source whose content is
    * mostly copies of another's shows its true debt. Shuffle shape: the
    * cluster labels join tokens on |clustered docs| rows and the argmax
    * is a window over tiny per-cluster groups — the corpus itself is
    * never re-shuffled. */
  private def dDedupDebt(spark: SparkSession, d: String): DataFrame = {
    val cc = ccLabels(spark, d)
    val toks = Tables.documents(spark, d).select(col("doc_id"),
      col("source"), Text.tokenCount(col("text")).cast("long").as("n_tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("n_tok").desc, col("doc_id").asc)
    cc.join(toks, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .groupBy("source")
      .agg(count(lit(1)).as("n_dup_docs"), sum(col("n_tok")).as("tok_removable"))
      .orderBy("source")
  }

  private val dDedupDebtSql =
    s"""$dCcCtes,
       labels AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
                  FROM reach GROUP BY u),
       tl AS (SELECT doc_id, source,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
       mm AS (SELECT l.cluster_id, t.doc_id, t.source, t.n_tok,
                     ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                       ORDER BY t.n_tok DESC, t.doc_id) AS rk
              FROM labels l JOIN tl t USING (doc_id))
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dup_docs,
              CAST(SUM(n_tok) AS BIGINT) AS tok_removable
       FROM mm WHERE rk > 1 GROUP BY source ORDER BY source"""

  /** Cluster-size histogram — the first chart in every dedup report:
    * how many near-dup clusters of each size exist, with the
    * un-clustered singleton mass as the csize=1 row (a CC label set
    * only contains docs that had at least one edge, so size-1 "real"
    * clusters cannot occur and the row is unambiguous). Shuffle shape:
    * two partial-agg cascades over the (cached) label set — cluster →
    * size, size → count — plus two 1-row aggregates broadcast onto the
    * ≤|distinct sizes| rows. */
  private def dClusterHist(spark: SparkSession, d: String): DataFrame = {
    val cc = ccLabels(spark, d)
    val hist = cc.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_clusters"))
    val tot = Tables.documents(spark, d).agg(count(lit(1)).as("n_docs"))
    val clustered = cc.agg(count(lit(1)).as("n_clustered"))
    hist.unionByName(
      tot.crossJoin(clustered)
        .select(lit(1L).as("csize"),
          (col("n_docs") - col("n_clustered")).as("n_clusters")))
      .orderBy("csize")
  }

  private val dClusterHistSql =
    s"""$dCcCtes,
       cc AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
              FROM reach GROUP BY u),
       cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
              FROM cc GROUP BY 1),
       hist AS (SELECT csize, CAST(COUNT(*) AS BIGINT) AS n_clusters
                FROM cs GROUP BY 1),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       cl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clustered FROM cc)
       SELECT csize, n_clusters FROM hist
       UNION ALL
       SELECT CAST(1 AS BIGINT), n_docs - n_clustered
       FROM tot CROSS JOIN cl
       ORDER BY csize"""

  override def queries: Seq[Q] = Seq(
    Q("d_cc_keep", dCcKeep, Some(dCcKeepSql)),
    Q("d_cluster_hist", dClusterHist, Some(dClusterHistSql)),
    Q("d_dedup_debt", dDedupDebt, Some(dDedupDebtSql)),
    Q("d_exact", dExact, Some(dExactSql)),
    Q("d_jaccard_pairs", dJaccard, Some(dJaccardSql)),
    // same oracle SQL on purpose: the prefix path must hash-match the
    // naive baseline's rows exactly
    Q("d_jaccard_prefix", dJaccardPrefix, Some(dJaccardSql)),
    Q("d_jaccard_ab_naive", dJaccardAbNaive, Some(dJaccardAbSql)),
    Q("d_jaccard_ab_prefix", dJaccardAbPrefix, Some(dJaccardAbSql)),
    Q("d_minhash_lsh", dMinhashLsh, Some(dMinhashSql)),
    Q("d_simhash_pairs", dSimhash, Some(dSimhashSql)),
    Q("d_cc", dCc, Some(dCcSql)))
}
