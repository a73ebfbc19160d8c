package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Text
import graft.util.Exact.idiv

/** Round-9 fingerprinting pack: winnowing (Schleimer, Wilkerson &
  * Aiken 2003 — the MOSS local document fingerprinting scheme) and an
  * exact integer entropy proxy. Winnowing complements the existing
  * dedup family: the bag-of-words md5 (`t_fingerprint`) catches
  * reorderings, MinHash/SimHash catch near-duplicates, exact-substring
  * spans (`d_span_ngram`) catch verbatim runs — winnowing GUARANTEES
  * detection of any shared run of w+k−1 tokens while keeping only
  * ~2/(w+1) of the k-gram hashes, the storage/recall contract the
  * other schemes don't make.
  *
  * Algorithm (k = 4 token-grams, window w = 4, rightmost-min): each
  * k-gram position joins the ≤w windows covering it (a 4× explode —
  * bounded, shuffle-free), each window keeps its minimal (hash, −pos)
  * struct (rightmost tie-break via the negated position — struct MIN
  * is the same lexicographic comparison in both engines), and the
  * DISTINCT selected (pos, hash) pairs are the document's fingerprint
  * set. One partial-agg groupBy on (doc, window) + one distinct —
  * never a window function over the corpus.
  */
object FingerprintQ extends QueryPack {

  private val K = 4 // tokens per gram
  private val W = 4 // windows per selection
  private val DfCap = 8 // boilerplate cap for the pair join

  /** (doc_id, pos, h): the winnowing fingerprint set. */
  private def winnowed(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= K)
    val kg = toks
      .select(col("doc_id"), expr(
        s"""explode(transform(sequence(0, size(t) - $K),
              p -> struct(p AS p,
                concat_ws(' ', slice(t, p + 1, $K)) AS g)))""").as("u"))
      .select(col("doc_id"), col("u.p").as("p"),
        conv(substring(md5(col("u.g")), 1, 15), 16, 10).cast("long")
          .as("h"))
    val smax = kg.groupBy("doc_id")
      .agg((max(col("p")) - (W - 1)).as("smax"))
    kg.join(smax, "doc_id")
      .select(col("doc_id"), col("p"), col("h"),
        explode(sequence(lit(0), lit(W - 1))).as("off"))
      .withColumn("s", col("p") - col("off"))
      .filter(col("s") >= 0 && col("s") <= col("smax"))
      .groupBy("doc_id", "s")
      .agg(min(struct(col("h"), (-col("p")).as("np"))).as("m"))
      .select(col("doc_id"), (-col("m.np")).as("pos"), col("m.h").as("h"))
      .distinct()
  }

  /** Shared oracle prefix computing the same fingerprint set `fp`. */
  private val winnowSql =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t
         FROM documents WHERE len(string_split(text, ' ')) >= $K),
       kg AS (SELECT doc_id, u.p,
                ('0x' || substr(md5(u.g), 1, 15))::BIGINT AS h
              FROM toks, UNNEST(list_transform(range(len(t) - ${K - 1}),
                p -> {'p': p, 'g': t[p+1] || ' ' || t[p+2] || ' ' ||
                      t[p+3] || ' ' || t[p+4]})) AS r(u)),
       nwin AS (SELECT doc_id, MAX(p) - ${W - 1} AS smax
                FROM kg GROUP BY 1),
       wx AS (SELECT kg.doc_id, kg.p - off AS s, kg.p, kg.h
              FROM kg JOIN nwin USING (doc_id)
                   CROSS JOIN UNNEST([0, 1, 2, 3]) AS o(off)
              WHERE kg.p - off >= 0 AND kg.p - off <= smax),
       sel AS (SELECT doc_id, s, MIN({'h': h, 'np': -p}) AS m
               FROM wx GROUP BY 1, 2),
       fp AS (SELECT DISTINCT doc_id, -(m.np) AS pos, m.h AS h
              FROM sel)"""

  /** Per-document fingerprint accounting: how many k-grams winnowing
    * kept — the ~2/(w+1) density contract, measured. */
  private def tWinnow(spark: SparkSession, d: String): DataFrame =
    winnowed(spark, d)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_fp"),
        min("pos").cast("long").as("first_pos"),
        max("pos").cast("long").as("last_pos"))
      .orderBy("doc_id")

  private val tWinnowSql =
    s"""WITH $winnowSql
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp,
              CAST(MIN(pos) AS BIGINT) AS first_pos,
              CAST(MAX(pos) AS BIGINT) AS last_pos
       FROM fp GROUP BY 1 ORDER BY doc_id"""

  /** Copy-detection pairs: documents sharing ≥ 2 winnow fingerprints.
    * The hash join is capped at df ≤ $DfCap docs per hash (the
    * `d_cdc_pairs` boilerplate discipline — a corpus-wide boilerplate
    * k-gram must not fan out quadratically; capped hashes simply don't
    * generate candidates, and the shared-count reflects the capped
    * set). */
  private def winnowPairs(spark: SparkSession, d: String): DataFrame = {
    val fp = winnowed(spark, d).select("doc_id", "h").distinct()
    val rare = fp.groupBy("h")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= DfCap)
    val capped = fp.join(rare.select("h"), "h")
    capped.alias("a").join(capped.alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).cast("long").as("shared"))
      .filter(col("shared") >= 2)
  }

  private def dWinnowPairs(spark: SparkSession, d: String): DataFrame =
    winnowPairs(spark, d).orderBy("d1", "d2")

  private val dWinnowPairsSql =
    s"""WITH $winnowSql,
       fpd AS (SELECT DISTINCT doc_id, h FROM fp),
       rare AS (SELECT h FROM fpd GROUP BY h
                HAVING COUNT(*) <= $DfCap),
       capped AS (SELECT fpd.doc_id, fpd.h FROM fpd JOIN rare USING (h))
       SELECT a.doc_id AS d1, b.doc_id AS d2,
              CAST(COUNT(*) AS BIGINT) AS shared
       FROM capped a JOIN capped b
         ON a.h = b.h AND a.doc_id < b.doc_id
       GROUP BY 1, 2 HAVING COUNT(*) >= 2
       ORDER BY d1, d2"""

  /** Exact integer token-entropy proxy per document — the gibberish /
    * degenerate-repetition signal the ratio filters miss: with token
    * counts n_t of n, ent_m = ⌊10³·Σ_t n_t·(⌊log₂n⌋ − ⌊log₂n_t⌋)/n⌋,
    * where ⌊log₂x⌋ = len(bin(x)) − 1 EXACTLY in both engines (no
    * transcendental anywhere). A doc of one repeated token scores 0;
    * all-distinct tokens score ⌊log₂n⌋·1000. Two partial-agg groupBys
    * ((doc, token) then doc). */
  private def tTokenEntropy(spark: SparkSession, d: String): DataFrame = {
    def flog2(c: org.apache.spark.sql.Column) = length(bin(c)) - 1
    val tc = Tables.documents(spark, d)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
    tc.groupBy("doc_id")
      .agg(sum("cnt").cast("long").as("n"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum(col("cnt") * flog2(col("cnt"))).cast("long").as("sfl"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("n_distinct"),
        idiv((col("n") * flog2(col("n")) - col("sfl")) * 1000, col("n"))
          .cast("long").as("ent_m"))
      .orderBy("doc_id")
  }

  private val tTokenEntropySql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
         FROM documents),
       tc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM toks, UNNEST(t) AS r(tok)
              GROUP BY 1, 2),
       d AS (SELECT doc_id, SUM(cnt) AS n,
                    CAST(COUNT(*) AS BIGINT) AS n_distinct,
                    SUM(cnt * (len(bin(cnt)) - 1)) AS sfl
             FROM tc GROUP BY 1)
       SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_distinct,
              CAST(((n * (len(bin(n)) - 1) - sfl) * 1000) // n AS BIGINT)
                AS ent_m
       FROM d ORDER BY doc_id"""

  /** Order-independent whole-table content fingerprint, one row
    * (n_rows, content_hash): the 60-bit md5 of every row's
    * pipe-joined columns, SUMMED (associative/commutative — mergeable
    * partials at any partitioning) modulo 2⁶⁰. The table-diff / cache-
    * invalidation primitive: two relations share (n_rows, hash) iff
    * their multisets of rows agree (up to the 2⁻⁶⁰ collision budget) —
    * no sort, one aggregate over the scan. */
  private def prContentHash(spark: SparkSession, d: String): DataFrame =
    graft.text.ContentHash.fingerprint(Tables.documents(spark, d),
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  private val prContentHashSql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(('0x' || substr(md5(doc_id || '|' || text || '|' ||
                     lang || '|' || source || '|' || n_chars), 1, 15))::BIGINT)
                   % 1152921504606846976 AS BIGINT) AS content_hash
       FROM documents"""

  /** Column-granular version of [[prContentHash]]: one (column_name,
    * n_nonnull, content_hash) row per column, so when the whole-table
    * hash diverges the offending COLUMN is named without a row-level
    * diff. Still ONE scan and ONE mergeable aggregate (all 2·|cols|
    * partials in a single 1-row agg), melted to rows by an explode of
    * the aggregated struct — never a per-column rescan. */
  private def prColumnHash(spark: SparkSession, d: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    def h(c: String) =
      conv(substring(md5(col(c).cast("string")), 1, 15), 16, 10)
        .cast("long").cast(D)
    val pre = Tables.documents(spark, d)
      .select(cols.map(col) ++ cols.map(c => h(c).as(s"_h_$c")): _*)
      .agg(count(cols.head).as(s"nn_${cols.head}"),
        (cols.tail.map(c => count(c).as(s"nn_$c")) ++
          cols.map(c => expr(
            s"CAST(SUM(_h_$c) % 1152921504606846976 AS BIGINT)")
            .as(s"h_$c"))): _*)
    pre.select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col(s"nn_$c").cast("long").as("n_nonnull"),
        col(s"h_$c").as("content_hash"))): _*)).as("r"))
      .select(col("r.column_name"), col("r.n_nonnull"),
        col("r.content_hash"))
      .orderBy("column_name")
  }

  private val prColumnHashSql = {
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val aggs = cols.map(c =>
      s"""COUNT($c) AS nn_$c,
          CAST(SUM(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT)
               % 1152921504606846976 AS BIGINT) AS h_$c""").mkString(", ")
    val rows = cols.map(c =>
      s"SELECT '$c' AS column_name, CAST(nn_$c AS BIGINT) AS n_nonnull, " +
        s"h_$c AS content_hash FROM a").mkString(" UNION ALL ")
    s"WITH a AS (SELECT $aggs FROM documents) $rows ORDER BY column_name"
  }

  /** ROUGE-2 extent scoring over the winnow copy pairs: bigram
    * MULTISET overlap (clipped counts — the ROUGE definition) between
    * each flagged pair, as precision (share of d2's bigrams also in
    * d1), recall (share of d1's), and F1, all integer bp. Turns the
    * binary "these two share fingerprints" flag into HOW MUCH is
    * copied — the triage signal between "remove the copy" (F ≈ 10⁴)
    * and "shared boilerplate only" (F small). Shape: the |pairs| table
    * (already boilerplate-capped) equi-joins each side's per-doc
    * bigram counts on (doc, bigram) — cost ∝ |pairs|·|doc bigrams|,
    * never corpus²; F's division is the only non-sum step. */
  private def tRougePairs(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val pairs = winnowPairs(spark, d)
    val bg = graft.text.Lm.bigrams(docs, "doc_id", "text")
      .groupBy(col("doc_id"), concat_ws(" ", col("w1"), col("w2")).as("g"))
      .agg(count(lit(1)).as("c"))
    val tot = bg.groupBy("doc_id").agg(sum("c").cast("long").as("nb"))
    val m = pairs
      .join(bg.select(col("doc_id").as("d1"), col("g"),
        col("c").as("c1")), Seq("d1"))
      .join(bg.select(col("doc_id").as("d2"), col("g"),
        col("c").as("c2")), Seq("d2", "g"))
      .groupBy("d1", "d2")
      .agg(sum(least(col("c1"), col("c2"))).cast("long").as("match_n"))
    pairs
      .join(m, Seq("d1", "d2"), "left")
      .join(tot.select(col("doc_id").as("d1"), col("nb").as("n1")), "d1")
      .join(tot.select(col("doc_id").as("d2"), col("nb").as("n2")), "d2")
      .select(col("d1"), col("d2"), col("shared"),
        coalesce(col("match_n"), lit(0L)).as("match_n"),
        col("n1"), col("n2"))
      .select(col("d1"), col("d2"), col("shared"), col("match_n"),
        col("n1"), col("n2"),
        idiv(col("match_n") * 10000L, col("n2")).as("p_bp"),
        idiv(col("match_n") * 10000L, col("n1")).as("r_bp"))
      .withColumn("f_bp",
        when(col("p_bp") + col("r_bp") === 0, lit(null))
          .otherwise(idiv(lit(2L) * col("p_bp") * col("r_bp"),
            col("p_bp") + col("r_bp"))).cast("long"))
      .orderBy("d1", "d2")
  }

  private val tRougePairsSql =
    s"""WITH $winnowSql,
       fpd AS (SELECT DISTINCT doc_id, h FROM fp),
       rare AS (SELECT h FROM fpd GROUP BY h
                HAVING COUNT(*) <= $DfCap),
       capped AS (SELECT fpd.doc_id, fpd.h FROM fpd JOIN rare USING (h)),
       prs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
                      CAST(COUNT(*) AS BIGINT) AS shared
               FROM capped a JOIN capped b
                 ON a.h = b.h AND a.doc_id < b.doc_id
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       bg AS (SELECT doc_id, u.w1 || ' ' || u.w2 AS g, COUNT(*) AS c
              FROM (SELECT doc_id, string_split(text, ' ') AS s
                    FROM documents),
                   UNNEST(list_transform(s[1:len(s) - 1],
                     (w, i) -> {'w1': w, 'w2': s[i + 1]})) AS r(u)
              GROUP BY 1, 2),
       tt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb
              FROM bg GROUP BY 1),
       mt AS (SELECT p.d1, p.d2,
                     CAST(SUM(LEAST(b1.c, b2.c)) AS BIGINT) AS match_n
              FROM prs p
              JOIN bg b1 ON b1.doc_id = p.d1
              JOIN bg b2 ON b2.doc_id = p.d2 AND b2.g = b1.g
              GROUP BY 1, 2),
       fin AS (SELECT p.d1, p.d2, p.shared,
                      COALESCE(mt.match_n, 0) AS match_n,
                      t1.nb AS n1, t2.nb AS n2
               FROM prs p
               LEFT JOIN mt ON mt.d1 = p.d1 AND mt.d2 = p.d2
               JOIN tt t1 ON t1.doc_id = p.d1
               JOIN tt t2 ON t2.doc_id = p.d2),
       bp AS (SELECT d1, d2, shared, match_n, n1, n2,
                     (match_n * 10000) // n2 AS p_bp,
                     (match_n * 10000) // n1 AS r_bp
              FROM fin)
       SELECT d1, d2, shared, CAST(match_n AS BIGINT) AS match_n, n1, n2,
              CAST(p_bp AS BIGINT) AS p_bp, CAST(r_bp AS BIGINT) AS r_bp,
              CAST(CASE WHEN p_bp + r_bp = 0 THEN NULL
                        ELSE (2 * p_bp * r_bp) // (p_bp + r_bp) END
                   AS BIGINT) AS f_bp
       FROM bp ORDER BY d1, d2"""

  def queries: Seq[Q] = Seq(
    Q("t_winnow", tWinnow, Some(tWinnowSql)),
    Q("pr_content_hash", prContentHash, Some(prContentHashSql)),
    Q("pr_column_hash", prColumnHash, Some(prColumnHashSql)),
    Q("d_winnow_pairs", dWinnowPairs, Some(dWinnowPairsSql)),
    Q("t_rouge_pairs", tRougePairs, Some(tRougePairsSql)),
    Q("t_token_entropy", tTokenEntropy, Some(tTokenEntropySql)))
}
