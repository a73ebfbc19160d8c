package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.Text

/** Round-8 corpus-prep + evaluation extensions (own trailing bench group
  * so established groups' round-over-round rows stay apples-to-apples):
  *
  *  - substring-level duplicate-SPAN detection and removal — the
  *    exact-substring training-data dedup of Lee et al. 2021
  *    (arXiv:2107.06499) re-expressed relationally;
  *  - per-language quality-percentile cut — the "keep the top X% per
  *    language" pretraining filter;
  *  - ANN recall@k evaluation — LSH top-k graded against the exact
  *    brute-force top-k, the recall harness every approximate index
  *    needs before it ships.
  */
object PrepQ extends QueryPack {

  /** The normalized-corpus cache is rebuilt inside this group (Bench
    * clears managed caches at group boundaries), so the build gets its
    * own named row and `sim_recall_lsh` measures against a warm corpus —
    * same attribution discipline as SimQ's `sim_corpus_build`. */
  override def warms: Seq[Q] = Seq(
    Q("prep_corpus_build",
      (s, d) => Similarity.cacheNormalizedCorpus(Tables.embeddings(s, d), d),
      None))

  private def emb(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(spark, d)
    Similarity.cacheNormalizedCorpus(e, d)
    e
  }

  /** Duplicate 5-gram span report: per doc, how many n-gram start
    * positions are duplicated corpus-wide and how many maximal contiguous
    * spans they merge into (9% of positions at sf0.01 — the planted
    * near-dups). Integer basis-point ratio, no float division. */
  private def dSpanNgram(spark: SparkSession, d: String): DataFrame =
    Dedup.duplicateNgramSpans(Tables.documents(spark, d), "doc_id", "text",
        n = 5)
      .orderBy("doc_id")

  private val dSpanNgramSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT doc_id, i AS pos, array_to_string(t[i:i+4], ' ') AS s
              FROM toks, LATERAL unnest(generate_series(1, len(t) - 4)) AS g(i)
              WHERE len(t) >= 5),
       dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1),
       marked AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup ON sh.s = dup.s),
       runs AS (SELECT doc_id, pos,
                  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                FROM marked),
       spans AS (SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS dup_ngrams,
                   CAST(sum(CASE WHEN prev IS NULL OR pos - prev > 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans
                 FROM runs GROUP BY doc_id),
       tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total_ngrams
               FROM sh GROUP BY doc_id)
       SELECT d.doc_id,
         CAST(COALESCE(tot.total_ngrams, 0) AS BIGINT) AS total_ngrams,
         CAST(COALESCE(spans.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
         CAST(COALESCE(spans.dup_spans, 0) AS BIGINT) AS dup_spans,
         CAST(CASE WHEN tot.total_ngrams IS NULL THEN 0
              ELSE (COALESCE(spans.dup_ngrams, 0) * 10000) // tot.total_ngrams
              END AS BIGINT) AS dup_ratio_bp
       FROM documents d
       LEFT JOIN tot ON d.doc_id = tot.doc_id
       LEFT JOIN spans ON d.doc_id = spans.doc_id
       ORDER BY d.doc_id"""

  /** The scrub half: rebuild every document with its duplicated 5-gram
    * spans cut out (fully-duplicated docs come back empty). */
  private def dSpanScrub(spark: SparkSession, d: String): DataFrame =
    Dedup.removeDuplicateNgramSpans(Tables.documents(spark, d), "doc_id",
        "text", n = 5)
      .orderBy("doc_id")

  private val dSpanScrubSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT doc_id, i AS pos, array_to_string(t[i:i+4], ' ') AS s
              FROM toks, LATERAL unnest(generate_series(1, len(t) - 4)) AS g(i)
              WHERE len(t) >= 5),
       dup AS (SELECT s FROM sh GROUP BY s HAVING count(*) > 1),
       marked AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup ON sh.s = dup.s),
       covered AS (SELECT DISTINCT doc_id, ti FROM (
                     SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS ti
                     FROM marked) u),
       tokpos AS (SELECT doc_id, i AS ti, t[i] AS tok
                  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS g(i)),
       kept AS (SELECT tp.doc_id, tp.ti, tp.tok FROM tokpos tp
                LEFT JOIN covered c ON tp.doc_id = c.doc_id AND tp.ti = c.ti
                WHERE c.ti IS NULL),
       rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS clean_text,
                     CAST(count(*) AS BIGINT) AS n_kept
                   FROM kept GROUP BY doc_id)
       SELECT d.doc_id,
         COALESCE(r.clean_text, '') AS clean_text,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(string_split(d.text, ' ')) - COALESCE(r.n_kept, 0) AS BIGINT)
           AS n_removed
       FROM documents d
       LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
       ORDER BY d.doc_id"""

  private val enStop = Text.langStopwords.toMap.apply("en")

  /** Per-language quality-percentile cut: keep the top 25% of documents
    * by composite quality score WITHIN each language (rank·4 ≤ n — pure
    * integer arithmetic, ties on doc_id). The exact window form is the
    * oracle baseline; at 100 TB the same cut is a per-language
    * `approx_percentile` threshold broadcast back over one scan (no
    * global per-language sort) — plan shape documented, result
    * approximate by design there. */
  private def tQualityPctl(spark: SparkSession, d: String): DataFrame = {
    val qs = Text.qualityStatsFast(col("text"), enStop)
    val base = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), qs.getField("quality").as("quality"))
    val wr = Window.partitionBy("lang").orderBy(col("quality").desc,
      col("doc_id"))
    val wc = Window.partitionBy("lang")
    base
      .withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(wc))
      .filter(col("rn") * 4 <= col("n_lang"))
      .orderBy("doc_id")
  }

  private val tQualityPctlSql = {
    val stopList = enStop.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                   FROM documents),
       q AS (SELECT doc_id, lang,
               (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.5
               + (CAST(len(list_filter(toks, x -> list_contains($stopList, x)))
                    AS DOUBLE) / len(toks)) * 0.25
               + (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.5 END)
                 * 0.25 AS quality
             FROM t),
       r AS (SELECT doc_id, lang, quality,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                    ORDER BY quality DESC, doc_id) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
             FROM q)
       SELECT doc_id, lang, quality, rn, n_lang FROM r
       WHERE rn * 4 <= n_lang ORDER BY doc_id"""
  }

  /** Recall@5 of the LSH-bucketed ANN path graded against the exact
    * brute-force top-5, per query (integer basis points). The exact side
    * uses the TopK typed aggregator (map-side partial top-k — the
    * scale-correct form); both sides reuse the shared normalized-corpus
    * cache, and the grading join is |queries|·k rows — evaluation never
    * touches the corpus again. */
  private def simRecallLsh(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val q = e.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopKAgg(q, e, k = 5)
      .select("query_id", "neighbor_id")
    val approx = Similarity.lshTopK(q, e, k = 5,
      params = Similarity.annParamsFor(e, d))
      .select("query_id", "neighbor_id")
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("(coalesce(hits, CAST(0 AS BIGINT)) * 10000) div 5")
          .as("recall_bp"))
      .orderBy("query_id")
  }

  /** Recall@5 of an approximate ANN path at TWO probe settings against
    * the exact brute-force top-5 — the accuracy/nprobe dial measured,
    * not asserted: nprobe=1 is the cheapest (single-cell) probe,
    * nprobe=4 the production default. Shared shape for the IVF and
    * IVF-PQ harnesses: per query, hit counts and integer-bp recall for
    * both settings side by side. The grading joins are |queries|·k rows;
    * the corpus-side work is the ANN plans' own (already audited). */
  private def recallAt2(exact: DataFrame,
      approxAt: Int => DataFrame): DataFrame = {
    val ex = exact.select("query_id", "neighbor_id")
    def hits(nprobe: Int, as: String): DataFrame =
      ex.join(approxAt(nprobe).select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as(as))
    ex.select("query_id").distinct()
      .join(hits(1, "hits_n1"), Seq("query_id"), "left")
      .join(hits(4, "hits_n4"), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits_n1"), lit(0L)).as("hits_n1"),
        coalesce(col("hits_n4"), lit(0L)).as("hits_n4"))
      .select(col("query_id"), col("hits_n1"), col("hits_n4"),
        expr("(hits_n1 * 10000) div 5").as("recall_bp_n1"),
        expr("(hits_n4 * 10000) div 5").as("recall_bp_n4"))
      .orderBy("query_id")
  }

  private def recallSqlFrom(approxSqlAt: Int => String): String =
    s"""WITH exact AS (${SimQ.simTopkSql}),
       a1 AS (${approxSqlAt(1)}),
       a4 AS (${approxSqlAt(4)}),
       h1 AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_n1
              FROM exact e JOIN a1
                ON e.query_id = a1.query_id AND e.neighbor_id = a1.neighbor_id
              GROUP BY e.query_id),
       h4 AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits_n4
              FROM exact e JOIN a4
                ON e.query_id = a4.query_id AND e.neighbor_id = a4.neighbor_id
              GROUP BY e.query_id)
       SELECT q.query_id,
         CAST(COALESCE(h1.hits_n1, 0) AS BIGINT) AS hits_n1,
         CAST(COALESCE(h4.hits_n4, 0) AS BIGINT) AS hits_n4,
         CAST((COALESCE(h1.hits_n1, 0) * 10000) // 5 AS BIGINT) AS recall_bp_n1,
         CAST((COALESCE(h4.hits_n4, 0) * 10000) // 5 AS BIGINT) AS recall_bp_n4
       FROM (SELECT DISTINCT query_id FROM exact) q
       LEFT JOIN h1 ON q.query_id = h1.query_id
       LEFT JOIN h4 ON q.query_id = h4.query_id
       ORDER BY q.query_id"""

  /** Recall@5 of the IVF path at nprobe ∈ {1, 4} (VERDICT r8 item 5). */
  private def simRecallIvf(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val q = e.filter(col("vec_id") % 25 === 0)
    recallAt2(
      Similarity.bruteForceTopKAgg(q, e, k = 5),
      nprobe => Similarity.ivfTopK(q, e, k = 5,
        centroidStride = 50, nprobe = nprobe))
  }

  private val simRecallIvfSql = recallSqlFrom(SimQ.simIvfSqlAt)

  /** Recall@5 of the IVF-PQ path at nprobe ∈ {1, 4}: grades the full
    * compressed-domain chain (coarse cells + ADC shortlist + exact
    * rerank), so it prices BOTH the probe dial and the PQ shortlist's
    * rerank=20 truncation against exact search. */
  private def simRecallIvfpq(spark: SparkSession, d: String): DataFrame = {
    val e = emb(spark, d)
    val q = e.filter(col("vec_id") % 25 === 0)
    recallAt2(
      Similarity.bruteForceTopKAgg(q, e, k = 5),
      nprobe => graft.sim.PQ.ivfpqTopK(q, e, k = 5,
        centroidStride = 50, nprobe = nprobe,
        subspaces = 4, subDim = 16, ksub = 4, iters = 1, rerank = 20,
        trainBuckets = 2))
  }

  private val simRecallIvfpqSql = recallSqlFrom(SimQ.simIvfPqSqlAt)

  private val simRecallLshSql =
    s"""WITH exact AS (${SimQ.simTopkSql}),
       approx AS (${SimQ.simLshSql}),
       hits AS (SELECT e.query_id, CAST(count(*) AS BIGINT) AS hits
                FROM exact e JOIN approx a
                  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
                GROUP BY e.query_id)
       SELECT q.query_id,
         CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         CAST((COALESCE(h.hits, 0) * 10000) // 5 AS BIGINT) AS recall_bp
       FROM (SELECT DISTINCT query_id FROM exact) q
       LEFT JOIN hits h ON q.query_id = h.query_id
       ORDER BY q.query_id"""

  /** BPE merge induction, 3 rounds over the corpus word-frequency table
    * — the tokenizer-training artifact (Sennrich et al. 2016). Rounds
    * iterate over |vocab| rows, never the corpus; each round's winning
    * pair is a 1-row aggregate broadcast into the rewrite. The oracle
    * unrolls all three rounds with the identical doubled-space string
    * algebra. */
  private def tBpeMerges(spark: SparkSession, d: String): DataFrame =
    graft.text.Bpe.learnMerges(Tables.documents(spark, d), "text",
      rounds = 3)

  // MATERIALIZED: top$i and v$i are each referenced twice per chained
  // round — left to DuckDB's inliner the 20-round unroll expands the
  // tree 2^N-fold (the sf0.001 "too many open files" failure mode);
  // materializing pins each round to one evaluation, like the engine's
  // per-round localCheckpoint.
  private def bpeRoundCtes(i: Int): String = {
    val prev = s"v${i - 1}"
    s"""p$i AS (SELECT t[j] AS sym_a, t[j+1] AS sym_b,
           CAST(sum(freq) AS BIGINT) AS pair_count
         FROM (SELECT string_split(sym, ' ') AS t, freq FROM $prev),
              LATERAL unnest(generate_series(1, len(t) - 1)) g(j)
         GROUP BY 1, 2),
       top$i AS MATERIALIZED (SELECT sym_a, sym_b, pair_count FROM p$i
           ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
       v$i AS MATERIALIZED (SELECT trim(regexp_replace(
           replace(' ' || replace(sym, ' ', '  ') || ' ',
                   ' ' || t.sym_a || '  ' || t.sym_b || ' ',
                   ' ' || t.sym_a || t.sym_b || ' '),
           ' +', ' ', 'g')) AS sym, freq
         FROM $prev CROSS JOIN top$i t)"""
  }

  /** N-round unrolled BPE-training oracle: the same doubled-space
    * string algebra as [[bpeRoundCtes]], chained v0 → vN with one
    * (pair-count, top-1, rewrite) CTE triple per round — mechanical in
    * N, so the 20-merge harness reuses the 3-merge algebra verbatim
    * (VERDICT r8 item 4). */
  private def bpeMergesSqlAt(n: Int): String =
    s"""WITH w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS word
                 FROM documents) u
           WHERE word <> '' GROUP BY word),
       v0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym,
                     freq FROM w),
       ${(1 to n).map(bpeRoundCtes).mkString(",\n       ")}
       ${(1 to n).map(i =>
          s"SELECT $i AS round, sym_a, sym_b, pair_count FROM top$i")
         .mkString("\n       UNION ALL ")}
       ORDER BY round"""

  private val tBpeMergesSql = bpeMergesSqlAt(3)

  /** Tokenizer training past the toy count: 20 merge rounds through the
    * SAME |vocab|-row iteration (each round one pair aggregate + a
    * 1-row winner broadcast into the rewrite, lineage truncated per
    * round) — the per-round cost curve lands as its own bench row next
    * to the 3-round `t_bpe_merges`. Real tokenizers run thousands of
    * rounds of exactly this loop; rounds are corpus-size-independent
    * after the first word-frequency aggregate, so the 20-round timing
    * measures the marginal round cost directly. */
  private def tBpeMerges20(spark: SparkSession, d: String): DataFrame =
    graft.text.Bpe.learnMerges(Tables.documents(spark, d), "text",
      rounds = 20)

  /** Span-level decontamination: corpus docs (doc_id % 25 != 0) reported
    * against the benchmark set (doc_id % 25 == 0 — the same split as the
    * doc-level `t_decontam`), 5-gram overlap spans. */
  private def tDecontamSpan(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    Dedup.benchmarkSpanOverlap(
        docs.filter(col("doc_id") % 25 =!= 0),
        docs.filter(col("doc_id") % 25 === 0),
        "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  private val tDecontamSpanSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents WHERE doc_id % 25 <> 0),
       btoks AS (SELECT doc_id, string_split(text, ' ') AS t
                 FROM documents WHERE doc_id % 25 = 0),
       sh AS (SELECT doc_id, i AS pos, array_to_string(t[i:i+4], ' ') AS s
              FROM toks, LATERAL unnest(generate_series(1, len(t) - 4)) AS g(i)
              WHERE len(t) >= 5),
       bsh AS (SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS s
               FROM btoks, LATERAL unnest(generate_series(1, len(t) - 4)) AS g(i)
               WHERE len(t) >= 5),
       marked AS (SELECT sh.doc_id, sh.pos FROM sh JOIN bsh ON sh.s = bsh.s),
       runs AS (SELECT doc_id, pos,
                  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
                FROM marked),
       spans AS (SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS contam_ngrams,
                   CAST(sum(CASE WHEN prev IS NULL OR pos - prev > 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS contam_spans
                 FROM runs GROUP BY doc_id),
       tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total_ngrams
               FROM sh GROUP BY doc_id)
       SELECT d.doc_id,
         CAST(COALESCE(tot.total_ngrams, 0) AS BIGINT) AS total_ngrams,
         CAST(COALESCE(spans.contam_ngrams, 0) AS BIGINT) AS contam_ngrams,
         CAST(COALESCE(spans.contam_spans, 0) AS BIGINT) AS contam_spans,
         CAST(CASE WHEN tot.total_ngrams IS NULL THEN 0
              ELSE (COALESCE(spans.contam_ngrams, 0) * 10000)
                   // tot.total_ngrams END AS BIGINT) AS contam_ratio_bp
       FROM (SELECT doc_id FROM documents WHERE doc_id % 25 <> 0) d
       LEFT JOIN tot ON d.doc_id = tot.doc_id
       LEFT JOIN spans ON d.doc_id = spans.doc_id
       ORDER BY d.doc_id"""

  /** The encode step corpus-wide: learn 3 merges, then re-tokenize every
    * word occurrence with them (each round's 1-row pair broadcast into
    * the fold — training and encoding in ONE declarative plan, no driver
    * collect). Per doc: whitespace words vs post-BPE token count. At
    * 100 TB encode the WORD-FREQUENCY table instead and join the
    * (word → sym) dictionary back — same expressions, |vocab|-bounded
    * rewrite work. */
  private def tBpeApply(spark: SparkSession, d: String): DataFrame = {
    import graft.text.Bpe
    val docs = Tables.documents(spark, d)
    val merges = Bpe.learnMerges(docs, "text", rounds = 3)
    def m(r: Int, p: String) = merges.filter(col("round") === r)
      .select(col("sym_a").as(s"a$p"), col("sym_b").as(s"b$p"))
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    words
      .crossJoin(broadcast(m(1, "1")))
      .crossJoin(broadcast(m(2, "2")))
      .crossJoin(broadcast(m(3, "3")))
      .withColumn("sym",
        Bpe.mergePair(Bpe.mergePair(Bpe.mergePair(
          Bpe.symbolize(col("word")),
          col("a1"), col("b1")), col("a2"), col("b2")), col("a3"), col("b3")))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(size(split(col("sym"), " ")).cast("long")).as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  private val tBpeApplySql = {
    def ap(inner: String, a: String, b: String): String =
      s"""trim(regexp_replace(
           replace(' ' || replace($inner, ' ', '  ') || ' ',
                   ' ' || $a || '  ' || $b || ' ',
                   ' ' || $a || $b || ' '),
           ' +', ' ', 'g'))"""
    val enc = ap(ap(ap("trim(regexp_replace(word, '(.)', '\\1 ', 'g'))",
      "t1.sym_a", "t1.sym_b"), "t2.sym_a", "t2.sym_b"),
      "t3.sym_a", "t3.sym_b")
    s"""WITH w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
           FROM (SELECT unnest(string_split(text, ' ')) AS word
                 FROM documents) u
           WHERE word <> '' GROUP BY word),
       v0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym,
                     freq FROM w),
       ${bpeRoundCtes(1)},
       ${bpeRoundCtes(2)},
       ${bpeRoundCtes(3)},
       words AS (SELECT doc_id, word
                 FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                       FROM documents) u
                 WHERE word <> ''),
       enc AS (SELECT doc_id, $enc AS sym
               FROM words CROSS JOIN top1 t1 CROSS JOIN top2 t2
                    CROSS JOIN top3 t3)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(len(string_split(sym, ' '))) AS BIGINT) AS n_bpe_tokens
       FROM enc GROUP BY doc_id ORDER BY doc_id"""
  }

  override def queries: Seq[Q] = Seq(
    Q("d_span_ngram", dSpanNgram, Some(dSpanNgramSql)),
    Q("d_span_scrub", dSpanScrub, Some(dSpanScrubSql)),
    Q("t_quality_pctl", tQualityPctl, Some(tQualityPctlSql)),
    Q("t_bpe_merges", tBpeMerges, Some(tBpeMergesSql)),
    Q("t_bpe_merges20", tBpeMerges20, Some(bpeMergesSqlAt(20))),
    Q("t_bpe_apply", tBpeApply, Some(tBpeApplySql)),
    Q("t_decontam_span", tDecontamSpan, Some(tDecontamSpanSql)),
    Q("sim_recall_lsh", simRecallLsh, Some(simRecallLshSql)),
    Q("sim_recall_ivf", simRecallIvf, Some(simRecallIvfSql)),
    Q("sim_recall_ivfpq", simRecallIvfpq, Some(simRecallIvfpqSql)))
}
