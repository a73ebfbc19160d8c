package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sketch.Sketch

/** Sketch coverage (engine extension — fixed-size summaries for the
  * statistics a 100 TB pipeline can't afford to keep exactly): a
  * Count-Min point-frequency sketch and a HyperLogLog distinct-count
  * estimate over the documents token stream, both md5-deterministic so
  * the DuckDB oracle replays every cell/register bit-for-bit — the
  * estimates are approximate with respect to the TRUTH, but exact with
  * respect to the ALGORITHM, which is what the gate checks.
  */
object SketchQ extends QueryPack {

  private def toks(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")

  /** CMS point estimates (d = 4, w = 256) for a fixed probe list —
    * frequent tokens, mid tokens, and one absent token. Output
    * (tok, est, exact): est ≥ exact always (min-over-rows upper
    * bound); the absent token reads collision noise. The sketch is
    * ≤ 1024 cells at ANY corpus size — partial aggregation collapses
    * each partition before the shuffle. The exact-count column is the
    * verification luxury of the small SF, not part of the sketch. */
  private val cmsProbes =
    Seq("the", "a", "table", "hash", "merge", "vector", "window", "qzx_absent")

  private def tCmsPoint(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val t = toks(spark, d)
    val sketch = Sketch.countMin(t, "tok", depth = 4, width = 256L)
    val exact = t.groupBy("tok").agg(count(lit(1)).as("exact"))
    Sketch.cmsEstimate(sketch, cmsProbes.toDF("tok"), "tok",
        depth = 4, width = 256L)
      .join(exact, Seq("tok"), "left")
      .select(col("tok"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"))
      .orderBy("tok")
  }

  private val tCmsPointSql = {
    val probeRows = cmsProbes.map(p => s"('$p')").mkString(", ")
    s"""WITH t2 AS (SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents) WHERE tok <> ''),
       rs(r) AS (VALUES (0), (1), (2), (3)),
       cells AS (SELECT r,
                   ('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || tok), 1, 8))::BIGINT
                     % 256 AS c,
                   CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM t2 CROSS JOIN rs GROUP BY 1, 2),
       probes(tok) AS (VALUES $probeRows),
       pk AS (SELECT p.tok, rs.r,
                ('0x' || substr(md5(CAST(rs.r AS VARCHAR) || '|' || p.tok), 1, 8))::BIGINT
                  % 256 AS c
              FROM probes p CROSS JOIN rs),
       est AS (SELECT tok, MIN(COALESCE(cnt, 0)) AS est
               FROM pk LEFT JOIN cells USING (r, c) GROUP BY 1),
       ex AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact
              FROM t2 GROUP BY 1)
       SELECT tok, est, COALESCE(ex.exact, 0) AS exact
       FROM est LEFT JOIN ex USING (tok) ORDER BY tok"""
  }

  /** HLL distinct-part estimate over the lineitem part keys, m = 64
    * registers: one row (estimate, exact). The part-key cardinality
    * (2 k at sf0.01, 20 k at sf0.1) sits squarely in the raw
    * estimator's regime (≥ 2.5·m) — the documents vocab (~31 tokens)
    * does NOT, and would need the linear-counting small-range
    * correction, whose ln() violates the no-libm exactness rule. The
    * registers are 64 BIGINT-exact max-of-leading-zero values (the
    * `bin`-length trick — no float log2), the harmonic sum is an
    * integer, and the single float op is a fixed literal expression
    * tree. The exact countDistinct rides along for scrutiny — at
    * 100 TB only the 64-register state and the estimate remain. */
  private def tHllDistinct(spark: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(spark, d)
      .select(col("l_partkey").cast("string").as("tok"))
    Sketch.hllEstimate(Sketch.hllRegisters(keys, "tok", m = 64), m = 64)
      .crossJoin(keys.agg(count_distinct(col("tok")).as("exact")))
      .select(col("estimate"), col("exact"))
  }

  private val tHllDistinctSql =
    """WITH t2 AS (SELECT CAST(l_partkey AS VARCHAR) AS tok FROM lineitem),
       h AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM t2),
       r AS (SELECT h % 64 AS bucket, h // 64 AS w FROM h),
       rho AS (SELECT bucket,
                 CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho
               FROM r),
       reg AS (SELECT bucket, MAX(rho) AS register FROM rho GROUP BY 1),
       allb AS (SELECT range AS bucket FROM range(64)),
       regs AS (SELECT allb.bucket, COALESCE(reg.register, 0) AS register
                FROM allb LEFT JOIN reg ON allb.bucket = reg.bucket),
       s AS (SELECT SUM(CAST(1 AS BIGINT) << (55 - register)) AS s FROM regs)
       SELECT CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
                * CAST(36028797018963968 AS DOUBLE) / CAST(s AS DOUBLE)
                AS estimate,
              (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) FROM t2) AS exact
       FROM s"""

  /** Bloom-filter decontamination — the sketch twin of `t_decontam`:
    * the benchmark slice's word 3-grams go into a 2048-bit / 3-hash
    * Bloom filter ([[Sketch.bloomBits]] — ≤ 2048 rows of state at ANY
    * benchmark size, vs the exact shingle set that grows with it), and
    * every corpus shingle probes the broadcast filter. Per doc:
    * bloom_hits (shingles the filter claims) vs exact_hits (true
    * overlaps) — bloom_hits ≥ exact_hits always (no false negatives;
    * the surplus rows ARE the false positives the m/k trade buys), and
    * a doc the exact pass flags is never missed. Output ordered by
    * doc_id; md5 positions replay bit-for-bit in the oracle. */
  private def tBloomDecontam(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val benchSh = docs.filter(col("doc_id") % 25 === 0)
      .select(explode(graft.dedup.Dedup.shinglesFast(col("text"), 3)).as("sh"))
    val bits = Sketch.bloomBits(benchSh, "sh", hashes = 3, mBits = 2048L)
    val corpusSh = docs.filter(col("doc_id") % 25 =!= 0)
      .select(col("doc_id"),
        explode(graft.dedup.Dedup.shinglesFast(col("text"), 3)).as("sh"))
    val member = Sketch.bloomProbe(bits, corpusSh.select(col("sh")), "sh",
      hashes = 3, mBits = 2048L)
    corpusSh
      .join(member.filter(col("member") === 1).select(col("sh")), Seq("sh"))
      .join(broadcast(benchSh.distinct().withColumn("ex", lit(1))),
        Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("bloom_hits"),
        sum(coalesce(col("ex"), lit(0))).cast("long").as("exact_hits"))
      .orderBy("doc_id")
  }

  private val tBloomDecontamSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
              FROM toks WHERE len(t) >= 3),
       bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 25 = 0),
       js(j) AS (VALUES (0), (1), (2)),
       bits AS (SELECT DISTINCT
                  ('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || sh), 1, 8))::BIGINT
                    % 2048 AS bit
                FROM bench CROSS JOIN js),
       probes AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 25 <> 0),
       pk AS (SELECT p.sh,
                ('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || p.sh), 1, 8))::BIGINT
                  % 2048 AS bit
              FROM probes p CROSS JOIN js),
       pm AS (SELECT sh,
                CASE WHEN SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 3
                     THEN 1 ELSE 0 END AS member
              FROM pk LEFT JOIN bits b USING (bit) GROUP BY 1)
       SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS bloom_hits,
              CAST(SUM(CASE WHEN bench.sh IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS exact_hits
       FROM sh s
       JOIN pm ON s.sh = pm.sh AND pm.member = 1
       LEFT JOIN bench ON s.sh = bench.sh
       WHERE s.doc_id % 25 <> 0
       GROUP BY 1 ORDER BY 1"""

  /** Per-group HLL: distinct part keys per return flag from SPARSE
    * registers ([[Sketch.hllRegistersBy]] — ≤ 64 register rows per
    * group at any scale, absent buckets accounted at estimate time).
    * Each group's cardinality (~2 k sf0.01 / ~20 k sf0.1) sits in the
    * raw estimator's regime. Exact countDistinct rides along for
    * scrutiny, as in `t_hll_distinct`. */
  private def tHllGrouped(spark: SparkSession, d: String): DataFrame = {
    val keys = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_partkey").cast("string").as("tok"))
    Sketch.hllEstimateBy(
        Sketch.hllRegistersBy(keys, "tok", "l_returnflag", m = 64),
        "l_returnflag", m = 64)
      .join(keys.groupBy("l_returnflag")
        .agg(count_distinct(col("tok")).as("exact")), Seq("l_returnflag"))
      .orderBy("l_returnflag")
  }

  private val tHllGroupedSql =
    """WITH t2 AS (SELECT l_returnflag AS g, CAST(l_partkey AS VARCHAR) AS tok
                FROM lineitem),
       h AS (SELECT g, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM t2),
       r AS (SELECT g, h % 64 AS bucket, h // 64 AS w FROM h),
       rho AS (SELECT g, bucket,
                 CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END AS rho
               FROM r),
       reg AS (SELECT g, bucket, MAX(rho) AS register FROM rho GROUP BY 1, 2),
       s AS (SELECT g,
               SUM(CAST(1 AS BIGINT) << (55 - register))
                 + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 55) AS s
             FROM reg GROUP BY 1),
       ex AS (SELECT l_returnflag AS g,
                CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact
              FROM lineitem GROUP BY 1)
       SELECT g AS l_returnflag,
              CAST(0.709 AS DOUBLE) * CAST(4096 AS DOUBLE)
                * CAST(36028797018963968 AS DOUBLE) / CAST(s.s AS DOUBLE)
                AS estimate,
              exact
       FROM s JOIN ex USING (g) ORDER BY 1"""

  /** Log₂-histogram quantiles of the order totals (in exact cents —
    * the [[graft.util.Exact]] decimal discipline): the p25/p50/p75/p90/
    * p99/p99.99 buckets with their value bounds. The sketch is ≤ 66
    * (bucket, cnt) rows at ANY corpus size and merges across shards by
    * summing counts ([[Sketch.logHistogram]]) — the fixed-state answer
    * to "what does the price distribution look like at 100 TB", where
    * an exact percentile would distribute a full sort. The quantile
    * sweep crosses the tiny histogram with the ONE-row total only. */
  private def skQhist(spark: SparkSession, d: String): DataFrame = {
    val cents = Tables.orders(spark, d)
      .select((graft.util.Exact.dec2(col("o_totalprice")) * 100)
        .cast("long").as("v"))
    Sketch.histQuantiles(Sketch.logHistogram(cents, "v"),
        Seq(2500, 5000, 7500, 9000, 9900, 9999))
      .orderBy("q_bp")
  }

  private val skQhistSql =
    """WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v FROM orders),
       h AS (SELECT CAST(CASE WHEN v < 0 THEN -1 WHEN v = 0 THEN 0
                         ELSE length(bin(v)) END AS INTEGER) AS bucket,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM v GROUP BY 1),
       c AS (SELECT bucket, cnt,
                    CAST(SUM(cnt) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
                    CAST((SELECT SUM(cnt) FROM h) AS BIGINT) AS n
             FROM h),
       q(q_bp) AS (VALUES (2500), (5000), (7500), (9000), (9900), (9999)),
       r AS (SELECT q_bp, bucket, cum, n,
                    CAST((n * q_bp + 9999) // 10000 AS BIGINT) AS rnk
             FROM c CROSS JOIN q
             WHERE cum >= (n * q_bp + 9999) // 10000),
       sel AS (SELECT q_bp, MIN(bucket) AS bucket, MIN(rnk) AS rnk,
                      MIN(n) AS n
               FROM r GROUP BY 1)
       SELECT q_bp, bucket,
              CASE WHEN bucket <= 0 THEN 0
                   ELSE (CAST(1 AS BIGINT) << (bucket - 1)) END AS lo,
              CASE WHEN bucket <= 0 THEN 0
                   ELSE (CAST(1 AS BIGINT) << bucket) - 1 END AS hi,
              rnk, n
       FROM sel ORDER BY q_bp"""

  /** Per-language document-length percentiles from SPARSE grouped
    * histograms ([[Sketch.logHistogramBy]] — ≤ 66 rows per language at
    * ANY corpus size): the p50/p95 whitespace-token-count buckets per
    * lang, the "how long are my docs per language" curation dashboard
    * that would otherwise distribute a per-group sort. The totals join
    * and the cumulative window are |langs|-sized — dims, not data. */
  private def skQhistLang(spark: SparkSession, d: String): DataFrame = {
    val lens = Tables.documents(spark, d)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    Sketch.histQuantilesBy(
        Sketch.logHistogramBy(lens, "toks", "lang"), "lang",
        Seq(5000, 9500))
      .orderBy("lang", "q_bp")
  }

  private val skQhistLangSql =
    """WITH lens AS (SELECT lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
              FROM documents),
       h AS (SELECT lang,
                    CAST(CASE WHEN toks < 0 THEN -1 WHEN toks = 0 THEN 0
                         ELSE length(bin(toks)) END AS INTEGER) AS bucket,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM lens GROUP BY 1, 2),
       t AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
       c AS (SELECT h.lang, h.bucket,
                    CAST(SUM(h.cnt) OVER (PARTITION BY h.lang ORDER BY h.bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
                    t.n
             FROM h JOIN t USING (lang)),
       q(q_bp) AS (VALUES (5000), (9500)),
       r AS (SELECT lang, q_bp, bucket, cum, n,
                    CAST((n * q_bp + 9999) // 10000 AS BIGINT) AS rnk
             FROM c CROSS JOIN q
             WHERE cum >= (n * q_bp + 9999) // 10000),
       sel AS (SELECT lang, q_bp, MIN(bucket) AS bucket, MIN(rnk) AS rnk,
                      MIN(n) AS n
               FROM r GROUP BY 1, 2)
       SELECT lang, q_bp, bucket,
              CASE WHEN bucket <= 0 THEN 0
                   ELSE (CAST(1 AS BIGINT) << (bucket - 1)) END AS lo,
              CASE WHEN bucket <= 0 THEN 0
                   ELSE (CAST(1 AS BIGINT) << bucket) - 1 END AS hi,
              rnk, n
       FROM sel ORDER BY lang, q_bp"""

  /** Exact heavy hitters (tokens above 1/30 of the stream) through the
    * Misra-Gries candidate pre-filter, k=64: the output is the exact
    * HAVING-gate answer (which is all the oracle states) — the MG pass
    * only bounds the recount shuffle to ≤ k candidates per partition,
    * and freqDiv=30 ≤ k+1 makes the candidate set a provable superset
    * of the true heavy hitters (SketchSpec equality law). */
  private def tHeavy(spark: SparkSession, d: String): DataFrame =
    Sketch.heavyHitters(toks(spark, d), "tok", k = 64, freqDiv = 30L)
      .orderBy("tok")

  private val tHeavySql =
    """WITH t AS (SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents) WHERE tok <> ''),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM t)
       SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM t, tot GROUP BY tok, total HAVING COUNT(*) * 30 > total
       ORDER BY tok"""

  /** Sketch-driven winsorization: clip event values (exact cents) to
    * the [p5 bucket lo, p95 bucket hi] bounds derived from the log2
    * histogram — outlier clamping WITHOUT a global sort: the bounds
    * come from the ≤ 66-bucket mergeable sketch, broadcast as ONE row
    * into a scan-fused clamp, and the output is the per-type clipped
    * aggregate. Bucket-resolution bounds are the sketch trade-off; the
    * oracle replays them exactly. */
  private def eWinsor(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("event_type"),
        (graft.util.Exact.dec2(col("value")) * 100).cast("long").as("c"))
    val qs = Sketch.histQuantiles(Sketch.logHistogram(ev, "c"),
      Seq(500, 9500))
    val bounds = qs.agg(
      min(when(col("q_bp") === 500, col("lo"))).as("lo_clip"),
      max(when(col("q_bp") === 9500, col("hi"))).as("hi_clip"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("w", least(greatest(col("c"), col("lo_clip")), col("hi_clip")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("w")).as("sum_clipped"),
        sum(when(col("c") < col("lo_clip"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("c") > col("hi_clip"), 1L).otherwise(0L)).as("n_high"))
      .orderBy("event_type")
  }

  private val eWinsorSql =
    """WITH v AS (SELECT event_type,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
              FROM events),
       h AS (SELECT CAST(CASE WHEN c < 0 THEN -1 WHEN c = 0 THEN 0
                         ELSE length(bin(c)) END AS INTEGER) AS bucket,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM v GROUP BY 1),
       cm AS (SELECT bucket, cnt,
                    CAST(SUM(cnt) OVER (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum,
                    CAST((SELECT SUM(cnt) FROM h) AS BIGINT) AS n
             FROM h),
       q(q_bp) AS (VALUES (500), (9500)),
       r AS (SELECT q_bp, bucket,
                    CAST((n * q_bp + 9999) // 10000 AS BIGINT) AS rnk
             FROM cm CROSS JOIN q
             WHERE cum >= (n * q_bp + 9999) // 10000),
       sel AS (SELECT q_bp, MIN(bucket) AS bucket FROM r GROUP BY 1),
       b AS (SELECT
               MIN(CASE WHEN q_bp = 500 THEN
                     CASE WHEN bucket <= 0 THEN 0
                          ELSE (CAST(1 AS BIGINT) << (bucket - 1)) END END)
                 AS lo_clip,
               MAX(CASE WHEN q_bp = 9500 THEN
                     CASE WHEN bucket <= 0 THEN 0
                          ELSE (CAST(1 AS BIGINT) << bucket) - 1 END END)
                 AS hi_clip
             FROM sel),
       w AS (SELECT event_type, c, lo_clip, hi_clip,
                    LEAST(GREATEST(c, lo_clip), hi_clip) AS w
             FROM v, b)
       SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(w) AS BIGINT) AS sum_clipped,
              CAST(SUM(CASE WHEN c < lo_clip THEN 1 ELSE 0 END) AS BIGINT)
                AS n_low,
              CAST(SUM(CASE WHEN c > hi_clip THEN 1 ELSE 0 END) AS BIGINT)
                AS n_high
       FROM w GROUP BY 1 ORDER BY 1"""

  override def queries: Seq[Q] = Seq(
    Q("t_heavy", tHeavy, Some(tHeavySql)),
    Q("e_winsor", eWinsor, Some(eWinsorSql)),
    Q("t_cms_point", tCmsPoint, Some(tCmsPointSql)),
    Q("t_hll_distinct", tHllDistinct, Some(tHllDistinctSql)),
    Q("t_hll_grouped", tHllGrouped, Some(tHllGroupedSql)),
    Q("t_bloom_decontam", tBloomDecontam, Some(tBloomDecontamSql)),
    Q("sk_qhist", skQhist, Some(skQhistSql)),
    Q("sk_qhist_lang", skQhistLang, Some(skQhistLangSql)))
}
