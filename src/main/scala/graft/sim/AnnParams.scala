package graft.sim

import org.apache.spark.sql.DataFrame

/** Corpus-size-DERIVED banding parameters for the sign-random-projection
  * LSH family — the single source every `sim_*` entry point reads instead
  * of per-call `planes = 16, bands = 4` defaults scattered across
  * consumers.
  *
  * Why derivation is the scale fix: a band with `bandBits` = r planes has
  * 2^r buckets, so expected occupancy is n/2^r and the within-bucket
  * candidate join degenerates quadratic when r is pinned while n grows
  * 100× (measured: the pinned 16-bucket band space made the candidate
  * stage grow ~n² — 2.8 s → 548 s from n = 2 000 → 20 000). Deriving
  * r so 2^r ≈ n / [[AnnParams.TargetOccupancy]] keeps expected bucket
  * occupancy CONSTANT at every scale, which makes expected candidate
  * pairs ≈ bands · n · occupancy — linear in n.
  *
  * Layout: the signature is always `bands` × [[AnnParams.SlotBits]]
  * hyperplanes (60 planes — fits a BIGINT with headroom on both engines;
  * 2^63 literals overflow DuckDB's signed BIGINT arithmetic), and band b's
  * bucket is the LOW `bandBits` bits of its 15-bit slot:
  * `(sig >> (b · 15)) & (2^r − 1)`. Fixing the signature width while
  * deriving only the MASK means the DuckDB oracle can replay the exact
  * engine behavior at any scale from ONE generated statement: the 60
  * plane constants are embedded once and r comes from `COUNT(*)` via the
  * same integer threshold ladder ([[graft.queries.AnnSql]]).
  *
  * Skew guard: derivation bounds EXPECTED occupancy; real embedding
  * corpora cluster, so a hot bucket can still be data-sized. `bucketCap`
  * truncates every (band, bucket) posting list to its first
  * [[AnnParams.BucketCap]] members under a deterministic multiplicative-
  * hash shuffle order (id-keyed, engine-reproducible), bounding worst-case
  * candidates at bands · n · cap; queries landing in a capped bucket
  * re-probe the full Hamming-1 shell of that band (the Lv et al. 2007
  * multiprobe move), so the recall lost to truncation is bought back
  * from the bucket's neighbors rather than silently dropped. */
final case class AnnParams(bands: Int, slotBits: Int, bandBits: Int,
    bucketCap: Int, words: Int = 1, corpusN: Long = 0L) {
  require(words >= 1 && bands % words == 0,
    s"bands=$bands must split evenly across words=$words")
  require(bands >= 1 && slotBits >= 1 && (bands / words) * slotBits <= 62,
    s"each signature word must fit a positive long: " +
      s"bands=$bands slotBits=$slotBits words=$words")
  require(bandBits >= 1 && bandBits <= slotBits,
    s"bandBits=$bandBits outside [1, $slotBits]")
  require(bucketCap >= 1)
  /** Total hyperplanes in the signature (across all words). */
  def planes: Int = bands * slotBits
  /** Bands carried per signature word. */
  def bandsPerWord: Int = bands / words
  /** Hyperplanes per signature word (= one word's bit width). */
  def planesPerWord: Int = bandsPerWord * slotBits
  /** Low-bits bucket mask for one band. */
  def mask: Long = (1L << bandBits) - 1
}

object AnnParams {
  /** Bands per signature. 4 OR-ed chances to collide — the recall dial
    * that does NOT grow candidate cost superlinearly. */
  val Bands = 4
  /** Hyperplanes per band slot (signature width = 4 × 15 = 60 bits:
    * the max the oracle's signed-BIGINT sum can carry, giving r
    * headroom up to 32 768 buckets/band at the clamp). */
  val SlotBits = 15
  /** Expected members per (band, bucket) the derivation targets. */
  val TargetOccupancy = 64L
  /** Hard per-(band, bucket) posting-list cap (8 × target): bounds
    * worst-case candidates under skew at bands · n · cap. */
  val BucketCap = 512

  /** r = clamp(⌈log₂(n / TargetOccupancy)⌉, 4, SlotBits), computed via
    * the SAME integer threshold ladder the generated oracle SQL embeds
    * ([[graft.queries.AnnSql.bandBitsCase]]) — `find` over
    * `n <= TargetOccupancy · 2^r` so the two engines cannot disagree
    * at a boundary (no floating log).
    *
    * CEILING (the honest limit of the single-word layout): the 60-bit
    * signature fixes r ≤ 15, so past n ≈ TargetOccupancy · 2¹⁵ ≈ 2.1 M
    * vectors the clamp saturates, expected occupancy grows linearly
    * again, and recall leans entirely on the bucket cap + Hamming-1
    * re-probe. The next rung is the WIDE layout ([[forCountWide]]):
    * the same 4 bands split across TWO signature words (30-bit slots,
    * r ≤ 30 — occupancy stays at target out to ~6.9 · 10¹⁰ vectors),
    * same integer ladder, same generated-oracle discipline
    * ([[graft.queries.AnnSql.simsCtesWide]]). */
  def bandBitsFor(n: Long): Int =
    (4 until SlotBits).find(r => n <= (TargetOccupancy << r))
      .getOrElse(SlotBits)

  def forCount(n: Long): AnnParams =
    AnnParams(Bands, SlotBits, bandBitsFor(n), BucketCap, corpusN = n)

  /** Hyperplanes per band slot in the WIDE two-word layout: 2 bands ×
    * 30 bits per BIGINT word (60 bits — the same signed-64 headroom
    * contract per word as the single-word layout). */
  val WideSlotBits = 30

  /** The wide layout's r ladder — same integer `find`, ceiling 30:
    * occupancy stays at [[TargetOccupancy]] out to
    * 64 · 2³⁰ ≈ 6.9 · 10¹⁰ vectors (vs 2.1 M for the 15-bit clamp). */
  def bandBitsForWide(n: Long): Int =
    (4 until WideSlotBits).find(r => n <= (TargetOccupancy << r))
      .getOrElse(WideSlotBits)

  /** Wide two-word parameters for corpora past the single-word clamp:
    * 4 bands × 30-bit slots across two BIGINT words. Both layouts run
    * the same capped-banding plan ([[graft.sim.Similarity
    * .lshCandidateSims]] branches only on the per-word bucket
    * extraction) and both have generated DuckDB oracles. */
  def forCountWide(n: Long): AnnParams =
    AnnParams(Bands, WideSlotBits, bandBitsForWide(n), BucketCap, words = 2,
      corpusN = n)

  /** The pre-derivation legacy layout (contiguous r-bit bands, no cap) —
    * kept for spec-level A/Bs of the banding algebra itself; registered
    * queries all use [[forCount]]. */
  def pinned(planes: Int, bands: Int): AnnParams =
    AnnParams(bands, planes / bands, planes / bands, Int.MaxValue)

  /** Corpus counts memoized by caller key (a testdata dir): the count
    * is a parquet-metadata job, but every sim query in a bench run
    * would otherwise re-pay it. Data under a key is immutable for a
    * session's lifetime (same contract as the normalized-corpus
    * cache). */
  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** The memoized corpus count itself — shared by every corpus-size-
    * derived parameter (band bits here, trained-codebook cell counts in
    * the IVF family). The memo key folds in the corpus plan's semantic
    * hash, not the caller key alone: a caller passing a FILTERED or
    * derived relation under the same testdata key must get its own
    * count, not the first caller's full-corpus count (which would
    * silently derive wrong band bits). */
  def corpusCount(corpus: DataFrame, cacheKey: Option[String] = None): Long =
    cacheKey match {
      case Some(k) =>
        val key = s"$k#${corpus.queryExecution.analyzed.semanticHash()}"
        countMemo.computeIfAbsent(key, _ => corpus.count()).longValue()
      case None => corpus.count()
    }

  def forCorpus(corpus: DataFrame, cacheKey: Option[String] = None): AnnParams =
    forCount(corpusCount(corpus, cacheKey))

  /** Drop memoized counts (suite teardown hygiene). */
  def clearMemo(): Unit = countMemo.clear()
}
