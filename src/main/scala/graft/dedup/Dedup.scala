package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Text

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), n-gram Jaccard, MinHash+LSH, SimHash. (Extension surface —
  * BASELINE.json north star.)
  *
  * Design for 100 TB:
  *  - exact dedup = one hash shuffle on the content fingerprint;
  *  - Jaccard verification only ever runs on CANDIDATE pairs (LSH-bucketed),
  *    never the O(n²) cross join — [[jaccardPairs]]'s all-pairs shape is the
  *    small-data oracle baseline, [[minhashLshPairs]] is the scale path;
  *  - all hashing is md5-based (DuckDB-reproducible, no JVM hash seeds), so
  *    results are deterministic across engines, partitionings, and reruns.
  */
object Dedup {

  /** Word n-gram shingles (distinct) from a token array. Guarded: Spark's
    * `sequence(1, 0)` would generate a DESCENDING sequence, so short docs
    * (< n tokens) explicitly get an empty shingle set.
    * Reference formulation in built-in HOFs; the hot path uses
    * [[shinglesFast]] (same semantics, one eval per document). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))

  /** Custom-expression shingles straight from the text column
    * ([[graft.plans.ShinglesExpr]]) — bit-identical to
    * `shingles(Text.tokens(text), n)` but ~10× cheaper per row (one JVM
    * eval instead of interpreted per-element lambdas). */
  def shinglesFast(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.ShinglesExpr(
        org.apache.spark.sql.GraftBridge.expression(text), n))

  /** Custom-expression MinHash signature over a shingle array
    * ([[graft.plans.MinHashSigExpr]]) — bit-identical to
    * [[minhashSignature]]. */
  def minhashSigFast(shingleArr: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.MinHashSigExpr(
        org.apache.spark.sql.GraftBridge.expression(shingleArr), k))

  /** Exact dedup by content key: keeps the row with the minimal `idCol` per
    * key (deterministic survivor). One shuffle on the key — the minimal
    * cost of exact dedup at any scale. */
  def exactDedup(df: DataFrame, keyCol: Column, idCol: String): DataFrame = {
    val withKey = df.withColumn("__key", keyCol)
    val survivors = withKey.groupBy("__key").agg(min(col(idCol)).as(idCol))
    withKey.join(survivors, Seq("__key", idCol), "inner").drop("__key")
  }

  /** All-pairs n-gram Jaccard similarity join: explode distinct shingles,
    * self-join on shingle, count intersections, filter by threshold.
    * Exact but quadratic in shingle-bucket size — the right form when
    * buckets are small (near-unique shingles, as in the testdata corpus:
    * measured 1.5 s vs the prefix variant's 3+ s at sf0.1, because the
    * prefix pipeline's extra ranking/verify stages cost more than the
    * small self-join they avoid). For duplicate-heavy corpora whose
    * buckets grow, use [[jaccardPairsPrefix]] (identical output,
    * spec-asserted) or the [[minhashLshPairs]] scale path. This is also
    * the DuckDB-oracle shape. Returns (id_a, id_b, jaccard), id_a < id_b. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // Exchange boundary: `sh` feeds three consumers (both join sides +
    // sizes); the repartition makes the subtrees identical so Spark's
    // ReusedExchange computes the shingle explosion ONCE instead of 3×.
    val sh = docs.select(col(idCol).as("id"),
        explode(shinglesFast(col(textCol), n)).as("sh"))
      .repartition(col("id"))
      .select("id", "sh")
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Vocabulary cap under which the broadcast integer-dictionary plan
    * is used by the exact-Jaccard/containment scale paths (~1 M distinct
    * shingles × (string + long) stays a few tens of MB broadcast). */
  val DictVocabMax = 1000000L

  /** Σ df² budget for the posting-join branch (VERDICT r12 #4): the
    * posting self-join emits ≈ Σ_sh C(df_sh, 2) ≈ Σdf²/2 rows before
    * its partial agg, and with a FIXED hot vocabulary Σdf² grows
    * QUADRATICALLY in corpus size even though the vocabulary count
    * stays small — so the branch switch must key on the measured Σdf²,
    * not vocabulary count alone. Anchor: the sf1 hot corpus measures
    * Σdf² ≈ 10⁹ → 25 s at local[32], the regime's optimum; 2·10¹⁰ is
    * ~20× that — past it the quadratic join's shuffle dominates any
    * verify cost the prefix plan could pay, hot vocabulary or not.
    * A corpus that is BOTH huge and hot-vocab degrades either exact
    * plan (prefix prefixes are hot too) — the documented escape hatch
    * at that regime is the MinHash/LSH estimate path
    * ([[minhashLshPairs]], `d_minhash_est` measures its accuracy),
    * which is what production dedup runs at 100 TB anyway. */
  val SumDf2Max = 20000000000L

  /** The adaptive-plan cost probe shared by [[jaccardPairsPrefix]] and
    * [[graft.queries.OverlapQ.containmentPairs]]: ONE aggregate job over
    * the (checkpointed) shingle relation returns the vocabulary count
    * and Σ df² together; the broadcast-dictionary posting join is only
    * taken when BOTH fit (dictionary broadcastable AND join output
    * bounded). Σ df² rides DECIMAL(38,0) — df can reach corpus size, so
    * the long square overflows past ~3·10⁹ docs on one shingle. */
  private[graft] def postingJoinFits(sh: DataFrame,
      dictVocabMax: Long, sumDf2Max: Long): Boolean = {
    if (dictVocabMax <= 0L) return false
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val st = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("vocab_n"),
        sum(col("df").cast(d38) * col("df")).as("sum_df2"))
      .head()
    val vocabN = st.getLong(0)
    val sumDf2 = Option(st.getDecimal(1))
      .map(BigDecimal(_)).getOrElse(BigDecimal(0))
    vocabN <= dictVocabMax && sumDf2 <= BigDecimal(sumDf2Max)
  }

  /** Exact all-pairs n-gram Jaccard — the SCALE path to
    * [[jaccardPairs]]' deliberately naive shape, with identical output
    * (spec-asserted). The plan is ADAPTIVE on the measured shingle
    * vocabulary (one distinct-count job over a checkpointed shingle
    * relation — the AQE-style driver decision):
    *
    *  - vocabulary ≤ `dictVocabMax`: the broadcast INTEGER-DICTIONARY
    *    posting join. On a small-hot vocabulary NO shingle is rare
    *    (the testdata corpus: 27 k distinct shingles over 60 k sf1
    *    docs, min df ≈ 50), so any rarest-first prefix still yields
    *    millions of candidates and pays more in verification than the
    *    posting join it avoids (measured: prefix 87.7 s vs naive 19 s
    *    at sf1/local[32]); the optimal exact plan is the posting join
    *    itself on 16-byte int rows instead of ~30-byte strings.
    *  - vocabulary > `dictVocabMax` (real text at scale: Zipfian df
    *    with a massive rare tail): PPJoin-style PREFIX FILTERING.
    *    Lemma: order every document's shingles by one global total
    *    order — ascending corpus frequency, ties by value — and keep
    *    the first |d| − ⌈τ·|d|⌉ + 1. Any pair with J ≥ τ has overlap
    *    ≥ ⌈τ·max(|a|,|b|)⌉, and two sets with overlap ≥ t sorted by
    *    the same order must share an element inside their
    *    (|·|−t+1)-prefixes — every qualifying pair survives candidate
    *    generation, and exact verification discards false positives.
    *    Frequency-ascending order makes the surviving join keys the
    *    RARE tail with small postings (`d_jaccard_ab_prefix` measures
    *    the win on a derived rare-tail corpus).
    *
    * The dictionary branch is gated on BOTH the vocabulary count and
    * the measured Σ df² ([[SumDf2Max]] — the posting join's output
    * size, which grows quadratically in corpus size on a FIXED hot
    * vocabulary): both stats come from ONE aggregate job over the
    * checkpointed shingle relation, so the cost model costs one action.
    * `dictVocabMax` = 0 forces the prefix branch (the registered A/B
    * row and the equivalence specs exercise it at every scale). */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      dictVocabMax: Long = DictVocabMax,
      sumDf2Max: Long = SumDf2Max): DataFrame = {
    // Checkpointed: the branch-stats aggregate is its own action, and
    // exchange reuse does not span jobs.
    val sh = docs.select(col(idCol).as("id"),
        explode(shinglesFast(col(textCol), n)).as("sh"))
      .repartition(col("id"))
      .select("id", "sh")
      .localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    if (postingJoinFits(sh, dictVocabMax, sumDf2Max)) {
      val dic = broadcast(sh.select("sh").distinct()
        .withColumn("shid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("sh"))))
      val si = sh.join(dic, "sh").select("id", "shid")
      val inter = si.as("a").join(si.as("b"),
          col("a.shid") === col("b.shid") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("n_inter"))
      return inter
        .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
        .filter(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    }
    // df, prefix rank, and doc size come from windows over ONE relation
    // (count-over-sh, then rank/count-over-id) — the earlier
    // freq-groupBy + two joins re-shuffled the full shingle relation
    // twice more for the same numbers.
    val prefix = sh
      .withColumn("freq", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("freq", "sh")))
      .withColumn("nsh", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")))
      .filter(col("rk") <= col("nsh") - ceil(lit(threshold) * col("nsh")) + 1)
      .select("id", "sh")
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Verify by EQUI-joining the second side on (id_b, sh): keying on
    // id_b alone and filtering sh_a = sh_b afterwards materializes the
    // per-pair CARTESIAN of shingle lists (Σ |Sa|·|Sb| rows — measured
    // losing to the naive join at sf1, 90.2 s vs 73.4 s); with the
    // shingle in the join key the verify stage is Σ |Sa| hash probes.
    val inter = candidates
      .join(sh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature as an array of `k` hex-string minima:
    * sig[i] = min over shingles s of md5(i || '|' || s).
    * String minima are lexicographic — identical in any engine — and md5
    * needs no seed management. k=16 with 4-row bands gives the standard
    * (4,4) LSH S-curve. */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleArr,
        s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** MinHash + LSH banding + exact-Jaccard verification.
    *
    * Pipeline: shingle → k-hash signature → band buckets (md5 of each
    * r-slice) → explode bands → self-join per (band, bucket) → distinct
    * candidate pairs → verify with exact Jaccard ≥ threshold.
    *
    * At 100 TB the band join shuffles only (band, bucket) keys — docs
    * collide only when a full band matches — and verification touches
    * candidate pairs, not n². Returns (id_a, id_b, jaccard). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    // The repartitions (inside the helpers) are deliberate exchange
    // boundaries. Catalyst's project-collapsing would otherwise inline the
    // shingle-construction tree into the k-hash signature lambda (k×
    // recompute per doc) and the signature tree into every band slice
    // (another bands×) — measured 26s vs ~2s at sf0.1. Materializing each
    // stage costs one tiny shuffle of (id, small array); the shArr
    // exchange is additionally REUSED by the verification explode
    // (ReusedExchange), so shingling runs once for the whole pipeline.
    val shArr = shingleArrays(docs, idCol, textCol, n)
    val banded = lshBandIndexFromShingles(shArr, k, bands)
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccardPairs(candidates, shArr, threshold)
  }

  /** Materialized per-doc shingle arrays (id, sh) — the shared first
    * stage of the LSH pipeline and of candidate verification. */
  private def shingleArrays(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    docs.select(col(idCol).as("id"), shinglesFast(col(textCol), n).as("sh"))
      .repartition(col("id"))

  /** Band-bucket rows (id, band, bucket) from materialized shingle
    * arrays. Banding is PER-DOC deterministic — a doc's buckets depend
    * only on its own text, never on the rest of the corpus — which is
    * exactly what makes the index append-mergeable:
    * index(A ∪ B) = index(A) ∪ index(B), row for row. */
  private def lshBandIndexFromShingles(shArr: DataFrame, k: Int,
      bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    shArr
      .select(col("id"), minhashSigFast(col("sh"), k).as("sig"))
      .repartition(col("id"))
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            md5(concat_ws("|", slice(col("sig"), b * lit(r) + lit(1), lit(r)))).as("bucket"))))
          .as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** The persisted LSH artifact for [[minhashLshPairsIncremental]]:
    * (id, band, bucket) rows for a corpus, buildable once and appended
    * per ingest batch (the [[graft.io.Sinks.appendWithManifest]]
    * discipline applied to the dedup index). */
  def lshBandIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4): DataFrame =
    lshBandIndexFromShingles(shingleArrays(docs, idCol, textCol, n), k, bands)

  /** Exact-Jaccard verification of candidate pairs against materialized
    * shingle arrays: one explode + two candidate-sided joins + a pair
    * partial-agg — touches candidates, never n². */
  private def verifyJaccardPairs(candidates: DataFrame, shArr: DataFrame,
      threshold: Double): DataFrame = {
    val sh = shArr.select(col("id"), explode(col("sh")).as("sh"))
      .repartition(col("id"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    // Verify by EQUI-joining the second side on (id_b, sh): keying on
    // id_b alone and filtering sh_a = sh_b afterwards materializes the
    // per-pair CARTESIAN of shingle lists (Σ |Sa|·|Sb| rows — measured
    // losing to the naive join at sf1, 90.2 s vs 73.4 s); with the
    // shingle in the join key the verify stage is Σ |Sa| hash probes.
    val inter = candidates
      .join(sh.select(col("id").as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Incremental near-dup detection after a corpus APPEND — the
    * continuous-ingest path: with index(A) already on disk, a new batch B
    * needs only index(B) built (|B| docs shingled, not |A∪B|) and the
    * band join run NEW-sided: newIndex ⋈ (oldIndex ∪ newIndex). The A×A
    * side — the quadratically dominant part of a cold rerun — is never
    * recomputed.
    *
    * Exactness law (spec-asserted): banding is per-doc deterministic, so
    * a pair collides in the incremental run iff it collides in a cold run
    * of A∪B; hence pairs(A∪B) = pairs(A) ∪ incremental(B), with the
    * identical exact-Jaccard verification on the shared shingle arrays of
    * `allDocs` (only candidate-pair docs are ever exploded).
    * Returns (updatedIndex, newPairs): the index to persist for the next
    * batch and the pairs touching ≥ 1 new doc. */
  def minhashLshPairsIncremental(oldIndex: DataFrame, newDocs: DataFrame,
      allDocs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): (DataFrame, DataFrame) = {
    val newIndex = lshBandIndex(newDocs, idCol, textCol, n, k, bands)
    val full = oldIndex.unionByName(newIndex)
    val candidates = newIndex.as("a").join(full.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val shArr = shingleArrays(allDocs, idCol, textCol, n)
    (full, verifyJaccardPairs(candidates, shArr, threshold))
  }

  /** 64-bit md5-derived token hash (first 16 hex chars → long, bit 63 in
    * the sign bit). Seedless and engine-portable, unlike JVM/xxhash
    * hashes. Built from two 32-bit `conv` halves because conv's unsigned
    * decimal string for values ≥ 2^63 doesn't survive a signed-long cast;
    * `shiftleft` wraps into the sign bit exactly like the JVM kernel. */
  def tokenHash64(t: Column): Column =
    shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))

  /** 64-bit SimHash table: (id, simhash).
    *
    * Classic SimHash: for each bit j, sum +1/−1 votes of every distinct
    * token's hash bit j; simhash bit j is set where the vote is positive.
    * 64 bits so pigeonhole banding gets 16-bit bands (65k buckets/band) —
    * the 100 TB requirement; see [[graft.plans.TextKernels.simhash64]].
    * Near-dup = [[hamming]] distance ≤ k between simhashes. */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    docs.select(Seq(col(idCol).as("id"),
      org.apache.spark.sql.GraftBridge.column(
        graft.plans.SimHashExpr(
          org.apache.spark.sql.GraftBridge.expression(col(textCol))))
        .as("simhash")) ++ carryCols.map(col): _*)

  /** Reference DataFrame formulation of [[simhashTable]] (explode tokens ×
    * bits → two key-partitioned vote aggregations — shuffles only (id, j)
    * vote rows, never an n² pair set). Kept as the equivalence baseline
    * for the custom expression — see ExtensionsSpec. Bit ops go through
    * SQL `shiftrightunsigned`/`shiftleft` (column shift amounts aren't in
    * the Scala Column API, and a pow(2.0, j)-based formulation would lose
    * bits ≥ 53 to double precision). */
  def simhashTableHof(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokenHashes = docs.select(col(idCol).as("id"),
        explode(array_distinct(Text.tokens(col(textCol)))).as("tok"))
      .select(col("id"), tokenHash64(col("tok")).as("h"))
    val votes = tokenHashes
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(63))).as("j"))
      .withColumn("bit", expr("shiftrightunsigned(h, j) & CAST(1 AS BIGINT)"))
      .groupBy("id", "j")
      .agg(sum(col("bit") * lit(2L) - lit(1L)).as("vote"))
    votes.groupBy("id")
      .agg(sum(when(col("vote") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(lit(0L))).as("simhash"))
  }

  /** SimHash near-dup pairs at `maxHamming` via pigeonhole banding: split
    * the 64-bit signature into maxHamming+1 bands — any pair within the
    * Hamming budget must agree EXACTLY on at least one band — then
    * equi-join per (band, bandValue) and verify the true distance.
    * Identical output to the all-pairs formulation, but candidate
    * generation is a hash join on band values instead of an n² nested
    * loop. With the default maxHamming=3 each band is 16 bits → 65,536
    * buckets per band, so collisions track true-duplicate density rather
    * than the ~n²/256 a 32-bit/8-bit-band scheme degrades to at corpus
    * scale. Band values are extracted with unsigned shifts (exact for all
    * 64 bits; the double-arithmetic alternative is not). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    val bandBits = 64 / bands
    val mask = (1L << bandBits) - 1
    val sh = simhashTable(docs, idCol, textCol).repartition(col("id"))
    val banded = sh.select(col("id"), col("simhash"),
        explode(array((0 until bands).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * bandBits)
            .bitwiseAND(lit(mask)).as("band_val"))): _*)).as("bb"))
      .select(col("id"), col("simhash"),
        col("bb.band").as("band"), col("bb.band_val").as("band_val"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
    candidates
      .select(col("id_a"), col("id_b"),
        hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Connected components over an undirected pair list — the step that
    * turns near-dup PAIRS into duplicate CLUSTERS (pairs alone can't
    * drive keep-one-per-group dedup: a≈b and b≈c must collapse into one
    * {a,b,c} group even when a≉c directly).
    *
    * Min-label propagation: every node starts labeled with its own id;
    * each round replaces a node's label with the minimum over itself and
    * its neighbors; at fixpoint each component carries its minimum id.
    * Rounds are pure DataFrame join+agg (one shuffle each), so the work
    * is |edges| per round with no driver-side graph state; convergence
    * is detected by the label-sum aggregate (labels only ever decrease,
    * so an unchanged sum IS the fixpoint). Each round ends in an eager
    * `localCheckpoint`, which truncates the growing lineage — the
    * standard Spark idiom for iterative algorithms.
    *
    * Round count is the component diameter. Near-dup clusters are
    * shallow (a handful of variants of one document), so this converges
    * in 2–4 rounds at any corpus size; if the graph turns out deeper
    * than `shallowRounds`, the implementation AUTO-SWITCHES to
    * [[connectedComponentsStar]] — alternating large-star/small-star
    * contraction, the published O(log n)-round fix for adversarially
    * long chains — with the same per-round shuffle shape and identical
    * output (property-tested equality incl. a long-chain case).
    *
    * Returns (id, cluster_id) for every node that appears in a pair. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 20,
      shallowRounds: Int = 8): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint()
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum(col("label"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var cur = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < math.min(maxIter, shallowRounds)) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "u"), Seq("u"))
        .groupBy(col("v").as("id")).agg(min(col("label")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == cur
      cur = s
      labels = next
      it += 1
    }
    if (converged) labels.select(col("id"), col("label").as("cluster_id"))
    // deeper than any near-dup cluster should be — contract in O(log n)
    else connectedComponentsStar(pairs, aCol, bCol, maxIter)
  }

  /** SemDeDup cell-count rule: k ≈ ⌈corpus / expectedCellSize⌉ cells
    * (min 2). SemDeDup runs 10⁴-10⁵ cells over ~10⁸-10⁹ items, i.e.
    * roughly 10³-10⁴ items per cell — cells must GROW IN NUMBER with the
    * corpus, or the within-cell pair join degenerates quadratic. A pinned
    * k that was right at one scale is the classic 100× trap; this rule is
    * the default so [[semanticDedup]] stays scale-correct without caller
    * diligence. Integer ceiling ⌈n/s⌉ matches the oracle's
    * `GREATEST(2, CEIL(COUNT(*) / s))` exactly.
    *
    * Honest limit: the flat centroid BROADCAST in [[graft.sim.KMeans]]
    * holds to ~10⁵-10⁶ cells (low-hundreds of MB of codebook); past
    * that — ~10⁹ docs at this cell size — cluster in two levels (coarse
    * cells via a small codebook, then per-cell sub-clustering), the
    * same decomposition [[graft.sim.PQ]] already uses across subspaces
    * and [[graft.sim.Similarity.ivfTopK]] uses for probing. */
  def semanticCellCount(n: Long, expectedCellSize: Long = 1024L): Int = {
    val k = math.max(2L, (n + expectedCellSize - 1) / expectedCellSize)
    // loud, not wrapped: .toInt past Int.MaxValue would silently go
    // negative and feed a nonsensical k into KMeans.fit
    require(k <= Int.MaxValue.toLong,
      s"cell count $k for n=$n overflows Int — raise expectedCellSize " +
        "(or cluster in two levels; see the Honest limit note above)")
    k.toInt
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023) over an
    * embedding column — the cluster-scoped variant of embedding near-dup
    * that makes all-pairs cosine tractable at corpus scale: k-means
    * cells bound the candidate pairs (SemDeDup's observation: semantic
    * duplicates share a cluster), within-cell pairs above `tau` become
    * duplicate edges, connected components group them, and the minimum
    * id per component survives.
    *
    * Composition of already-verified pieces: [[graft.sim.KMeans.fit]]
    * (deterministic fixed-point cells), the codegen'd cosine kernel on
    * [[graft.sim.Similarity.normalized]] vectors (4dp-rounded — exact
    * across engines), and [[connectedComponents]]. At 100 TB, k scales
    * with the corpus (SemDeDup uses ~10⁴-10⁵ cells) so each cell's pair
    * join stays small; the cell equi-join is the only shuffle beyond
    * training.
    *
    * Returns one row per input vector: (vec_id, group_id = component
    * minimum or self, keep = 1 iff this id is its group's survivor). */
  def semanticDedup(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", k: Int = 0, iters: Int = 1,
      tau: Double = 0.4, trainBuckets: Int = 1): DataFrame = {
    // k <= 0 → the SemDeDup scaling rule: the operator is scale-correct
    // by default instead of by caller diligence. The count is one
    // aggregate job; callers that already know the corpus size can pin
    // k to skip it.
    val kk = if (k > 0) k else semanticCellCount(emb.count())
    val assigned = graft.sim.KMeans.fit(emb, idCol, vecCol, kk, iters,
        trainBuckets)
      .select(col("id"), col("cid"))
    val cells = graft.sim.Similarity.normalized(emb, idCol, vecCol)
      .join(assigned, Seq("id"))
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(graft.sim.Similarity.dotFast(col("a.nv"), col("b.nv")), 4)
          .as("sim"))
      .filter(col("sim") >= tau)
    val cc = connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "vec_id")
    emb.select(col(idCol).as("vec_id"))
      .join(cc, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("group_id"),
        (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id"))
          .cast("int").as("keep"))
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond") — the
    * adversarial-diameter path: converges in O(log n) rounds on ANY
    * graph, vs diameter rounds for label propagation, with the same
    * per-round cost shape (one groupBy + one join over |edges|).
    *
    * State is a canonical directed edge list (u → v, u > v).
    * large-star: for each node u with symmetric neighborhood N(u) and
    * m = min(N(u) ∪ {u}), rewire every LARGER neighbor v > u to m.
    * small-star: for each u over its smaller neighbors N≤(u) with
    * m = min(N≤(u)), rewire the non-min smaller neighbors and u itself
    * to m. Both emit only big→small edges, so the canonical form is
    * stable; the fixpoint is a forest of depth-1 stars rooted at each
    * component's minimum id. Convergence is detected by a multiset
    * signature (count + hash sum) of the edge list going stable —
    * edge-set equality without a join.
    *
    * Incremental connected components after an edge APPEND — the
    * change-feed recompute path ([[graft.io.Sinks.readChanges]] feeds
    * `newPairs`; VERDICT r8 item 2). Appends only ever MERGE
    * components, so the prior labeling is a valid coarsening of the new
    * one and the recompute can run entirely on the CONTRACTED graph:
    *
    *  1. each new edge (u, v) maps to its endpoints' prior cluster ids
    *     (nodes unseen before act as their own singleton cluster) —
    *     |Δ| rows, one broadcast-or-shuffle join against the prior
    *     labels, the only time they are scanned;
    *  2. super-edges whose endpoints already share a cluster are
    *     dropped (intra-component appends are a no-op by construction);
    *  3. [[connectedComponents]] runs on the remaining super-graph —
    *     ≤ |Δ| edges, NOT |E| — so per-round shuffles are delta-sized
    *     and the round count is the super-graph diameter (usually 1);
    *  4. the merged labels map back over the prior labeling with one
    *     join; prior clusters untouched by Δ pass through unchanged.
    *
    * Exactness: a prior cluster id IS the min member id, and min-label
    * CC over the contraction returns min over member cluster ids =
    * min member id of the merged component — so the result is
    * label-for-label identical to a cold [[connectedComponents]] over
    * old ∪ new pairs (GraphSpec asserts it, along with the cost law:
    * zero full-graph edge scans). Returns (labels, superEdgeCount) —
    * the count is the one-row "how much merging happened" telemetry;
    * 0 means the append changed nothing and labels pass through. */
  def ccIncremental(prevLabels: DataFrame, newPairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): (DataFrame, Long) = {
    val prev = prevLabels.select(col("id").cast("long").as("id"),
      col("cluster_id").cast("long").as("cluster_id"))
    val e = newPairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
    def toSuper(side: String): Column = coalesce(col(s"l_$side"), col(side))
    val superEdges = e
      .join(prev.select(col("id").as("u"), col("cluster_id").as("l_u")),
        Seq("u"), "left")
      .join(prev.select(col("id").as("v"), col("cluster_id").as("l_v")),
        Seq("v"), "left")
      .select(toSuper("u").as("su"), toSuper("v").as("sv"))
      .filter(col("su") =!= col("sv"))
      .localCheckpoint()
    val nSuper = superEdges.count()
    // New-node rows enter the labeling as their own singletons so the
    // output covers every node of old ∪ new, like a cold run would.
    val allNodes = prev
      .union(e.select(col("u").as("id"), col("u").as("cluster_id")))
      .union(e.select(col("v").as("id"), col("v").as("cluster_id")))
      .groupBy("id").agg(min(col("cluster_id")).as("cluster_id"))
    if (nSuper == 0L) (allNodes, 0L)
    else {
      val merged = connectedComponents(superEdges, "su", "sv")
        .toDF("cluster_id", "m") // (old cluster id → merged component min)
      val relabeled = allNodes
        .join(merged, Seq("cluster_id"), "left")
        .select(col("id"), coalesce(col("m"), col("cluster_id")).as("cluster_id"))
      (relabeled, nSuper)
    }
  }

  /** Output contract is IDENTICAL to [[connectedComponents]]:
    * (id, cluster_id = component minimum) for every node in a pair. */
  def connectedComponentsStar(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 30): DataFrame = {
    val raw = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    var edges = raw
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min("v").as("m"))
      val moved = e.join(m, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val self = m.select(col("u"), col("m").as("v"))
      moved.union(self).distinct()
    }

    def signature(e: DataFrame): (Long, String) = {
      // decimal accumulator: a long sum of 64-bit hashes overflows
      // (which ANSI mode rightly rejects)
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), String.valueOf(r.get(1)))
    }

    var cur = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val s = signature(next)
      converged = s == cur
      cur = s
      edges = next
      it += 1
    }
    require(converged, s"connectedComponentsStar: no fixpoint within $maxIter rounds")
    edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster_id")))
      .distinct()
  }

  /** Positional word n-grams: (idCol, pos, sh) with one row per n-gram
    * START position (0-based posexplode ordinal). Unlike [[shingles]] these
    * are NOT distinct — within-document repeats are the point. Docs shorter
    * than n contribute no rows (same short-doc guard as [[shingles]]). */
  def positionalShingles(docs: DataFrame, idCol: String,
      textCol: String, n: Int, carryCols: Seq[String] = Nil): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(col(idCol) +: carryCols.map(col) :+
        posexplode(when(size(toks) < n, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))): _*)
      .toDF(idCol +: carryCols :+ "pos" :+ "sh": _*)
  }

  /** Substring-level duplicate-SPAN detection — the relational
    * re-expression of exact-substring training-data dedup (Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better"):
    * every word n-gram occurring more than once in the corpus (across
    * documents OR repeated inside one) marks its start position as
    * duplicated; per document the operator reports total n-gram positions,
    * duplicated positions, the number of MAXIMAL contiguous duplicated
    * runs they merge into (`dup_spans` — the spans a scrubber would cut),
    * and `dup_ratio_bp` = ⌊dup·10⁴/total⌋ (integer basis points — the
    * removal-pressure score, no float division).
    *
    * 100 TB shape: positional shingling fuses into the scan (zero
    * shuffle); the duplicated-shingle set is ONE hash shuffle with
    * map-side partial counts; marking is a shingle equi-join whose dup
    * side AQE broadcasts when small; the run count is one (doc, pos)
    * window partitioned by document. Nothing is all-pairs. At open-vocab
    * scale, group on a 64-bit shingle hash (the md5-prefix idiom) instead
    * of the string to cut shuffle width — collisions only ever over-mark,
    * and the hash is oracle-replayable; the string form here is the exact
    * oracle baseline. */
  def duplicateNgramSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val sh = positionalShingles(docs, idCol, textCol, n)
    spanReport(docs, sh, markedDupPositions(sh, idCol), idCol, "dup")
  }

  /** Span-level benchmark decontamination (the GPT-3 appendix-C /
    * Lee et al. shape): every corpus n-gram that ALSO appears anywhere in
    * the benchmark set marks its position as contaminated; per corpus
    * document the report is (total_ngrams, contam_ngrams, contam_spans,
    * contam_ratio_bp) — the span-granular sibling of the doc-level
    * 3-gram-hit filter (`t_decontam`), for pipelines that cut the spans
    * instead of the document.
    *
    * 100 TB shape: the benchmark shingle set is corpus-independent and
    * SMALL (benchmarks are fixed suites) — one distinct + a semi-join the
    * optimizer broadcasts; everything else is [[duplicateNgramSpans]]'s
    * plan. */
  def benchmarkSpanOverlap(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val sh = positionalShingles(corpus, idCol, textCol, n)
    val benchSh = positionalShingles(benchmark, idCol, textCol, n)
      .select("sh").distinct()
    val marked = sh.join(benchSh, Seq("sh"))
      .select(col(idCol), col("pos"))
    spanReport(corpus, sh, marked, idCol, "contam")
  }

  /** Shared span-report aggregation: per document, total n-gram
    * positions, marked positions, maximal contiguous marked runs, and
    * the ⌊marked·10⁴/total⌋ integer ratio — columns named
    * (total_ngrams, ⟨p⟩_ngrams, ⟨p⟩_spans, ⟨p⟩_ratio_bp). */
  private def spanReport(docs: DataFrame, sh: DataFrame, marked: DataFrame,
      idCol: String, p: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
    val spans = marked.withColumn("prev", lag(col("pos"), 1).over(w))
      .groupBy(idCol).agg(
        count(lit(1)).as(s"${p}_ngrams"),
        sum(when(col("prev").isNull || col("pos") - col("prev") > 1, 1L)
          .otherwise(0L)).as(s"${p}_spans"))
    val tot = sh.groupBy(idCol).agg(count(lit(1)).as("total_ngrams"))
    docs.select(col(idCol))
      .join(tot, Seq(idCol), "left")
      .join(spans, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("total_ngrams"), lit(0L)).as("total_ngrams"),
        coalesce(col(s"${p}_ngrams"), lit(0L)).as(s"${p}_ngrams"),
        coalesce(col(s"${p}_spans"), lit(0L)).as(s"${p}_spans"),
        when(col("total_ngrams").isNull, lit(0L))
          .otherwise(expr(
            s"(coalesce(${p}_ngrams, CAST(0 AS BIGINT)) * 10000)" +
              " div total_ngrams"))
          .as(s"${p}_ratio_bp"))
  }

  /** Duplicated start positions over prepared positional shingles — the
    * mark set [[duplicateNgramSpans]] and [[removeDuplicateNgramSpans]]
    * aggregate, exposed for the streaming twin's batch-equivalence
    * contract ([[graft.streaming.Relay.spanDupStream]]). */
  def duplicateNgramPositions(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame =
    markedDupPositions(positionalShingles(docs, idCol, textCol, n), idCol)

  /** Duplicated start positions: (idCol, pos) for every n-gram whose
    * shingle occurs >1 time corpus-wide. One shuffle (partial-agg count
    * by shingle) + one equi-join back. */
  private def markedDupPositions(sh: DataFrame, idCol: String): DataFrame = {
    val dup = sh.groupBy("sh").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("sh")
    sh.join(dup, Seq("sh")).select(col(idCol), col("pos"))
  }

  /** The scrub half of exact-substring dedup: REBUILDS each document with
    * every duplicated n-gram span removed. A token is covered when any
    * duplicated n-gram's window [pos, pos+n-1] includes it; covered tokens
    * are dropped and the survivors are rejoined in order. Returns
    * (idCol, clean_text, n_tokens, n_removed) for every input document
    * (fully-duplicated docs come back with empty clean_text).
    *
    * 100 TB shape: covered-index expansion is an n-wide explode of only
    * the MARKED positions (∝ duplicated text, not corpus); the anti-join
    * and ordered rebuild shuffle on the document id; the rebuild
    * aggregates `array_sort(collect_list(struct(ti, tok)))` — order
    * restored deterministically inside the aggregate, so partitioning
    * never leaks into the output. */
  def removeDuplicateNgramSpans(docs: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val toks = split(col(textCol), " ")
    val sh = positionalShingles(docs, idCol, textCol, n)
    val marked = markedDupPositions(sh, idCol)
    val covered = marked
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("ti"))
      .distinct()
    val tokPos = docs
      .select(col(idCol), posexplode(toks))
      .toDF(idCol, "ti", "tok")
    val rebuilt = tokPos.join(covered, Seq(idCol, "ti"), "left_anti")
      .groupBy(idCol).agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("ti"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col(idCol), size(toks).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
