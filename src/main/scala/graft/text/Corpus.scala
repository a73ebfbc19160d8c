package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators a large-scale training-data pipeline needs
  * beyond cleaning/dedup: deterministic splits, stratified sampling, and
  * token-budget chunking. (Extension surface — BASELINE.json north star.)
  *
  * Everything here is hash- or window-deterministic (md5, no RNG state),
  * so splits are REPRODUCIBLE across engines, partitionings, reruns, and
  * cluster sizes — the property that makes a train/test split defensible
  * at 100 TB, where "sample(seed)" output depends on partitioning.
  */
object Corpus {

  /** Deterministic hash bucket in [0, buckets) from a key column: first 8
    * md5 hex chars → int. The same key lands in the same bucket on any
    * engine (DuckDB: ('0x' || substr(md5(k), 1, 8))::BIGINT % buckets).
    * Runs as the codegen'd [[graft.plans.Md5BucketExpr]] kernel — one
    * digest + integer ops per row instead of the hex/substring/conv
    * string churn; bit-identical to [[hashBucketHof]] (ExtensionsSpec). */
  def hashBucket(key: Column, buckets: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.Md5BucketExpr(
        org.apache.spark.sql.GraftBridge.expression(key.cast("string")),
        buckets.toLong))

  /** The declarative Column twin of [[hashBucket]], kept for the
    * bit-equality spec and as executable documentation of the oracle
    * form. */
  def hashBucketHof(key: Column, buckets: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Train/val/test split by key hash: percentages over 100 hash buckets.
    * Scale shape: one projection, no shuffle, no RNG — the split is a
    * pure function of the key, so late-arriving rows of a known document
    * always land in the same split (no leakage on reruns). */
  def splitByHash(df: DataFrame, keyCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "need a non-empty test slice")
    val b = hashBucket(col(keyCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified cap: at most `n` rows per stratum, chosen
    * by md5-rank of the key (not arrival order) — the standard
    * source-balancing step. One hash shuffle on the stratum key; the
    * rank's window sort is per-stratum, never global. */
  def stratifiedCap(df: DataFrame, strataCol: String, keyCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= n)
      .drop("__r")
  }

  /** Weighted source mixing — the epoch-composition op of a training-data
    * pipeline: each stratum gets a target weight expressed in integer
    * PERCENT (250 = 2.5 epochs of that source, 40 = keep 40%).
    * Upsampling emits `weight div 100` full copies of every document;
    * the fractional remainder keeps the deterministic md5 1-in-100
    * bucket slice (`weight % 100` buckets) — so a 2.5× source yields 2
    * copies of every doc plus a third copy of a stable half… no RNG,
    * reproducible on any engine, and late-arriving docs of a known id
    * always mix identically (the [[splitByHash]] leakage guarantee).
    *
    * Scale shape: one projection + `explode(sequence)` — no shuffle at
    * all; the copy multiplicity is bounded by max(weight) div 100 + 1.
    * Returns the input row + (copy: 0-based copy index). */
  def mixSources(df: DataFrame, weightPct: Column, keyCol: String): DataFrame = {
    val b = hashBucket(col(keyCol), 100)
    // integer `div`, not double-divide-then-truncate: bit-for-bit the
    // oracle's `//` floor for ANY long weight, keeping the module's
    // integer-arithmetic discipline
    df.withColumn("__copies",
        call_function("div", weightPct.cast("long"), lit(100L)) +
          when(b < weightPct.cast("long") % 100L, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic uniform k-of-n sample — the reservoir-sampling
    * equivalent without RNG or sequential state: keep the k rows with
    * the smallest (md5(key), key). The md5 order is independent of
    * every data attribute, so the pick is uniform over the key
    * population — the same guarantee a seeded reservoir gives, but
    * reproducible across engines, partitionings, and reruns (the
    * [[splitByHash]] property), and MERGEABLE: top-k of a union is the
    * top-k over the shards' top-ks, which is exactly what Spark's
    * TakeOrderedAndProject executes — per-partition partial top-k, one
    * k-row collect per partition, no global sort and no shuffle of the
    * full input. Growing the sample later (k' > k) keeps the old
    * sample as a strict prefix — samples are nested, the property
    * incremental eval sets rely on. */
  def sampleUniform(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc).limit(k)
  }

  /** Sliding-window chunking WITHIN a document — the RAG/embedding prep
    * cut ([[chunkByTokenBudget]] groups documents ACROSS a stream; this
    * splits one document into overlapping windows of `window` tokens at
    * `stride`-token steps, stride < window ⇒ the standard overlap that
    * keeps a fact spanning a boundary inside at least one chunk whole).
    * Pure per-row expression work — token split, a start-position
    * sequence explode, an array slice — no shuffle at all; output rows
    * ≈ n_tokens/stride per doc. Chunk text is carried as its md5 (the
    * downstream join key) plus (start_tok, n_tok) so the caller can
    * re-slice the original lazily instead of duplicating window/stride
    * copies of the corpus through the shuffle. */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol), Text.tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), greatest(size(col("__t")) - 1, lit(0)),
          lit(stride))).as("__start"))
      .select(col(idCol),
        expr(s"CAST(__start div $stride AS BIGINT)").as("chunk_id"),
        col("__start").cast("long").as("start_tok"),
        slice(col("__t"), col("__start") + 1, lit(window)).as("__ct"))
      .select(col(idCol), col("chunk_id"), col("start_tok"),
        size(col("__ct")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("__ct"))).as("chunk_md5"))
  }

  /** Content-defined chunking (CDC) WITHIN a document: a chunk boundary
    * falls AFTER any token whose local bigram (previous token + token)
    * md5-buckets to 0 mod `modulus` — boundaries are a pure function of
    * a 2-token content window, never of position. Insert a paragraph at
    * the top and every chunk below keeps its hash (only ids shift);
    * fixed-stride chunking ([[chunkSliding]]) instead invalidates every
    * downstream chunk — which is why CDC is the chunk-level dedup shape
    * at scale: edited/re-crawled pages re-chunk to mostly-identical
    * hashes (Muthitacharoen et al., SOSP 2001 — LBFS, re-expressed
    * relationally). Expected chunk length ≈ `modulus` tokens.
    *
    * Scale shape: ONE hash partition by `idCol` drives both window
    * passes (lag + running boundary count share the window spec) and
    * the chunk group-by; per-doc work is linear, docs are the parallel
    * unit. Curate3Spec asserts the shift-invariance law. */
  def chunkCdc(docs: DataFrame, idCol: String, textCol: String,
      modulus: Int): DataFrame = {
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    val w = Window.partitionBy(idCol).orderBy("pos")
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("bnd",
        when(lag(col("tok"), 1).over(w).isNotNull &&
          hashBucket(
            concat_ws(" ", lag(col("tok"), 1).over(w), col("tok")),
            modulus) === 0, 1L).otherwise(0L))
      .withColumn("chunk_id",
        sum(col("bnd")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
        count(lit(1)).as("n_tok"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_hash"))
  }

  /** Token-budget chunking for batch building: contiguous (by `orderCol`,
    * per `partCol`) documents are grouped into chunks of ~`budget` tokens
    * via chunk = floor(exclusive-prefix-sum / budget). A document that
    * straddles a budget boundary joins the chunk where it starts, so a
    * chunk can overflow by at most that one document — the standard
    * single-pass streaming formulation (exact greedy packing needs
    * sequential state; this is one window, deterministic, and
    * distributed). One shuffle on partCol + per-partition sort. */
  def chunkByTokenBudget(df: DataFrame, partCol: String, orderCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("chunk_id",
        floor((col("__cum") - col(tokenCol)) / lit(budget)).cast("long"))
      .drop("__cum")
  }

  /** EXACT greedy sequence packing — the sequential-state packing
    * [[chunkByTokenBudget]] documents as its gap: documents fill a bin
    * until the NEXT one would overflow `budget`, then a fresh bin opens,
    * so no bin ever exceeds the budget (except a single oversized
    * document in its own bin). This is the pretraining batch-builder
    * contract (context windows must not overflow), vs the prefix-sum
    * approximation's straddling chunks.
    *
    * Greedy fill is inherently a sequential fold, so the parallelism
    * unit is an explicit `shards` hash of the id. Within a shard the
    * fold is fully STREAMING: rows are hash-distributed on the shard,
    * Spark's external sort orders each partition by (shard, id) —
    * spillable, never a whole shard on the heap — and one mapPartitions
    * pass folds the sorted iterator with O(1) state (open-bin id +
    * running token count, the [[graft.streaming.Relay]] packStream
    * state shape), resetting at shard boundaries. The classic
    * secondary-sort layout: memory is bounded regardless of shard size.
    * Deterministic by construction — (shard, id-order) is a pure
    * function of the data — and the fold is replayable in SQL as a
    * recursive CTE, so the oracle is exact.
    *
    * Returns (doc_id, shard, bin, n_tokens): bin numbering is
    * per-shard, dense from 0. */
  def packGreedy(docs: DataFrame, budget: Long, shards: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        pmod(col(idCol), lit(shards.toLong)).cast("long").as("shard"),
        Text.tokenCount(col(textCol)).cast("long").as("len"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // Several shards can hash into one partition; the (shard, id)
        // sort makes each a contiguous run, so a shard-change resets
        // the open bin. State is O(1); the iterator never materializes.
        var shard = -1L // real shards are pmod >= 0
        var bin = 0L
        var cum = 0L
        it.map { case (id, sh, len) =>
          if (sh != shard) { shard = sh; bin = 0L; cum = len }
          else if (cum + len > budget) { bin += 1; cum = len }
          else cum += len
          (id, sh, bin, len)
        }
      }
      .toDF("doc_id", "shard", "bin", "n_tokens")
  }

  /** Shard plan with balance accounting — the pre-flight a training run
    * does before writing N output shards: every document is assigned a
    * deterministic [[hashBucket]] shard, and the plan reports per-shard
    * document and token mass plus two balance dials, `share_bp`
    * (shard's share of total tokens, basis points) and `skew_bp`
    * (shard mass vs the perfectly-even share, 10000 = exactly fair).
    * A shard whose skew_bp drifts far above 10000 is the one that
    * finishes last — the signal to re-key or raise N BEFORE the
    * multi-hour write, not after.
    *
    * Scale shape: one narrow projection (key hash + weight), one
    * partial-agg shuffle of N-bounded groups, then a 1-row total
    * broadcast onto N rows. No data-sized shuffle, no window over the
    * corpus; works identically at 500 docs and 10¹⁰. */
  def shardPlan(df: DataFrame, keyCol: String, weightCol: String,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val per = df
      .select(hashBucket(col(keyCol), shards).as("shard"),
        col(weightCol).cast("long").as("__w"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_tok"))
    per.crossJoin(broadcast(per.agg(sum(col("n_tok")).as("__tot"))))
      .withColumn("share_bp", expr("(n_tok * 10000) div __tot"))
      .withColumn("skew_bp", expr(s"(n_tok * 10000 * $shards) div __tot"))
      .select("shard", "n_docs", "n_tok", "share_bp", "skew_bp")
  }

  /** Deterministic WEIGHTED k-of-n sample — [[sampleUniform]]'s biased
    * sibling for quality- or length-weighted corpus selection: keep the
    * k rows with the smallest priority h div w, where h is the row's
    * 60-bit md5 key hash (uniform, data-independent) and w ≥ 1 the
    * integer weight. Doubling a row's weight halves its priority scale,
    * so selection odds grow monotonically with weight (the integer-
    * exact stand-in for the u^(1/w) exponential-clocks scheme, whose
    * pow/log have engine-dependent last ulps); weight-1 rows degrade to
    * exactly [[sampleUniform]]'s order. Same engine guarantees as the
    * uniform path: no RNG, reproducible across engines/partitionings/
    * reruns, TakeOrderedAndProject (per-partition partial top-k — no
    * global sort), and nested samples (k' > k keeps the old pick as a
    * prefix). Rows with NULL or sub-1 weight are excluded LOUDLY by
    * filter rather than silently sampled at weight 0.
    * Returns the input columns plus `prio`. */
  def sampleWeighted(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(col(weightCol).isNotNull && col(weightCol) >= 1)
      .withColumn("prio", expr(
        s"cast(conv(substring(md5(cast($keyCol as string)), 1, 15), 16, 10) " +
          s"as bigint) div cast($weightCol as bigint)"))
      .orderBy(col("prio").asc, col(keyCol).asc)
      .limit(k)
  }

  /** Length-bucketed batching audit — the padding-waste accounting a
    * training pipeline runs before choosing its batching strategy.
    * Sequences are padded to the longest row in their batch, so batching
    * by length bucket (`len div width`) instead of arbitrarily turns
    * per-batch pad waste from (global_max − len) into (bucket_max − len).
    * Per bucket: row count, true token mass, the bucket's pad-to-max
    * mass, `waste_bp` (pad overhead within the bucket, basis points) and
    * `save_bp` (tokens saved vs padding the same rows to the GLOBAL max
    * — the win length-bucketing buys).
    *
    * Scale shape: one narrow projection, one partial-agg shuffle of
    * (max_len div width)-bounded groups, then a 1-row global-max
    * broadcast onto those groups. Integer arithmetic throughout. */
  def lengthBuckets(df: DataFrame, lenCol: String, width: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val per = df
      .filter(col(lenCol).isNotNull && col(lenCol) >= 0)
      .select(expr(s"cast($lenCol as bigint) div $width").as("bucket"),
        col(lenCol).cast("long").as("__len"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__len")).as("sum_len"),
        max(col("__len")).as("bucket_max"))
    per.crossJoin(broadcast(per.agg(max(col("bucket_max")).as("__gmax"))))
      .select(col("bucket"), col("n_docs"), col("sum_len"), col("bucket_max"),
        expr("n_docs * bucket_max").as("padded"),
        expr("((n_docs * bucket_max - sum_len) * 10000) " +
          "div (n_docs * bucket_max)").as("waste_bp"),
        expr("((n_docs * __gmax - n_docs * bucket_max) * 10000) " +
          "div (n_docs * __gmax)").as("save_bp"))
  }

  /** Token-budget allocation across sources — the "how much of each
    * source fits in this training run" waterfall. Every source's fair
    * target is an equal share of `budget`; a source with less data than
    * its share is capped at what it has, and the leftover is
    * redistributed equally across the uncapped sources in a SECOND round
    * (two rounds documented and fixed — the greedy waterfall converges
    * for the common one-tier-of-small-sources case; remaining slack
    * after round two is reported, not silently lost, via the final
    * `alloc_tok` sum). Per source: available tokens, round-1 target,
    * final allocation, and `fill_bp` (allocation as basis points of
    * available — 10000 means the source is fully consumed; a source
    * repeatedly at 10000 across runs is the one to go collect more of).
    *
    * Scale shape: one partial-agg shuffle to |sources| rows, then 1-row
    * aggregates broadcast back onto those rows. Integer-exact. */
  def tokenBudget(df: DataFrame, srcCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val per = df
      .select(col(srcCol).as("source"), col(weightCol).cast("long").as("__w"))
      .groupBy("source").agg(sum(col("__w")).as("avail_tok"))
    val n = per.agg(count(lit(1)).as("__n"))
    val r1 = per.crossJoin(broadcast(n))
      .withColumn("want_tok", expr(s"cast($budget as bigint) div __n"))
      .withColumn("a1", expr("least(avail_tok, want_tok)"))
    val left = r1.agg(
      (lit(budget) - sum(col("a1"))).as("__left"),
      sum(when(col("avail_tok") > col("a1"), 1L).otherwise(0L)).as("__open"))
    r1.crossJoin(broadcast(left))
      .withColumn("a2", expr(
        "CASE WHEN avail_tok > a1 AND __open > 0 " +
          "THEN least(avail_tok, a1 + __left div __open) ELSE a1 END"))
      .select(col("source"), col("avail_tok"), col("want_tok"),
        col("a2").as("alloc_tok"),
        expr("CASE WHEN avail_tok = 0 THEN cast(0 as bigint) " +
          "ELSE (a2 * 10000) div avail_tok END").as("fill_bp"))
  }

  /** Curriculum phase assignment by a per-row integer difficulty score:
    * equal-width `phases` bands between the observed global [min, max]
    * (1-row agg broadcast — never a global sort or percentile pass, so
    * the banding is scale-free; exact-quantile phasing would need the
    * sort this deliberately avoids). Returns the input plus `phase`
    * (0-based, 0 = lowest score band). Typical use: score = a quality
    * or rarity proxy, train phase 0 → phases−1 (easy → hard). */
  def curriculumPhase(df: DataFrame, scoreCol: String,
      phases: Int): DataFrame = {
    require(phases >= 1, s"phases must be >= 1, got $phases")
    val bounds = df.agg(min(col(scoreCol)).cast("long").as("__mn"),
      max(col(scoreCol)).cast("long").as("__mx"))
    df.crossJoin(broadcast(bounds))
      .withColumn("phase", expr(
        s"cast(least($phases - 1, ((cast($scoreCol as bigint) - __mn) * $phases) " +
          "div (__mx - __mn + 1)) as int)"))
      .drop("__mn", "__mx")
  }
}
