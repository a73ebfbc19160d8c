package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable frequency / cardinality sketches, relationally.
  *
  * Both sketches here are the fixed-size summaries a 100 TB pipeline
  * keeps when the exact answer's state would grow with the data: the
  * Count-Min sketch (Cormode & Muthukrishnan 2005) answers point
  * frequency queries from d·w counters, and HyperLogLog (Flajolet et
  * al. 2007) estimates distinct counts from m max-of-leading-zeros
  * registers. The relational framing makes both MERGEABLE for free —
  * a sketch is a groupBy over deterministic hash cells, so map-side
  * partial aggregation IS the sketch merge, shard sketches combine by
  * the same aggregate (sum for CMS, max for HLL), and a streaming
  * update-mode aggregation maintains them incrementally.
  *
  * Exactness discipline: hashes are md5-derived integers (the house
  * kernel — `('0x' || substr(md5(k), 1, 8))::BIGINT % w` on the DuckDB
  * side), widths/registers are pure integer arithmetic, and the one
  * float op in the HLL estimator is a fixed literal expression tree
  * both engines evaluate identically. No RNG, no libm.
  */
object Sketch {

  /** The house md5 bucket: first 8 md5 hex chars of `key` → [0, w). */
  private def bucket(key: Column, w: Long): Column =
    pmod(conv(substring(md5(key), 1, 8), 16, 10).cast("long"), lit(w))

  /** Count-Min sketch of `tokCol`: `depth` independent hash rows ×
    * `width` columns; cell (r, c) counts tokens with h_r(tok) = c,
    * h_r = md5 of "r|tok". Returns (r, c, cnt) — at most depth·width
    * rows REGARDLESS of corpus size, the whole point: per-partition
    * partial aggregation collapses each partition to ≤ d·w cells
    * before the shuffle, so the shuffle volume is O(partitions·d·w),
    * not O(tokens), and two shards' sketches merge by summing cells
    * (spec-verified). */
  def countMin(toks: DataFrame, tokCol: String,
      depth: Int, width: Long): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("r"),
        bucket(concat_ws("|", lit(r.toString), col(tokCol)), width).as("c")))
    toks.select(explode(array(cells: _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point frequency estimates for `probes` (a SMALL relation — the
    * candidate tokens, broadcast against the ≤ d·w-row sketch): the
    * classic min-over-rows upper bound, never an underestimate
    * (spec-verified). Probing a token no row ever counted reads 0 via
    * the left join. Returns (tok, est). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, tokCol: String,
      depth: Int, width: Long): DataFrame = {
    val keyed = probes.select(col(tokCol)).distinct()
      .select(col(tokCol), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col(tokCol), col("r"),
        bucket(concat_ws("|", col("r").cast("string"), col(tokCol)), width)
          .as("c"))
    keyed.join(sketch, Seq("r", "c"), "left")
      .groupBy(tokCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Bloom-filter bit set over `keyCol`: `hashes` positions per key,
    * h_j(k) = md5 of "j|k" mod `mBits`, returned as the DISTINCT set
    * of set bit positions — at most mBits rows REGARDLESS of key count
    * (the fixed-size-state property, as [[countMin]]), and two shards'
    * filters merge by union-distinct, which IS the bitwise OR.
    * Partial-agg distinct collapses each partition before the shuffle,
    * so the shuffle is O(partitions·mBits), not O(keys). */
  def bloomBits(keys: DataFrame, keyCol: String,
      hashes: Int, mBits: Long): DataFrame = {
    require(hashes >= 1 && mBits >= 1, "hashes and mBits must be >= 1")
    val pos = (0 until hashes).map(j =>
      bucket(concat_ws("|", lit(j.toString), col(keyCol)), mBits))
    keys.select(explode(array(pos: _*)).as("bit")).distinct()
  }

  /** Membership probes against a Bloom bit set: a probe key is a
    * (possible) member iff ALL `hashes` of its bits are set — the
    * classic no-false-negative / tunable-false-positive contract.
    * The filter is ≤ mBits rows → broadcast to the probe side; each
    * probe costs `hashes` lookups folded into one join + count.
    * Returns (keyCol, member: int 0/1). */
  def bloomProbe(bits: DataFrame, probes: DataFrame, keyCol: String,
      hashes: Int, mBits: Long): DataFrame = {
    require(hashes >= 1 && mBits >= 1, "hashes and mBits must be >= 1")
    probes.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(array((0 until hashes).map(j =>
          bucket(concat_ws("|", lit(j.toString), col(keyCol)), mBits)): _*))
          .as("bit"))
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("bit"), "left")
      .groupBy(keyCol)
      .agg(when(sum(coalesce(col("hit"), lit(0))) === hashes, lit(1))
        .otherwise(lit(0)).cast("int").as("member"))
  }

  /** HyperLogLog registers over `tokCol`, m buckets (m must be a power
    * of two ≤ 2¹⁶): h = first 15 md5 hex chars (60 bits, always
    * positive), bucket = h mod m, and the register is the max over the
    * bucket's values of ρ(w) = leading zeros of w = h div m in its
    * (60 − log₂m)-bit width, plus one — computed EXACTLY via the
    * binary-string length (`bin`, identical unpadded semantics in
    * Spark and DuckDB), no log2 float. Returns ALL m rows (bucket,
    * register), 0 for never-hit buckets — fixed-size state, max-merge
    * across shards (spec-verified). */
  def hllRegisters(toks: DataFrame, tokCol: String, m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 65536,
      s"m must be a power of two in [2, 65536], got $m")
    val wBits = 60 - Integer.numberOfTrailingZeros(m)
    val h = conv(substring(md5(col(tokCol)), 1, 15), 16, 10).cast("long")
    val regs = toks
      .select(h.as("h"))
      .select(pmod(col("h"), lit(m.toLong)).as("bucket"),
        expr(s"h div ${m}L").as("w"))
      .select(col("bucket"),
        when(col("w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))).as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("register"))
    toks.sparkSession.range(m).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("register"), lit(0)).cast("int").as("register"))
  }

  /** Per-group HLL registers — [[hllRegisters]] keyed by `groupCol`:
    * the state is ≤ m SPARSE register rows per group (absent buckets
    * are implicit zeros, accounted at estimate time), so per-group
    * cardinality tracking costs O(|groups|·m) shuffle rows at ANY
    * corpus size, with the same max-merge law per (group, bucket)
    * across shards. */
  def hllRegistersBy(toks: DataFrame, tokCol: String, groupCol: String,
      m: Int): DataFrame = {
    require(m >= 2 && (m & (m - 1)) == 0 && m <= 65536,
      s"m must be a power of two in [2, 65536], got $m")
    val wBits = 60 - Integer.numberOfTrailingZeros(m)
    val h = conv(substring(md5(col(tokCol)), 1, 15), 16, 10).cast("long")
    toks
      .select(col(groupCol), h.as("h"))
      .select(col(groupCol), pmod(col("h"), lit(m.toLong)).as("bucket"),
        expr(s"h div ${m}L").as("w"))
      .select(col(groupCol), col("bucket"),
        when(col("w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))).as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).cast("int").as("register"))
  }

  /** Per-group raw estimates from a SPARSE register table
    * ([[hllRegistersBy]]): the harmonic sum adds 2^(wBits+1−register)
    * for present buckets plus (m − |present|)·2^(wBits+1) for the
    * implicit zero registers — identical to [[hllEstimate]] over the
    * dense grid, without materializing |groups|·m rows. Returns
    * (groupCol, estimate). */
  def hllEstimateBy(registers: DataFrame, groupCol: String, m: Int): DataFrame = {
    val wBits = 60 - Integer.numberOfTrailingZeros(m)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    registers
      .groupBy(col(groupCol))
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(${wBits + 1} - register AS INT))")) +
        (lit(m.toLong) - count(lit(1))) *
          expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1})")).as("s"))
      .select(col(groupCol),
        (lit(alpha) * lit(m.toDouble * m.toDouble) *
          lit(math.pow(2.0, (wBits + 1).toDouble)) / col("s").cast("double"))
          .as("estimate"))
  }

  /** Log₂-bucket histogram of a LONG column: bucket(v) = −1 for v < 0,
    * 0 for v = 0, else the bit length of v (= ⌊log₂v⌋ + 1), computed
    * EXACTLY via the binary-string length — the [[hllRegisters]] `bin`
    * trick, no float log2. At most 66 (bucket, cnt) rows REGARDLESS of
    * input size: per-partition partial aggregation collapses each
    * partition before the shuffle, and two shards' histograms merge by
    * summing counts per bucket (spec-verified) — the mergeable
    * quantile summary a 100 TB pipeline keeps where an exact
    * distributed sort per percentile probe is unaffordable. */
  def logHistogram(vals: DataFrame, valCol: String): DataFrame =
    vals.select(col(valCol).cast("long").as("v"))
      .select(when(col("v") < 0L, lit(-1))
        .when(col("v") === 0L, lit(0))
        .otherwise(length(bin(col("v")))).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Quantile estimates from a [[logHistogram]]: for each requested
    * basis-point q, the first bucket whose cumulative count reaches
    * rnk = ⌈n·q / 10000⌉ (the lower-quantile convention), reported
    * with the bucket's value bounds lo = 2^(b−1), hi = 2^b − 1 (0/0
    * for b ≤ 0) — bucket-resolution answers, approximate w.r.t. the
    * TRUTH but exact w.r.t. the ALGORITHM, which is what the oracle
    * gate checks. The cumulative window and the quantile probe run
    * over the ≤ 66 aggregated buckets crossed with the ONE-row total —
    * never the data (the [[graft.etl.Drift]] dim-sized-series
    * boundary). Returns (q_bp, bucket, lo, hi, rnk, n). */
  def histQuantiles(hist: DataFrame, qBps: Seq[Int]): DataFrame = {
    require(qBps.nonEmpty && qBps.forall(q => q >= 1 && q <= 10000),
      s"quantiles must be basis points in [1, 10000], got $qBps")
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(hist.agg(sum(col("cnt")).as("n")))
    cum
      .select(col("bucket"), col("cum"), col("n"),
        explode(array(qBps.map(lit(_)): _*)).as("q_bp"))
      .withColumn("rnk", expr("(n * q_bp + 9999) div 10000"))
      .filter(col("cum") >= col("rnk"))
      .groupBy("q_bp")
      .agg(min(col("bucket")).as("bucket"), min(col("rnk")).as("rnk"),
        min(col("n")).as("n"))
      .select(col("q_bp"), col("bucket"),
        when(col("bucket") <= 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")).as("lo"),
        when(col("bucket") <= 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1")).as("hi"),
        col("rnk"), col("n"))
  }

  /** Per-group [[logHistogram]]: the same bit-length buckets keyed by
    * `groupCol` — SPARSE (≤ 66 rows per group, only hit buckets), so
    * per-group distribution tracking costs O(|groups|·66) shuffle rows
    * at ANY corpus size, merging across shards by per-(group, bucket)
    * count sum exactly like the global form (spec-verified). */
  def logHistogramBy(vals: DataFrame, valCol: String,
      groupCol: String): DataFrame =
    vals.select(col(groupCol), col(valCol).cast("long").as("v"))
      .select(col(groupCol), when(col("v") < 0L, lit(-1))
        .when(col("v") === 0L, lit(0))
        .otherwise(length(bin(col("v")))).cast("int").as("bucket"))
      .groupBy(groupCol, "bucket").agg(count(lit(1)).as("cnt"))

  /** Per-group quantiles from a [[logHistogramBy]] table: the
    * [[histQuantiles]] sweep with every window/aggregate keyed by
    * `groupCol` — the per-group totals join is a dim-sized equi-join
    * (|groups| rows a side), not a cross join, and the cumulative
    * window partitions by group. Returns (groupCol, q_bp, bucket, lo,
    * hi, rnk, n). */
  def histQuantilesBy(hist: DataFrame, groupCol: String,
      qBps: Seq[Int]): DataFrame = {
    require(qBps.nonEmpty && qBps.forall(q => q >= 1 && q <= 10000),
      s"quantiles must be basis points in [1, 10000], got $qBps")
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(groupCol).orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(hist.groupBy(groupCol).agg(sum(col("cnt")).as("n")),
        Seq(groupCol))
    cum
      .select(col(groupCol), col("bucket"), col("cum"), col("n"),
        explode(array(qBps.map(lit(_)): _*)).as("q_bp"))
      .withColumn("rnk", expr("(n * q_bp + 9999) div 10000"))
      .filter(col("cum") >= col("rnk"))
      .groupBy(col(groupCol), col("q_bp"))
      .agg(min(col("bucket")).as("bucket"), min(col("rnk")).as("rnk"),
        min(col("n")).as("n"))
      .select(col(groupCol), col("q_bp"), col("bucket"),
        when(col("bucket") <= 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")).as("lo"),
        when(col("bucket") <= 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1")).as("hi"),
        col("rnk"), col("n"))
  }

  /** The raw HLL estimate α_m·m²/Σ 2^(−register) from a register table,
    * as one fixed expression tree: the harmonic sum is computed as the
    * INTEGER Σ 2^(wBits+1−register) (≤ m·2^(wBits+1), safely BIGINT),
    * and the single float step is literal·literal/CAST(sum) — the same
    * IEEE ops in any engine. α is the standard 0.7213/(1 + 1.079/m)
    * for m ≥ 128, or the small-m constants (0.673 / 0.697 / 0.709). */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame = {
    val wBits = 60 - Integer.numberOfTrailingZeros(m)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    registers
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), " +
        s"CAST(${wBits + 1} - register AS INT))")).as("s"))
      .select((lit(alpha) * lit(m.toDouble * m.toDouble) *
        lit(math.pow(2.0, (wBits + 1).toDouble)) / col("s").cast("double"))
        .as("estimate"))
  }

  /** KMV (bottom-k / k-minimum-values) distinct-value sketch over
    * `tokCol` (Bar-Yossef et al. 2002; Beyer et al. 2007): the k
    * smallest DISTINCT 60-bit md5 hash values seen. Fixed-size state
    * like [[hllRegisters]] — exactly ≤ k (h) rows at ANY corpus size —
    * but unlike HLL the sketch supports set operations (two shards'
    * sketches merge by union-distinct → re-take bottom k, which the
    * spec verifies equals the sketch of the union), and degrades to
    * the EXACT distinct set whenever true cardinality < k.
    *
    * Shuffle discipline: a naive `distinct().orderBy().limit(k)` plan
    * shuffles every distinct hash; here a bounded-memory per-partition
    * pass (the [[mgCandidates]] shape — an O(k) TreeSet per partition)
    * collapses each partition to ≤ k candidate hashes first, so the
    * shuffle is O(partitions·k) BY CONSTRUCTION. The global bottom-k
    * distinct set is provably contained in the union of per-partition
    * bottom-k sets (a hash among the k smallest globally is among the
    * k smallest of its own partition), so the final distinct-sort-limit
    * over candidates is bit-identical to the naive plan — the MG
    * cost-not-results discipline, and what lets the DuckDB oracle
    * replay the NAIVE plan and still hash-match. */
  def kmvSketch(toks: DataFrame, tokCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = toks.sparkSession
    import spark.implicits._
    val hashed = toks
      .select(conv(substring(md5(col(tokCol).cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .filter(col("h").isNotNull)
    val cand = hashed.as[Long].mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { v =>
        val boxed = java.lang.Long.valueOf(v)
        if (set.size < k) set.add(boxed)
        else if (v < set.last() && set.add(boxed)) set.pollLast()
      }
      import scala.jdk.CollectionConverters._
      set.iterator().asScala.map(Long.unbox)
    }.toDF("h")
    cand.distinct().orderBy("h").limit(k)
  }

  /** Cardinality estimate from a [[kmvSketch]]: the classic unbiased
    * (k−1)·H / h₍ₖ₎ with H = 2⁶⁰ (the hash domain), degrading to the
    * EXACT kept-row count when fewer than k distinct hashes exist (the
    * sketch then IS the distinct set). The only float arithmetic is
    * (k−1)·H / h₍ₖ₎ on literal doubles — three IEEE ops any engine
    * evaluates identically, the [[hllEstimate]] exactness discipline.
    * Returns ONE row (n_kept, kth, estimate). */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
      .select(col("n_kept"), col("kth"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("kth").cast("double"))
          .as("estimate"))

  /** Per-group [[kmvSketch]]: bottom-k distinct hashes PER `groupCol`
    * value, from ONE bounded-memory pass — the per-partition state is a
    * HashMap(group → O(k) TreeSet), so memory is O(|groups|·k) per
    * partition and the shuffle O(partitions·|groups|·k) regardless of
    * corpus size; the same containment argument as the global form
    * makes the result bit-identical to the naive per-group
    * distinct-rank plan the oracle replays. Intended for dim-sized
    * group domains (languages, sources, dates) — an open-domain group
    * key would need the group itself sketched first. Input must be two
    * columns (g: string, tok: string); returns (g, h) with ≤ k rows
    * per group. */
  def kmvSketchBy(toks: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = toks.sparkSession
    import spark.implicits._
    val hashed = toks
      .select(col("g").cast("string").as("g"),
        conv(substring(md5(col("tok").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .filter(col("g").isNotNull && col("h").isNotNull)
    val cand = hashed.as[(String, Long)].mapPartitions { it =>
      val m = new scala.collection.mutable.HashMap[String, java.util.TreeSet[java.lang.Long]]
      it.foreach { case (g, v) =>
        val set = m.getOrElseUpdate(g, new java.util.TreeSet[java.lang.Long]())
        val boxed = java.lang.Long.valueOf(v)
        if (set.size < k) set.add(boxed)
        else if (v < set.last() && set.add(boxed)) set.pollLast()
      }
      import scala.jdk.CollectionConverters._
      m.iterator.flatMap { case (g, set) =>
        set.iterator().asScala.map(h => (g, Long.unbox(h)))
      }
    }.toDF("g", "h")
    import org.apache.spark.sql.expressions.Window
    cand.distinct()
      .withColumn("r", row_number().over(
        Window.partitionBy("g").orderBy("h")))
      .filter(col("r") <= k)
      .select("g", "h")
  }

  /** Per-group estimates from a [[kmvSketchBy]] table — [[kmvEstimate]]
    * keyed by g. Returns (g, n_kept, kth, estimate). */
  def kmvEstimateBy(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy("g")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
      .select(col("g"), col("n_kept"), col("kth"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("kth").cast("double"))
          .as("estimate"))

  /** Misra-Gries candidate pass: ≤ k surviving keys PER PARTITION from
    * O(k) memory, with the classic guarantee that every key whose GLOBAL
    * frequency exceeds n/(k+1) survives in at least one partition (if it
    * exceeds the global fraction, it exceeds the per-partition fraction
    * somewhere, and MG(k) never evicts a key above n_p/(k+1)). The
    * decrement-all step is amortized O(1) per input row. This is the
    * bounded-memory half of [[heavyHitters]]; exposed for the spec's
    * superset-law check. Input must be a single non-null string column
    * named `tok`. */
  def mgCandidates(toks: DataFrame, k: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.select(col("tok")).as[String].mapPartitions { it =>
      val counts = new scala.collection.mutable.HashMap[String, Long]
      it.foreach { s =>
        if (counts.contains(s)) counts(s) += 1L
        else if (counts.size < k) counts(s) = 1L
        else {
          // In-place bulk ops (not foreach-with-mutation, which is
          // undefined on mutable.HashMap): decrement every key, then
          // drop the ones that hit zero. Still amortized O(1)/row.
          counts.mapValuesInPlace((_, c) => c - 1L)
          counts.filterInPlace((_, c) => c > 0L)
        }
      }
      counts.keysIterator
    }.toDF("tok")
  }

  /** EXACT heavy hitters over an unbounded key domain with bounded
    * shuffle: keys whose count strictly exceeds total/freqDiv.
    *
    * The naive plan shuffles every distinct key's count; at open-domain
    * scale (tokens, URLs, ids) that shuffle is the bottleneck. Here the
    * [[mgCandidates]] pass collapses each partition to ≤ k candidate
    * keys in O(k) memory — `freqDiv ≤ k+1` makes the MG guarantee cover
    * the query threshold, so the candidate set provably contains every
    * true heavy hitter — and only candidates are re-counted: the
    * recount semi-join's build side is ≤ k·partitions rows BY
    * CONSTRUCTION (broadcast-safe at any corpus size), and the final
    * gate compares against the ONE-row total aggregate. Output is
    * bit-identical to the naive exact plan (the spec's equality law);
    * the MG pass changes cost, never results. */
  def heavyHitters(toks: DataFrame, tokCol: String, k: Int,
      freqDiv: Long): DataFrame = {
    require(freqDiv <= k + 1L,
      s"freqDiv=$freqDiv needs k >= ${freqDiv - 1} for the MG guarantee")
    val t = toks.select(col(tokCol).cast("string").as("tok"))
      .filter(col("tok").isNotNull)
    val cand = mgCandidates(t, k).distinct()
    val total = t.agg(count(lit(1)).as("total"))
    t.join(broadcast(cand), Seq("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * freqDiv > col("total"))
      .select("tok", "cnt")
  }

  /** Per-group [[mgCandidates]]: ≤ k surviving keys per (partition,
    * group) from O(|groups|·k) memory per partition — the
    * [[kmvSketchBy]] dim-sized-group contract applied to Misra-Gries.
    * The per-group guarantee is the global one verbatim: a key whose
    * within-group frequency exceeds n_g/(k+1) survives in at least one
    * partition's group map. Input: two non-null string columns
    * (g, tok). */
  def mgCandidatesBy(toks: DataFrame, k: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.select(col("g"), col("tok")).as[(String, String)]
      .mapPartitions { it =>
        val m = new scala.collection.mutable.HashMap[
          String, scala.collection.mutable.HashMap[String, Long]]
        it.foreach { case (g, s) =>
          val counts = m.getOrElseUpdate(g,
            new scala.collection.mutable.HashMap[String, Long])
          if (counts.contains(s)) counts(s) += 1L
          else if (counts.size < k) counts(s) = 1L
          else {
            counts.mapValuesInPlace((_, c) => c - 1L)
            counts.filterInPlace((_, c) => c > 0L)
          }
        }
        m.iterator.flatMap { case (g, counts) =>
          counts.keysIterator.map(t => (g, t))
        }
      }.toDF("g", "tok")
  }

  /** EXACT per-group heavy hitters with bounded shuffle: per group g,
    * the keys whose within-group count strictly exceeds total_g /
    * freqDiv. [[heavyHitters]] groupwise: the [[mgCandidatesBy]] pass
    * bounds the candidate build side at |groups|·k·partitions rows BY
    * CONSTRUCTION, group totals are a dim-sized aggregate, and the
    * recount touches candidate keys only — output bit-identical to the
    * naive per-group plan (SketchSpec's grouped equality law). Input:
    * (g, tok) string columns; intended for dim-sized group domains. */
  def heavyHittersBy(toks: DataFrame, k: Int, freqDiv: Long): DataFrame = {
    require(freqDiv <= k + 1L,
      s"freqDiv=$freqDiv needs k >= ${freqDiv - 1} for the MG guarantee")
    val t = toks.select(col("g").cast("string").as("g"),
        col("tok").cast("string").as("tok"))
      .filter(col("g").isNotNull && col("tok").isNotNull)
    val cand = mgCandidatesBy(t, k).distinct()
    val totals = t.groupBy("g").agg(count(lit(1)).as("total"))
    t.join(broadcast(cand), Seq("g", "tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq("g"))
      .filter(col("cnt") * freqDiv > col("total"))
      .select("g", "tok", "cnt")
  }

  /** KMV set-algebra Jaccard (Beyer et al. 2007): estimate
    * J(A, B) = |A∩B| / |A∪B| of two token SETS from their bottom-k
    * sketches alone — the cross-corpus overlap dial (two crawl
    * snapshots, two sources, train-vs-eval) at O(k) state per side
    * however large the corpora. The estimator: merge the two sketches
    * (union-distinct, re-take bottom k — exactly the [[kmvSketch]]
    * merge law the spec verifies), then count merged hashes present in
    * BOTH input sketches; J ≈ matches / |merged|. Every step is
    * integer/hash arithmetic on ≤ 2k rows, so the DuckDB oracle replays
    * it bit-exactly, and when both true cardinalities are < k the
    * sketches ARE the distinct sets and the estimate is EXACT.
    *
    * Returns ONE row (k_eff, n_inter, jacc_bp): k_eff = |merged sketch|
    * (= min(k, |A∪B|)), n_inter = merged hashes in both sketches,
    * jacc_bp = n_inter·10⁴ div k_eff. */
  def kmvJaccard(a: DataFrame, b: DataFrame, tokCol: String,
      k: Int): DataFrame = {
    val ska = kmvSketch(a, tokCol, k)
    val skb = kmvSketch(b, tokCol, k)
    val merged = ska.union(skb).distinct().orderBy("h").limit(k)
    val inter = merged
      .join(ska, Seq("h"), "left_semi")
      .join(skb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_inter"))
    merged.agg(count(lit(1)).as("k_eff"))
      .crossJoin(inter)
      .withColumn("jacc_bp", expr("(n_inter * 10000) div k_eff"))
  }

  /** All-pairs [[kmvJaccard]] matrix over the groups of a (g, tok)
    * relation — the cross-source contamination dial: which sources are
    * re-crawls / mirrors of each other BEFORE paying for pairwise dedup
    * between them. Each group's token set collapses to a bottom-k
    * sketch ([[kmvSketchBy]] — one bounded-memory pass); every pairwise
    * Jaccard then runs the KMV set algebra on ≤2k rows per pair, so the
    * |groups|²/2 matrix costs O(pairs·k) — independent of corpus size,
    * where exact pairwise overlap is |corpus|²-shaped. The pair grid is
    * a dim×dim inequality join (groups are a catalog, not data; the
    * [[kmvSketchBy]] contract already requires a dim-sized group
    * domain). Exact (per the [[kmvJaccard]] law) whenever both groups'
    * true distinct counts are < k.
    *
    * Returns (src_a, src_b, k_eff, n_inter, jacc_bp), src_a < src_b. */
  def kmvJaccardMatrix(toks: DataFrame, k: Int): DataFrame = {
    val sk = kmvSketchBy(toks, k)
    val srcs = sk.select("g").distinct()
    val pairs = srcs.as("a")
      .join(broadcast(srcs.as("b")), col("a.g") < col("b.g"))
      .select(col("a.g").as("src_a"), col("b.g").as("src_b"))
    val ea = pairs.join(sk.withColumnRenamed("g", "src_a"), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1L).as("ia"), lit(0L).as("ib"))
    val eb = pairs.join(sk.withColumnRenamed("g", "src_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0L).as("ia"), lit(1L).as("ib"))
    import org.apache.spark.sql.expressions.Window
    val merged = ea.unionByName(eb)
      .groupBy("src_a", "src_b", "h")
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .withColumn("r", row_number().over(
        Window.partitionBy("src_a", "src_b").orderBy("h")))
      .filter(col("r") <= k)
    merged.groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("k_eff"),
        sum(col("ia") * col("ib")).as("n_inter"))
      .withColumn("jacc_bp", expr("(n_inter * 10000) div k_eff"))
  }
}
