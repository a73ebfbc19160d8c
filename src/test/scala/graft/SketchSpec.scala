package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.Sketch

/** Laws of the mergeable sketches ([[graft.sketch.Sketch]]): CMS never
  * underestimates and merges by cell-sum; HLL registers merge by max and
  * the estimate lands within the published error envelope. All fixtures
  * are deterministic (md5 hashing, no RNG) — once green, always green.
  */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-sketch")

  override def afterAll(): Unit = spark.stop()

  /** Deterministic skewed multiset: token t_k appears k times, k = 1..40
    * (so exact counts are known by construction). */
  private def skewed = {
    import spark.implicits._
    (1 to 40).flatMap(k => Seq.fill(k)(s"t$k")).toDF("tok")
  }

  test("CMS point estimates never underestimate; exact when no collision") {
    import spark.implicits._
    val sketch = Sketch.countMin(skewed, "tok", depth = 4, width = 64L)
    val probes = ((1 to 40).map(k => s"t$k") :+ "absent").toDF("tok")
    val est = Sketch.cmsEstimate(sketch, probes, "tok", depth = 4, width = 64L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 40).foreach { k =>
      assert(est(s"t$k") >= k.toLong,
        s"CMS must upper-bound: t$k est ${est(s"t$k")} < exact $k")
    }
    assert(est("absent") >= 0L)
    // min-over-rows tightness: with d=4 rows of width 64 on 40 tokens,
    // at least some probes should read their exact count
    assert((1 to 40).count(k => est(s"t$k") == k.toLong) > 20,
      "implausibly loose sketch — hash rows are not independent")
  }

  test("CMS merges by cell-sum: sketch(A ++ B) == sum-merge of shard sketches") {
    val a = skewed.filter(md5(col("tok")).substr(1, 1) < "8")
    val b = skewed.filter(md5(col("tok")).substr(1, 1) >= "8")
    val whole = Sketch.countMin(skewed, "tok", depth = 4, width = 64L)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Sketch.countMin(a, "tok", depth = 4, width = 64L)
      .union(Sketch.countMin(b, "tok", depth = 4, width = 64L))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole, "cell-sum merge must equal the whole-corpus sketch")
  }

  test("HLL registers merge by max; estimate within the m=64 error envelope") {
    import spark.implicits._
    val keys = (1L to 5000L).map(k => s"k$k").toDF("tok")
    val regs = Sketch.hllRegisters(keys, "tok", m = 64)
    val regMap = regs.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(regMap.size == 64, "every bucket must be present, zero-filled")
    // max-merge across disjoint shards reproduces the whole-set registers
    val a = keys.filter(md5(col("tok")).substr(1, 1) < "8")
    val b = keys.filter(md5(col("tok")).substr(1, 1) >= "8")
    val ra = Sketch.hllRegisters(a, "tok", m = 64)
    val rb = Sketch.hllRegisters(b, "tok", m = 64)
    val merged = ra.union(rb).groupBy("bucket")
      .agg(max("register").as("register"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == regMap, "max-merge must equal the whole-set registers")
    // 1.04/sqrt(64) = 13% standard error; 3 sigma ~ 39%. Deterministic
    // fixture — this is a fixed value, the bound just documents the regime.
    val est = Sketch.hllEstimate(regs, m = 64).head().getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.39,
      s"estimate $est outside the m=64 error envelope for n=5000")
    // duplicates must not move a cardinality sketch
    val dup = Sketch.hllRegisters(keys.union(keys).union(keys), "tok", m = 64)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dup == regMap, "HLL must be insensitive to multiplicity")
  }

  test("hllRegisters rejects a non-power-of-two m loudly") {
    intercept[IllegalArgumentException] {
      Sketch.hllRegisters(skewed, "tok", m = 48)
    }
  }

  test("grouped HLL: sparse accounting equals the dense per-group estimate; groups merge by max") {
    import spark.implicits._
    val keys = ((1L to 3000L).map(k => ("g1", s"a$k")) ++
      (1L to 400L).map(k => ("g2", s"b$k"))).toDF("g", "tok")
    val grouped = Sketch.hllEstimateBy(
        Sketch.hllRegistersBy(keys, "tok", "g", m = 64), "g", m = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the sparse (m − present)·2^(wBits+1) accounting must reproduce the
    // dense zero-filled grid's estimate bit-for-bit, per group
    for (g <- Seq("g1", "g2")) {
      val dense = Sketch.hllEstimate(
        Sketch.hllRegisters(keys.filter(col("g") === g), "tok", m = 64),
        m = 64).head().getDouble(0)
      assert(grouped(g) == dense,
        s"group $g: sparse ${grouped(g)} != dense $dense")
    }
    // shard max-merge per (group, bucket) reproduces the whole registers
    val a = keys.filter(md5(col("tok")).substr(1, 1) < "8")
    val b = keys.filter(md5(col("tok")).substr(1, 1) >= "8")
    val merged = Sketch.hllRegistersBy(a, "tok", "g", m = 64)
      .union(Sketch.hllRegistersBy(b, "tok", "g", m = 64))
      .groupBy("g", "bucket").agg(max("register").cast("int").as("register"))
    val whole = Sketch.hllRegistersBy(keys, "tok", "g", m = 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "per-group max-merge must equal the whole-set registers")
  }

  test("bloom: no false negatives ever; false positives exist at a tight m; absent keys can miss") {
    import spark.implicits._
    val keys = (1L to 500L).map(i => s"key_$i").toDF("k")
    // tight filter (256 bits / 3 hashes for 500 keys) → FPs guaranteed
    val bits = Sketch.bloomBits(keys, "k", hashes = 3, mBits = 256L)
    assert(bits.count() <= 256L, "bit set must be bounded by mBits")
    // every inserted key MUST probe member=1 — the Bloom contract
    val selfProbe = Sketch.bloomProbe(bits, keys, "k", hashes = 3, mBits = 256L)
    assert(selfProbe.filter(col("member") === 0).count() == 0L,
      "a Bloom filter never false-negatives an inserted key")
    // fresh keys: with 256 nearly-saturated bits most probe as members
    // (FPs — fine), but the filter is not vacuous for a ROOMY m
    val fresh = (1L to 500L).map(i => s"other_$i").toDF("k")
    val roomy = Sketch.bloomBits(keys, "k", hashes = 3, mBits = 65536L)
    val freshProbe = Sketch.bloomProbe(roomy, fresh, "k",
      hashes = 3, mBits = 65536L)
    assert(freshProbe.filter(col("member") === 1).count() < 50L,
      "a roomy filter must reject almost all absent keys")
  }

  test("bloom merges by union-distinct: bits(A ++ B) == union of shard bit sets") {
    import spark.implicits._
    val a = (1L to 100L).map(i => s"a_$i").toDF("k")
    val b = (1L to 100L).map(i => s"b_$i").toDF("k")
    val whole = Sketch.bloomBits(a.union(b), "k", hashes = 3, mBits = 4096L)
      .collect().map(_.getLong(0)).toSet
    val merged = Sketch.bloomBits(a, "k", hashes = 3, mBits = 4096L)
      .union(Sketch.bloomBits(b, "k", hashes = 3, mBits = 4096L))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(whole == merged, "shard bit sets must OR into the whole filter")
  }

  test("logHistogram: bit-length buckets; shards merge by cell-sum; quantiles hit known ranks") {
    import spark.implicits._
    // bucket(v) = bit length: 0→0, 1→1, {2,3}→2, {4..7}→3, 1000→10, −5→−1
    val h = Sketch.logHistogram(
        Seq(0L, 1L, 2L, 3L, 4L, 7L, 1000L, -5L).toDF("v"), "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h == Map(-1 -> 1L, 0 -> 1L, 1 -> 1L, 2 -> 2L, 3 -> 2L, 10 -> 1L))
    // merge law: histogram(A ++ B) == per-bucket sum of shard histograms
    val a = Seq(1L, 5L, 9L).toDF("v")
    val b = Seq(2L, 5L, 100L).toDF("v")
    val whole = Sketch.logHistogram(a.union(b), "v")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val merged = Sketch.logHistogram(a, "v")
      .union(Sketch.logHistogram(b, "v"))
      .groupBy("bucket").agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(whole == merged, "shard histograms must merge by cell-sum")
    // quantiles on 1..100: p50 rank 50 → first bucket with cum ≥ 50 is
    // bucket 6 (cum(≤5) = 31, cum(≤6) = 63), bounds [32, 63] ∋ the true
    // median 50; p99 rank 99 → bucket 7 (cum 100), bounds [64, 127]
    val qs = Sketch.histQuantiles(
        Sketch.logHistogram((1L to 100L).toDF("v"), "v"), Seq(5000, 9900))
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(qs(5000) == ((6, 32L, 63L, 50L, 100L)))
    assert(qs(9900) == ((7, 64L, 127L, 99L, 100L)))
    // grouped form ≡ the global sweep run per group
    val grouped = Seq.concat((1L to 100L).map(("g1", _)),
      (1L to 10L).map(("g2", _))).toDF("g", "v")
    val byG = Sketch.histQuantilesBy(
        Sketch.logHistogramBy(grouped, "v", "g"), "g", Seq(5000, 9900))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(byG(("g1", 5000)) == ((6, 32L, 63L, 50L, 100L)))
    assert(byG(("g1", 9900)) == ((7, 64L, 127L, 99L, 100L)))
    val soloG2 = Sketch.histQuantiles(
        Sketch.logHistogram((1L to 10L).toDF("v"), "v"), Seq(5000, 9900))
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(byG(("g2", 5000)) == soloG2(5000) &&
      byG(("g2", 9900)) == soloG2(9900),
      "grouped sweep must equal the global sweep per group")
  }

  test("streaming CMS: the sketch is a plain update-mode aggregation, ≡ batch") {
    import spark.implicits._
    // the sketch pipeline (explode → groupBy cell → count) runs UNCHANGED
    // on a stream — incremental maintenance is the engine's agg state,
    // zero custom operator code. Two files → two micro-batches.
    val dir = java.nio.file.Files.createTempDirectory("cms_stream").toString
    val toks = skewed
    toks.filter(md5(col("tok")).substr(1, 1) < "8")
      .coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    toks.filter(md5(col("tok")).substr(1, 1) >= "8")
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = Sketch.countMin(
      spark.readStream.schema(toks.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir),
      "tok", depth = 4, width = 64L)
    val q = stream.writeStream.format("memory").queryName("cms_mem")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("cms_mem")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketch.countMin(toks, "tok", depth = 4, width = 64L)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, "streaming sketch must equal the batch sketch")
  }

  test("heavyHitters equals the naive exact plan; strict threshold boundary") {
    import spark.implicits._
    // hot 400/1000 qualifies at freqDiv=10 (>100); warm sits EXACTLY at
    // the boundary (100·10 = 1000, not >) and must be excluded; 500
    // singletons stress MG evictions. 7 partitions, k=16 ≥ freqDiv-1.
    val rows = Seq.fill(400)("hot") ++ Seq.fill(100)("warm") ++
      (1 to 500).map(i => s"one_$i")
    val toks = rows.toDF("tok").repartition(7)
    val out = Sketch.heavyHitters(toks, "tok", k = 16, freqDiv = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("hot", 400L)), s"got $out")
    // equality law vs the naive plan at a permissive threshold: the MG
    // pre-filter must change cost, never results
    val naive = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10L > lit(rows.size.toLong))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val mg = Sketch.heavyHitters(toks, "tok", k = 9, freqDiv = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(mg == naive, "minimal k for the guarantee still exact")
  }

  test("heavyHittersBy equals the naive per-group plan; groups isolated") {
    import spark.implicits._
    // group A: hot qualifies (300/600 at freqDiv=10); group B: the SAME
    // token is NOT heavy (5/500) — per-group thresholds must isolate.
    val rows = (Seq.fill(300)("A" -> "hot") ++
      (1 to 300).map(i => "A" -> s"a_$i") ++
      Seq.fill(5)("B" -> "hot") ++ (1 to 495).map(i => "B" -> s"b_$i"))
    val toks = rows.toDF("g", "tok").repartition(7)
    val out = Sketch.heavyHittersBy(toks, k = 16, freqDiv = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(out == Seq(("A", "hot", 300L)), s"got $out")
    // equality law vs the naive per-group plan at minimal k
    val totals = toks.groupBy("g").agg(count(lit(1)).as("total"))
    val naive = toks.groupBy("g", "tok").agg(count(lit(1)).as("cnt"))
      .join(totals, "g")
      .filter(col("cnt") * 10L > col("total"))
      .select("g", "tok", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    val mg = Sketch.heavyHittersBy(toks, k = 9, freqDiv = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted
    assert(mg == naive, "grouped MG pre-filter changes cost, never results")
  }

  test("mgCandidates is a superset of the true heavy hitters per the MG law") {
    import spark.implicits._
    val rows = Seq.fill(300)("a") ++ Seq.fill(150)("b") ++
      (1 to 550).map(i => s"x_$i")
    val toks = rows.toDF("tok").repartition(5)
    val k = 9
    val cand = Sketch.mgCandidates(toks, k)
      .collect().map(_.getString(0)).toSet
    val heavy = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > lit(rows.size.toLong))
      .collect().map(_.getString(0)).toSet
    assert(heavy.subsetOf(cand),
      s"MG(k=$k) candidates must contain every key above n/(k+1): " +
        s"missing ${heavy.diff(cand)}")
  }

  test("KMV equals the naive bottom-k distinct plan and merges by union") {
    import spark.implicits._
    val keys = (1L to 3000L).map(k => s"k$k") ++ (1L to 500L).map(k => s"k$k")
    val toks = keys.toDF("tok").repartition(7)
    val k = 64
    // bit-identity vs the naive plan the oracle replays
    val naive = toks
      .select(conv(substring(md5(col("tok")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    val kmv = Sketch.kmvSketch(toks, "tok", k)
      .collect().map(_.getLong(0)).toSeq
    assert(kmv == naive, "bounded-pass KMV must match the naive plan")
    // union-merge law: bottom-k of (sketch(A) ∪ sketch(B)) == sketch(A ∪ B)
    val a = toks.filter(md5(col("tok")).substr(1, 1) < "8")
    val b = toks.filter(md5(col("tok")).substr(1, 1) >= "8")
    val merged = Sketch.kmvSketch(a, "tok", k)
      .union(Sketch.kmvSketch(b, "tok", k))
      .distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(merged == kmv, "union-merge must equal the whole-corpus sketch")
  }

  test("KMV estimate lands near truth; degrades to exact below k") {
    import spark.implicits._
    val keys = (1L to 3000L).map(k => s"k$k").toDF("tok")
    val est = Sketch.kmvEstimate(Sketch.kmvSketch(keys, "tok", 128), 128)
      .collect().head.getDouble(2)
    // k=128 → relative std error ~ 1/sqrt(k-2) ≈ 9%; allow 4 sigma
    assert(math.abs(est - 3000.0) / 3000.0 < 0.36, s"estimate $est off truth 3000")
    val tiny = (1L to 40L).map(k => s"k$k").toDF("tok")
    val row = Sketch.kmvEstimate(Sketch.kmvSketch(tiny, "tok", 128), 128)
      .collect().head
    assert(row.getLong(0) == 40L && row.getDouble(2) == 40.0,
      "below-k input must degrade to the exact distinct count")
  }

  test("grouped KMV matches per-group naive bottom-k") {
    import spark.implicits._
    val rows = (1L to 2000L).map(i => (if (i % 2 == 0) "even" else "odd", s"k$i"))
    val toks = rows.toDF("g", "tok").repartition(5)
    val k = 32
    val got = Sketch.kmvSketchBy(toks, k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val naive = toks
      .select(col("g"), conv(substring(md5(col("tok")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .distinct()
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("h")))
      .filter(col("r") <= k).select("g", "h")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == naive, "bounded per-group pass must match the naive plan")
  }

  test("profiler matches per-column SQL facts in one pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("alpha"), 10L),
      (2L, None, 20L),
      (3L, Some("beta"), 10L),
      (4L, Some("alpha"), 30L)).toDF("id", "name", "v")
    val got = graft.etl.Profile.profile(df, Seq("id", "name", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("name") == ((4L, 1L, 2L, "alpha", "beta")))
    assert(got("v") == ((4L, 0L, 3L, "10", "30")))
  }
}
