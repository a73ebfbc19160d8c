package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique specs: the 100 TB design claims in README, demonstrated
  * on the real plans — bucketed co-located joins eliminate the shuffle,
  * partitioned writes prune at the scan, approximate distinct tracks exact
  * within tolerance.
  */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-scale-test")
  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String = Files.createTempDirectory("graft_scale_").toString

  test("z-ordered layout narrows per-file ranges on BOTH columns; single-sort does not") {
    import graft.io.Layout
    val zDir = tmp() + "/z"
    val sDir = tmp() + "/s"
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    Layout.writeZOrdered(li, zDir, "l_partkey", "l_suppkey", numFiles = 8)
    // baseline: classic single-column sort into the same file count
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir)
    def avgSpanFraction(dir: String, c: String): Double = {
      val whole = li.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      val domain = whole.getDouble(1) - whole.getDouble(0)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
        (r.getDouble(1) - r.getDouble(0)) / domain
      }
      spans.sum / spans.length
    }
    // data skipping prunes files whose min/max miss the predicate: the
    // z-layout must shrink BOTH columns' per-file ranges…
    assert(avgSpanFraction(zDir, "l_partkey") < 0.6,
      "z-order should narrow l_partkey file ranges")
    assert(avgSpanFraction(zDir, "l_suppkey") < 0.6,
      "z-order should narrow l_suppkey file ranges")
    // …while a partkey-only sort leaves suppkey unskippable (full span).
    assert(avgSpanFraction(sDir, "l_partkey") < 0.3,
      "single sort narrows its own column best")
    assert(avgSpanFraction(sDir, "l_suppkey") > 0.9,
      "single sort leaves the second column full-span per file")
  }

  test("manifest reader prunes files on a SECOND z-dimension predicate " +
      "via the z-stats sidecar") {
    import graft.io.{Sinks, Zorder}
    val dir = tmp() + "/zlake"
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val pkMax = li.agg(max("l_partkey")).head().getLong(0)
    val skMax = li.agg(max("l_suppkey")).head().getLong(0)
    Zorder.writeZTableDims(spark, li, dir,
      Seq(("l_partkey", 1L, pkMax), ("l_suppkey", 1L, skMax)), nFiles = 8)
    val nLive = Sinks.manifestAt(spark, dir).count()
    assert(nLive >= 4, s"expected a multi-file table, got $nLive")
    // the SECOND dimension — invisible to the manifest's kmin/kmax,
    // servable only from the sidecar — must still skip files
    val (lo, hi) = (1L, skMax / 8)
    val pruned = Sinks.readVersionedColRange(spark, dir, "l_suppkey", lo, hi)
    assert(pruned.inputFiles.length < nLive,
      s"suppkey predicate must prune: opened ${pruned.inputFiles.length}/$nLive")
    val expect = li.filter(col("l_suppkey").between(lo, hi)).count()
    assert(pruned.count() == expect, "pruned read must not lose rows")
    // and the manifest-key path now intersects manifest + sidecar bounds
    val keyRead = Sinks.readVersionedKeyRange(spark, dir, "l_partkey",
      1L, pkMax / 8)
    assert(keyRead.inputFiles.length < nLive,
      s"key-range read must prune: ${keyRead.inputFiles.length}/$nLive")
    assert(keyRead.count() ==
      li.filter(col("l_partkey").between(1L, pkMax / 8)).count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = tmp()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$wh/graft_bkt'")
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt.li_bucketed")
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt.ord_bucketed")
    val joined = spark.table("graft_bkt.li_bucketed")
      .join(spark.table("graft_bkt.ord_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE graft_bkt.li_bucketed")
    spark.sql("DROP TABLE graft_bkt.ord_bucketed")
    spark.sql("DROP DATABASE graft_bkt")
  }

  test("partitioned silver write prunes partitions at the scan") {
    val dir = tmp() + "/fact_partitioned"
    val fact = silver.Star.factLineitem(spark, sf)
      .withColumn("ship_month", date_format(col("ship_date"), "yyyy-MM"))
    io.Sinks.savePartitioned(fact, dir, Seq("ship_month"), mode = "overwrite")
    val pruned = spark.read.parquet(dir)
      .filter(col("ship_month") === "1996-03")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(ship_month"),
      s"expected partition filters in:\n$scan")
    val monthDirs = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("ship_month="))
    assert(monthDirs > 50, s"expected many month partitions, got $monthDirs")
    assert(pruned.count() > 0)
  }

  test("dynamic partition pruning fires on a partitioned fact ⋈ filtered dim") {
    import spark.implicits._
    val dir = tmp() + "/dpp_fact"
    silver.Star.factLineitem(spark, sf)
      .withColumn("ship_month", date_format(col("ship_date"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("ship_month").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim of months with an attribute; the filter is on the DIM, so static
    // pruning can't see it — only DPP can push the surviving month keys
    // into the fact scan at runtime
    val monthDim = fact.select("ship_month").distinct()
      .withColumn("is_peak", col("ship_month").endsWith("-12"))
    val joined = fact.join(monthDim.filter(col("is_peak")), Seq("ship_month"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the fact scan:\n${plan.take(2000)}")
    assert(joined.count() > 0)
  }

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // hot key: 90% of big-side rows share key 1
    val big = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id")).otherwise(lit(1L)).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k"), "inner")
    val salted = etl.Skew.saltedJoin(big, small, Seq("k"),
      salts = 8, saltSource = Seq("payload"))
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert(diff == 0, "salted join must be row-identical to the plain join")
    // the salt actually fans the hot key out across sub-keys
    val saltSpread = big.filter(col("k") === 1)
      .select(etl.Skew.saltFrom(8, col("payload")).as("s"))
      .distinct().count()
    assert(saltSpread == 8)
    // …and BOUNDS each sub-key: the planted hot key (9000 rows) must
    // split into (key, salt) groups no bigger than 2x the fair share,
    // so no single reducer sees the whole key — the partition-size law
    // the sf1 SkewStress record re-asserts at 6 M rows (README).
    val hotRows = big.filter(col("k") === 1).count()
    val maxSub = big.filter(col("k") === 1)
      .groupBy(etl.Skew.saltFrom(8, col("payload")).as("s"))
      .count().agg(max("count")).head().getLong(0)
    assert(maxSub <= 2L * hotRows / 8L,
      s"hot-key sub-group $maxSub exceeds 2x fair share ${2L * hotRows / 8L}")
  }

  test("ORC round-trips via the same sinks and keeps predicate pushdown") {
    val dir = tmp() + "/orc_rt"
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    graft.io.Sinks.savePartitioned(li, dir, Seq("l_returnflag"),
      mode = "overwrite", format = "orc")
    val back = graft.io.Sources.readOrc(spark, dir)
    assert(back.count() == li.count())
    // the scan-pruning machinery the engine relies on is format-agnostic:
    // the quantity predicate must reach the ORC scan as a pushed filter
    val plan = back.filter(col("l_quantity") > 45)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("l_quantity"),
      s"expected the predicate pushed into the ORC scan:\n$plan")
  }

  test("j11 full outer: both date-range predicates reach the parquet scans") {
    // a full-outer join cannot push filters THROUGH the join, so each
    // side's range predicate must already sit at its own scan — the
    // year filters are ~7x selective and at 100 TB decide whether the
    // join reads a year or the decade
    val plan = SparkEntry.queries("j11_full_outer")(spark, sf)
      .queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*GreaterThanOrEqual".r
      .findAllIn(plan).size
    assert(pushed >= 2,
      s"expected the order-date and ship-date ranges pushed to both scans, found $pushed:\n$plan")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // The row-level companion of dynamic partition pruning: when a shuffle
    // join's build side carries a selective filter, Spark injects a bloom
    // filter that discards probe rows BEFORE the exchange. The size
    // thresholds are tuned for clusters, so pin them down to testdata
    // scale; the technique is what matters at 100 TB (probe-side scan
    // shrinks by the build's selectivity before any shuffle bytes move).
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join regime the filter targets
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val plan = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf)
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("approx_count_distinct tracks exact within 5%") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("all-pairs cosine runs as a distributed CartesianProduct, not a broadcast") {
    // The scale contract of allPairsAboveThreshold: every task pairs one
    // partition from each side (SHUFFLE_REPLICATE_NL); no driver collect,
    // no BroadcastNestedLoopJoin (which would cap the corpus at one
    // broadcast), and the pair math is the codegen'd vec_dot kernel.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // cacheKey path returns the LAZY plan (the private-persist path
    // materializes through localCheckpoint, which hides the join behind
    // a Scan ExistingRDD)
    val plan = sim.Similarity.allPairsAboveThreshold(emb, 0.3, blocks = 4,
        cacheKey = Some("scale-spec-plan"))
      .queryExecution.executedPlan.toString
    graft.util.ManagedCaches.clearAll(spark)
    assert(plan.contains("CartesianProduct"), s"expected CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "all-pairs must not depend on a broadcastable corpus")
    assert(plan.contains("vec_dot"), "pair math must be the codegen'd kernel")
  }

  test("BPE-ish tokenizer splits on whitespace and letter/digit boundaries") {
    val df = spark.createDataFrame(Seq((1L, "abc123 def x9y"))).toDF("id", "text")
    val toks = df.select(text.Text.tokensBpeish(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    assert(toks == Seq("abc", "123", "def", "x", "9", "y"))
  }

  override def afterAll(): Unit = spark.stop()
}
