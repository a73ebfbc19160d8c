package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Relay

/** Structured Streaming specs: incremental relay with availableNow +
  * checkpoint resume (S7–S9) and foreachBatch keyed upsert (S10). */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-streaming-test")
  private def tmp(): String = Files.createTempDirectory("graft_stream_").toString

  test("S8/S9: availableNow relay is incremental across restarts") {
    import spark.implicits._
    val src = tmp() + "/src"
    val dst = tmp() + "/dst"
    val ckp = tmp() + "/ckp"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    val q1 = Relay.writeStreamPath(
      Relay.readStreamPath(spark, src, schema), dst, ckp, queryName = "relay1")
    q1.awaitTermination()
    assert(spark.read.parquet(dst).count() == 2)

    // new files arrive; a fresh availableNow run picks up ONLY the delta
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    val q2 = Relay.writeStreamPath(
      Relay.readStreamPath(spark, src, schema), dst, ckp, queryName = "relay2")
    q2.awaitTermination()
    val out = spark.read.parquet(dst)
    assert(out.count() == 3, "checkpoint must dedupe the already-relayed files")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("S10: foreachBatch upsert applies latest-wins per key") {
    import spark.implicits._
    val src = tmp() + "/usrc"
    val target = tmp() + "/utarget"
    val ckp = tmp() + "/uckp"
    Seq((1L, "old", 1L), (2L, "keep", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q1 = Relay.writeStreamUpsert(
      Relay.readStreamPath(spark, src, schema), target, ckp, Seq("k"))
    q1.awaitTermination()
    Seq((1L, "new", 2L), (3L, "ins", 1L)).toDF("k", "v", "seq")
      .write.mode("append").parquet(src)
    val q2 = Relay.writeStreamUpsert(
      Relay.readStreamPath(spark, src, schema), target, ckp, Seq("k"))
    q2.awaitTermination()
    val out = spark.read.parquet(target).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("S10/S11: partition-scoped streaming upsert leaves untouched partitions alone") {
    import spark.implicits._
    val src = tmp() + "/pusrc"
    val target = tmp() + "/putarget"
    val ckp = tmp() + "/puckp"
    Seq(("2024-01-01", 1L, "old"), ("2024-01-02", 2L, "keep"))
      .toDF("dt", "k", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q1 = Relay.writeStreamUpsertPartitioned(
      Relay.readStreamPath(spark, src, schema), target, ckp,
      Seq("dt", "k"), "dt", queryName = "pup1")
    q1.awaitTermination()
    val untouched = new java.io.File(s"$target/dt=2024-01-02")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    Seq(("2024-01-01", 1L, "new")).toDF("dt", "k", "v")
      .write.mode("append").parquet(src)
    val q2 = Relay.writeStreamUpsertPartitioned(
      Relay.readStreamPath(spark, src, schema), target, ckp,
      Seq("dt", "k"), "dt", queryName = "pup2")
    q2.awaitTermination()
    assert(new java.io.File(s"$target/dt=2024-01-02")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap == untouched,
      "micro-batch must not rewrite partitions it does not touch")
    val out = spark.read.parquet(target).orderBy("k")
      .collect().map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v")))).toSeq
    assert(out == Seq((1L, "new"), (2L, "keep")))
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    import spark.implicits._
    val src = tmp() + "/ddsrc"
    val dst = tmp() + "/dddst"
    val ckp = tmp() + "/ddckp"
    // two files → (typically) two micro-batches; key 1 duplicated across them
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), "b"))
      .toDF("k", "ts", "v").write.mode("append").parquet(src)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), "a2"),
        (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:03"), "c"))
      .toDF("k", "ts", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val deduped = Relay.streamingDedup(
      Relay.readStreamPath(spark, src, schema,
        options = Map("maxFilesPerTrigger" -> "1")),
      Seq("k"), "ts", "10 minutes")
    val q = Relay.writeStreamPath(deduped, dst, ckp, queryName = "dedup_stream")
    q.awaitTermination()
    val out = spark.read.parquet(dst).select("k").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L), s"expected one row per key, got $out")
  }

  test("streaming execution of the hourly agg equals its batch twin") {
    // The EventsQ batch queries pin semantics for the streaming relay;
    // here the SAME column logic runs through readStream + complete-mode
    // memory sink and must produce identical rows.
    import org.apache.spark.sql.functions._
    import graft.util.Exact._
    val sf = "/root/testdata/sf0.001"
    // file streams require a DIRECTORY source; stage the single file
    val srcDir = tmp() + "/events_stream_src"
    new java.io.File(srcDir).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = Tables.canonEventTs(Relay.readStreamPath(spark, srcDir, schema))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sumExact(col("value")).as("sum_value"))
    val q = stream.writeStream.format("memory").queryName("hourly_mem")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("hourly_mem")
      .orderBy("hour", "event_type").collect()
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sumExact(col("value")).as("sum_value"))
      .orderBy("hour", "event_type").collect()
    assert(streamed.sameElements(batch),
      s"streaming result (${streamed.length} rows) != batch (${batch.length})")
  }

  test("watermarked window appends only watermark-closed windows") {
    import spark.implicits._
    val src = tmp() + "/wsrc"; val ckp = tmp() + "/wckp"
    def write(rows: Seq[(java.sql.Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").write.mode("append").parquet(src)
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val dst = tmp() + "/wdst"
    write(Seq((ts(1), 1L), (ts(2), 2L), (ts(12), 1L)))
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = Relay.windowedCounts(
        Relay.readStreamPath(spark, src, schema), "ts", "10 minutes", "5 minutes")
        .writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
    }
    run()
    // watermark starts at 0 in the first run → nothing closed yet
    assert(spark.read.parquet(dst).count() == 0)
    // later events push the watermark past the 10:00–10:10 window
    write(Seq((ts(31), 3L)))
    run()
    val out = spark.read.parquet(dst)
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(out("2024-01-01 10:00:00.0") == 2L,
      s"first window must close with its 2 events, got $out")
  }

  test("flatMapGroupsWithState closes sessions after the event-time gap") {
    import spark.implicits._
    val src = tmp() + "/ssrc"; val ckp = tmp() + "/sckp"
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 09:$min%02d:00")
    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit =
      rows.toDF("user_id", "ts", "value").write.mode("append").parquet(src)
    write(Seq((1L, ts(0), 1.0), (1L, ts(5), 2.0), (2L, ts(1), 5.0)))
    val dst = tmp() + "/sdst"
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val stream = Relay.readStreamPath(spark, src, schema)
        .as[Relay.SessionEvent]
      val q = Relay.statefulSessions(stream, gapSeconds = 600, watermark = "1 minute")
        .writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(dst).count() == 0, "sessions still open")
    // an event far in the future advances the watermark → both sessions
    // time out (gap 10 min exceeded) and are emitted closed
    write(Seq((3L, ts(50), 9.0)))
    run()
    val out = spark.read.parquet(dst).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 2L, 3.0), (2L, 1L, 5.0)),
      s"user1: 2-event session value 3.0; user2: 1-event session 5.0; got ${out.toSeq}")
  }

  test("streaming SCD2 closed versions equal the batch scd2 non-current rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val srcDir = tmp() + "/scd2_src"
    new java.io.File(srcDir).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = Tables.canonEventTs(Relay.readStreamPath(spark, srcDir, schema))
      .select("user_id", "ts", "event_id", "event_type")
      .as[Relay.Scd2Event]
    val q = Relay.scd2Stream(stream)
      .writeStream.format("memory").queryName("scd2_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("scd2_mem")
      .orderBy("user_id", "effective_from").collect()
    val batch = SparkEntry.queries("scd2")(spark, sf)
      .filter(!col("is_current"))
      .select("user_id", "event_type", "effective_from", "effective_to")
      .orderBy("user_id", "effective_from").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"streaming closed versions (${streamed.length}) != batch (${batch.length})")
  }

  test("streaming forward fill equals the batch w8_ffill query") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val srcDir = tmp() + "/ffill_src"
    new java.io.File(srcDir).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = Tables.canonEventTs(Relay.readStreamPath(spark, srcDir, schema))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit(null)).otherwise(col("value"))
          .as("reading"))
      .as[Relay.FfillEvent]
    val q = Relay.ffillStream(stream)
      .writeStream.format("memory").queryName("ffill_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val cols = Seq("user_id", "event_id", "ts", "reading", "reading_filled")
    val streamed = spark.table("ffill_mem")
      .select(cols.map(col): _*).orderBy("user_id", "event_id").collect()
    val batch = SparkEntry.queries("w8_ffill")(spark, sf)
      .select(cols.map(col): _*).orderBy("user_id", "event_id").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"streaming fill (${streamed.length}) != batch (${batch.length})")
  }

  test("streaming manifest upsert merges per micro-batch and leaves a version history") {
    import spark.implicits._
    import graft.io.Sinks
    val src = tmp() + "/mupsert_src"
    val dst = tmp() + "/mupsert_dst"
    val ckp = tmp() + "/mupsert_ckp"
    new java.io.File(src).mkdirs()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("append").parquet(src)
    // age the first append so the file source orders the batches
    // deterministically (it sorts by modification time)
    new java.io.File(src).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    Seq((2L, "B2"), (3L, "c")).toDF("k", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = Relay.writeStreamUpsertManifest(
      Relay.readStreamPath(spark, src, schema,
        options = Map("maxFilesPerTrigger" -> "1")),
      dst, ckp, "k")
    q.awaitTermination()
    val out = Sinks.readVersioned(spark, dst).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "B2"), (3L, "c")), s"merged stream: $out")
    // one committed manifest version per micro-batch = a queryable history
    assert(Sinks.currentVersion(dst) >= 2L,
      s"expected a version per micro-batch, got ${Sinks.currentVersion(dst)}")
  }

  test("streaming near-dup detection equals the batch simhashPairs join") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // two parquet files + maxFilesPerTrigger=1 → two micro-batches, so
    // cross-batch pairs must come from the carried band-bucket STATE
    val srcDir = tmp() + "/neardup_src"
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = docs.schema
    val stream = Relay.nearDupStream(
      Relay.readStreamPath(spark, srcDir, schema,
        options = Map("maxFilesPerTrigger" -> "1")))
    val q = stream.writeStream.format("memory").queryName("neardup_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // multi-band collisions emit once per band — dedup like the batch
    // candidate distinct()
    val streamed = spark.table("neardup_mem")
      .select("id_a", "id_b", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(batch.nonEmpty, "fixture must contain near-dup pairs")
    assert(streamed == batch,
      s"streaming/batch divergence: extra=${streamed -- batch} missing=${batch -- streamed}")
  }

  test("streaming span-dedup marks equal the batch duplicateNgramPositions set") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // two parquet files + maxFilesPerTrigger=1 → two micro-batches: a
    // shingle whose two occurrences straddle the split only marks if the
    // held first occurrence is carried in STATE across batches
    val srcDir = tmp() + "/spandup_src"
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    docs.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = docs.schema
    val stream = Relay.spanDupStream(
      Relay.readStreamPath(spark, srcDir, schema,
        options = Map("maxFilesPerTrigger" -> "1")), n = 5)
    val q = stream.writeStream.format("memory").queryName("spandup_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("spandup_mem")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.dedup.Dedup
      .duplicateNgramPositions(docs, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    assert(batch.nonEmpty, "fixture must contain duplicated spans")
    // cross-batch carry must matter: some duplicated shingle has its two
    // occurrences in different micro-batches (even/odd doc split)
    assert(streamed == batch,
      s"streaming/batch divergence: extra=${streamed -- batch} missing=${batch -- streamed}")
  }

  test("streaming greedy packing equals the batch packGreedy fold") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // split at the id median so batch 1 carries the LOW ids of every
    // shard — the per-shard id-order contract — and a shard's open bin
    // must keep filling across the batch boundary from carried state
    val mid = 250L
    val srcDir = tmp() + "/pack_src"
    docs.filter(col("doc_id") < mid)
      .coalesce(1).write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    docs.filter(col("doc_id") >= mid)
      .coalesce(1).write.mode("append").parquet(srcDir)
    val stream = Relay.packStream(
      Relay.readStreamPath(spark, srcDir, docs.schema,
        options = Map("maxFilesPerTrigger" -> "1")),
      budget = 512L, shards = 8)
    val q = stream.writeStream.format("memory").queryName("pack_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("pack_mem")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val batch = graft.text.Corpus.packGreedy(docs, budget = 512L, shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(streamed == batch,
      s"streaming/batch packing divergence (first deltas: ${
        streamed.zip(batch).filter(p => p._1 != p._2).take(3)})")
  }

  test("streaming pivot equals the batch pv_daily query") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val srcDir = tmp() + "/pivot_src"
    new java.io.File(srcDir).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val types = Seq("click", "error", "purchase", "signup", "view")
    val stream = Relay.pivotStream(
      Tables.canonEventTs(Relay.readStreamPath(spark, srcDir, schema)),
      date_trunc("day", col("ts")), col("event_type"), types)
    val q = stream.writeStream.format("memory").queryName("pivot_mem")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("pivot_mem").orderBy("day").collect()
    val batch = SparkEntry.queries("pv_daily")(spark, sf)
      .orderBy("day").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"streaming pivot (${streamed.length} rows) != batch (${batch.length})")
  }

  test("stream-stream interval join equals the batch range join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val srcDir = tmp() + "/ssj_src"
    new java.io.File(srcDir).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    def stream(eventType: String, idAs: String) =
      Tables.canonEventTs(Relay.readStreamPath(spark, srcDir, schema))
        .filter(col("event_type") === eventType)
        .select(col("user_id"), col("ts"), col("event_id").as(idAs))
    val joined = Relay.intervalJoinStream(
      stream("signup", "signup_id"), stream("click", "click_id"),
      Seq("user_id"), "ts", payload = Seq("click_id"), windowSec = 3600)
    val q = joined.writeStream.format("memory").queryName("ssj_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // aggregate the streamed join rows driver-side and compare with the
    // batch bucketed range join query (itself oracle-exact)
    val streamed = spark.table("ssj_mem")
      .groupBy("signup_id").agg(count(col("click_id")).as("n_clicks"))
      .orderBy("signup_id").collect()
    val batch = SparkEntry.queries("rj_following_clicks")(spark, sf)
      .collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream-stream join (${streamed.length} groups) != batch (${batch.length})")
  }

  test("streaming weighted mixing equals the batch c_mix manifest") {
    import org.apache.spark.sql.functions._
    // mixSources is stateless (pure hash of the key), so the SAME code
    // runs on a stream unchanged — the twin asserts the streamed mix
    // manifest is the batch one row-for-row.
    val sf = "/root/testdata/sf0.001"
    val srcDir = tmp() + "/mix_src"
    new java.io.File(srcDir).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
      java.nio.file.Paths.get(s"$srcDir/documents.parquet"))
    val schema = spark.read.parquet(s"$sf/documents.parquet").schema
    val idx = substring(col("source"), 4, 10).cast("int")
    val wpct = when(idx < 3, 250L).when(idx < 10, 100L).otherwise(40L)
    val stream = graft.text.Corpus.mixSources(
      Relay.readStreamPath(spark, srcDir, schema)
        .select(col("doc_id"), col("source")), wpct, "doc_id")
    val q = stream.writeStream.format("memory").queryName("mix_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("mix_mem")
      .orderBy("doc_id", "copy").collect()
    val batch = graft.text.Corpus.mixSources(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("source")), wpct, "doc_id")
      .orderBy("doc_id", "copy").collect()
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"streaming mix (${streamed.length} rows) != batch (${batch.length})")
  }

  test("streaming BPE encode equals the batch t_bpe_apply accounting") {
    import org.apache.spark.sql.functions._
    // Bpe.encodeCounts is stateless row-at-a-time (words stay in array
    // HOFs; each merge round is a broadcast 1-row stream-static cross
    // join), so the SAME code runs on a stream unchanged. Three-way
    // equality: streamed scan-fused == batch scan-fused == the
    // registered t_bpe_apply (explode+groupBy) oracle form.
    val sf = "/root/testdata/sf0.001"
    val srcDir = tmp() + "/bpe_src"
    new java.io.File(srcDir).mkdirs()
    Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
      java.nio.file.Paths.get(s"$srcDir/documents.parquet"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = graft.text.Bpe.learnMerges(docs, "text", rounds = 3)
    val stream = graft.text.Bpe.encodeCounts(
      Relay.readStreamPath(spark, srcDir, docs.schema)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", merges)
    val q = stream.writeStream.format("memory").queryName("bpe_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("bpe_mem").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.text.Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val registered = SparkEntry.queries("t_bpe_apply")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch,
      s"streamed BPE encode (${streamed.size}) != batch (${batch.size})")
    assert(batch == registered,
      "scan-fused encode != explode+groupBy t_bpe_apply form")
  }

  test("param fallback chain: explicit > system property > env > default") {
    import graft.etl.Params
    assert(Params.resolve("env_name", Map("env_name" -> "prod")) == Some("prod"))
    sys.props.put("graft.env_name", "staging")
    try {
      assert(Params.resolve("env_name", Map("env_name" -> "prod")) == Some("prod"))
      assert(Params.resolve("env_name") == Some("staging"))
    } finally sys.props.remove("graft.env_name")
    assert(Params.resolve("missing", default = Some("dev")) == Some("dev"))
    intercept[IllegalArgumentException] { Params.require("missing") }
  }

  test("checkpoint paths isolate per layer and query") {
    assert(Relay.checkpointPath("/wh", "02_silver", "relay_flights") ==
      "/wh/_checkpoints/02_silver/relay_flights")
    assert(Relay.checkpointPath("/wh", "02_silver", "a") !=
      Relay.checkpointPath("/wh", "02_silver", "b"))
  }

  test("trigger name mapping covers the reference's three modes") {
    import org.apache.spark.sql.streaming.Trigger
    assert(Relay.trigger("availableNow") == Trigger.AvailableNow())
    assert(Relay.trigger("processingTime", "5 seconds") ==
      Trigger.ProcessingTime("5 seconds"))
    assert(Relay.trigger("once") == Trigger.Once())
    intercept[IllegalArgumentException] { Relay.trigger("bogus") }
  }

  test("streaming transition pairs equal the batch lead-window pairs across a batch boundary") {
    import spark.implicits._
    // 4 entities × 6 ordered events; micro-batch 1 carries ord 1-3,
    // batch 2 carries ord 4-6 (the per-entity in-order contract), so
    // every entity's 3→4 pair straddles the boundary and only exists if
    // the held last event crosses batches in state
    val states = Seq("a", "b", "a", "c", "b", "a")
    val events = for (ent <- 1L to 4L; ord <- 1L to 6L)
      yield (ent, ord, states((ord.toInt - 1 + ent.toInt) % 6))
    // null ts: the unbounded path needs no event time (TTL path only)
    val df = events.toDF("ent", "ord", "state")
      .withColumn("ts", lit(null).cast("timestamp"))
    val srcDir = tmp() + "/trans_src"
    df.filter(col("ord") <= 3).coalesce(1).write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    df.filter(col("ord") > 3).coalesce(1).write.mode("append").parquet(srcDir)
    val stream = Relay.transitionStream(
      Relay.readStreamPath(spark, srcDir, df.schema,
          options = Map("maxFilesPerTrigger" -> "1"))
        .as[Relay.SeqEvent])
    val q = stream.writeStream.format("memory").queryName("trans_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("trans_mem")
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = graft.etl.Sequences.transitionMatrix(df, "ent", Seq("ord"), "state")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch,
      s"streaming/batch divergence: streamed=$streamed batch=$batch")
    // 4 entities × 5 adjacent pairs each = 20 total transitions
    assert(streamed.values.sum == 20L)
  }

  test("streaming attribution report equals the batch report across a " +
    "micro-batch boundary") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value")
    // split at the median day: many 1-hour lookback windows straddle the
    // boundary (per-user in-order arrival preserved — batch 1 is
    // strictly earlier than batch 2)
    val cut = "2024-01-15"
    val srcDir = tmp() + "/att_src"
    ev.filter(col("ts") < lit(cut)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    ev.filter(col("ts") >= lit(cut)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val stream = Relay.attributionStream(
      Relay.readStreamPath(spark, srcDir, ev.schema,
          options = Map("maxFilesPerTrigger" -> "1"))
        .as[Relay.AttEvent])
    val q = stream.writeStream.format("memory").queryName("att_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val streamed = keyed(
      graft.etl.Attribution.channelReport(spark.table("att_mem")))
    val batch = keyed(graft.etl.Attribution.report(Tables.events(spark, sf)))
    assert(streamed == batch,
      s"streaming/batch attribution divergence:\n  s=$streamed\n  b=$batch")
    // every purchase emits rows exactly once
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val streamedPids = spark.table("att_mem").select("pid").distinct().count()
    assert(streamedPids == purchases,
      "each purchase must appear exactly once in the streamed rows")
  }

  test("streaming funnel step counts equal the batch windowed funnel") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_type")
    // split at the median day so later funnel steps straddle the
    // micro-batch boundary (per-user in-order arrival is preserved:
    // batch 1 holds strictly earlier events than batch 2)
    val cut = "2024-01-15"
    val srcDir = tmp() + "/funnel_src"
    ev.filter(col("ts") < lit(cut)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    ev.filter(col("ts") >= lit(cut)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val stream = Relay.funnelStream(
      Relay.readStreamPath(spark, srcDir, ev.schema,
          options = Map("maxFilesPerTrigger" -> "1"))
        .as[Relay.FunnelEvent],
      windowSec = 86400L)
    val q = stream.writeStream.format("memory").queryName("funnel_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("funnel_mem")
      .groupBy("step").agg(count(lit(1)).as("users"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = graft.queries.TimelineQ.funnelWindowed(Tables.events(spark, sf))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"streaming/batch divergence: streamed=$streamed batch=$batch")
    // each step fires at most once per user
    val dup = spark.table("funnel_mem")
      .groupBy("user_id", "step").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup == 0, "a funnel step must fire exactly once per user")
  }

  test("streaming grouped HLL registers equal the batch sketch across a batch boundary") {
    import spark.implicits._
    // hllRegistersBy is select → groupBy(group, bucket) → max(rho): a
    // plain aggregation whose incremental maintenance IS the engine's
    // agg state (the CMS discipline, SketchSpec) — the max-merge law
    // per (group, bucket) is exactly what update/complete mode replays.
    val dir = tmp() + "/hll_src"
    val rows = (1 to 400).map(i => (s"lang_${i % 3}", s"tok_${i % 97}"))
      .toDF("lang", "tok")
    rows.filter(md5(col("tok")).substr(1, 1) < "8")
      .coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    rows.filter(md5(col("tok")).substr(1, 1) >= "8")
      .coalesce(1).write.mode("append").parquet(dir)
    val streamIn = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = graft.sketch.Sketch.hllRegistersBy(streamIn, "tok", "lang", m = 16)
      .writeStream.format("memory").queryName("hll_mem")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val streamed = keyed(spark.table("hll_mem"))
    val batch = keyed(graft.sketch.Sketch.hllRegistersBy(rows, "tok", "lang", m = 16))
    assert(streamed == batch,
      "streamed grouped-HLL registers must equal the batch sketch")
    // and the register-table equality carries to the estimates
    val se = graft.sketch.Sketch
      .hllEstimateBy(spark.table("hll_mem"), "lang", m = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val be = graft.sketch.Sketch
      .hllEstimateBy(graft.sketch.Sketch.hllRegistersBy(rows, "tok", "lang", m = 16),
        "lang", m = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(se == be)
  }

  test("streaming MG candidate state keeps the superset law across micro-batches") {
    import spark.implicits._
    // hot appears 300/1000 rows, warm 100; the rest are singletons. With
    // freqDiv=10 the true heavy hitters of the WHOLE stream are {hot}.
    val all = Seq.fill(300)("hot") ++ Seq.fill(100)("warm") ++
      (1 to 600).map(i => s"one_$i")
    val P = 4
    val rows = all.zipWithIndex
      .map { case (t, i) => (math.floorMod(t.hashCode, P), t, i) }
    val dir = tmp() + "/mg_src"
    // two micro-batches: hot is split across the boundary so the MG
    // state must carry partial counts between batches
    rows.filter(_._3 % 2 == 0).toDF("pk", "tok", "i").drop("i")
      .coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    rows.filter(_._3 % 2 == 1).toDF("pk", "tok", "i").drop("i")
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val k = 16
    val q = Relay.mgCandidateStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(dir)
          .withColumn("ts", lit(null).cast("timestamp"))
          .as[Relay.MgTok], k)
      .writeStream.format("memory").queryName("mg_mem")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a shard's LIVE candidates are its latest (max seen) emission
    val emittedRows = spark.table("mg_mem")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val maxSeen = emittedRows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val latestPairs = emittedRows
      .filter { case (pk, _, s) => s == maxSeen(pk) }
      .map { case (pk, tok, _) => (pk, tok) }.distinct
    val cands = latestPairs.map(_._2).toSet
    val latest = latestPairs.toSeq.toDF("pk", "tok")
    // O(k) state: no shard may carry more than k survivors
    val perShard = latestPairs.groupBy(_._1).view.mapValues(_.size)
    assert(perShard.values.forall(_ <= k), s"a shard exceeded k=$k candidates")
    // superset law over EVERYTHING seen, exactly like the batch pass
    val toksDf = all.toDF("tok")
    val truth = toksDf.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10L > lit(all.size.toLong))
      .collect().map(_.getString(0)).toSet
    assert(truth == Set("hot"))
    assert(truth.subsetOf(cands),
      s"streamed candidates must contain every true heavy hitter; missing ${truth -- cands}")
    // end-to-end: the batch recount-and-gate over the streamed candidate
    // set yields the EXACT heavy hitters — candidates change cost, never
    // results (the heavyHitters equality law, now across a stream)
    val exact = toksDf
      .join(broadcast(latest.select("tok").distinct()), Seq("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 10L > lit(all.size.toLong))
      .collect().map(_.getString(0)).toSet
    assert(exact == truth)
  }

  test("streaming KMV bottom-k equals the batch sketch across micro-batches") {
    import spark.implicits._
    val all = (1 to 2000).map(i => s"k$i")
    val P = 4
    val k = 64
    // pre-hash relationally with the house kernel, route to P shards
    def hashed(df: org.apache.spark.sql.DataFrame) =
      df.select(
        pmod(hash(col("tok")), lit(P)).cast("int").as("pk"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10)
          .cast("long").as("h"))
    val dir = tmp() + "/kmv_src"
    // two micro-batches: the global bottom-k straddles the boundary
    val rows = all.zipWithIndex
    rows.filter(_._2 % 2 == 0).map(_._1).toDF("tok")
      .coalesce(1).write.mode("append").parquet(dir)
    new java.io.File(dir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    rows.filter(_._2 % 2 == 1).map(_._1).toDF("tok")
      .coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = Relay.kmvStream(
        hashed(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir))
          .withColumn("ts", lit(null).cast("timestamp"))
          .as[Relay.KmvTok], k)
      .writeStream.format("memory").queryName("kmv_mem")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a shard's LIVE sketch is its latest (max seen) emission; the
    // union re-limited to k must equal the batch sketch bit for bit
    val emitted = spark.table("kmv_mem")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val maxSeen = emitted.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val live = emitted
      .filter { case (pk, _, s) => s == maxSeen(pk) }
      .map(_._2).distinct.sorted.take(k).toSeq
    // O(k) state: no shard may carry more than k hashes
    val perShard = emitted
      .filter { case (pk, _, s) => s == maxSeen(pk) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(perShard.values.forall(_ <= k), s"a shard exceeded k=$k hashes")
    val batch = graft.sketch.Sketch
      .kmvSketch(all.toDF("tok"), "tok", k)
      .collect().map(_.getLong(0)).toSeq
    assert(live == batch,
      "streamed KMV union re-limited to k must equal the batch sketch")
  }

  test("streaming corpus fingerprint equals the batch fingerprint across " +
    "a micro-batch boundary") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val srcDir = tmp() + "/hash_src"
    // two files → two micro-batches with maxFilesPerTrigger=1
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = docs.schema
    val q = Relay.contentHashStream(
        Relay.readStreamPath(spark, srcDir, schema,
          options = Map("maxFilesPerTrigger" -> "1")), cols)
      .writeStream.format("memory").queryName("chash_mem")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("chash_mem")
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val batch = graft.text.ContentHash.fingerprint(docs, cols)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(streamed == batch,
      s"streaming/batch fingerprint divergence: $streamed vs $batch")
    assert(streamed._1 == docs.count())
  }

  test("streaming closed islands equal the batch islands across a " +
    "micro-batch boundary") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.canonEventTs(Tables.events(spark, sf))
      .select("user_id", "ts")
    // split at the median-ish day: streaks straddling the cut only
    // survive if the open island crosses batches in state
    val cut = "2024-01-15"
    val srcDir = tmp() + "/isl_src"
    ev.filter(col("ts") < lit(cut)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() - 60000))
    ev.filter(col("ts") >= lit(cut)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val stream = Relay.islandsStream(
      Relay.readStreamPath(spark, srcDir, ev.schema,
          options = Map("maxFilesPerTrigger" -> "1"))
        .as[Relay.IslEvent])
    val q = stream.writeStream.format("memory").queryName("isl_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("isl_mem")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch islands via the e_islands anchor algebra, minus each
    // user's LAST island (still open at stream end, legitimately
    // unemitted)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("di")
    val isl = ev
      .select(col("user_id"),
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)").as("di"))
      .distinct()
      .withColumn("anchor", col("di") - row_number().over(w))
      .groupBy("user_id", "anchor")
      .agg(min(col("di")).as("start_day"), count(lit(1)).as("streak_len"))
    val closed = isl
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("start_day").desc)))
      .filter(col("rk") > 1)
      .select("user_id", "start_day", "streak_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === closed,
      s"streaming/batch island divergence: ${streamed.size} vs ${closed.size}")
    assert(streamed.nonEmpty)
  }

  // ------------------------------------------------------------------
  // Event-time TTL (bounded state) — r9 verdict #2. Shared shape: run 1
  // seeds state, a far-future event in run 2 advances the watermark past
  // every seeded key's TTL (timeouts fire inside the same AvailableNow
  // run — the statefulSessions pattern), run 3 proves (a) within-horizon
  // behavior is unchanged and (b) the expired key's state is GONE
  // (behaviorally: the output a surviving state row would have produced
  // does not appear).

  private def tt(sec: Int): java.sql.Timestamp =
    new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000L)

  test("scd2 TTL flushes idle open versions and drops their state") {
    import spark.implicits._
    val src = tmp() + "/s2tsrc"; val ckp = tmp() + "/s2tckp"
    val dst = tmp() + "/s2tdst"
    def write(rows: Seq[(Long, java.sql.Timestamp, Long, String)]): Unit =
      rows.toDF("user_id", "ts", "event_id", "event_type")
        .write.mode("append").parquet(src)
    write(Seq((1L, tt(0), 1L, "A"), (1L, tt(100), 2L, "B"),
      (2L, tt(0), 3L, "X")))
    val schema = spark.read.parquet(src).schema
    var lastStateRows = -1L
    def run(): Unit = {
      val stream = Relay.readStreamPath(spark, src, schema)
        .as[Relay.Scd2Event]
      val q = Relay.scd2Stream(stream, ttlSeconds = 300,
          watermark = "0 seconds")
        .writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
      lastStateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    }
    run()
    // within horizon: only the in-stream closure
    val r1 = spark.read.parquet(dst).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(3))).toSet
    assert(r1 === Set((1L, "A", tt(100))), s"run1: $r1")
    // far-future event → watermark passes both keys' TTL → FLUSH
    write(Seq((3L, tt(1000), 4L, "Z")))
    run()
    val r2 = spark.read.parquet(dst).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(3))).toSet
    assert(r2 === Set((1L, "A", tt(100)), (1L, "B", null), (2L, "X", null)),
      s"run2 must flush open B and X with null effective_to: $r2")
    // re-admission: user 1 post-eviction opens fresh (no closure of B);
    // user 3 within horizon closes normally
    write(Seq((1L, tt(1200), 5L, "C"), (3L, tt(1100), 6L, "W")))
    run()
    val r3 = spark.read.parquet(dst).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(3))).toSet
    assert(r3 === r2 + ((3L, "Z", tt(1100))),
      s"run3: user3 closes Z in-horizon, user1's flushed B must NOT re-close: $r3")
    // expired keys' state rows are gone: only user1's C and user3's W remain
    assert(lastStateRows == 2L,
      s"state must hold exactly the 2 live open versions, got $lastStateRows")
  }

  test("funnel TTL drops idle funnel progress and keeps in-horizon steps") {
    import spark.implicits._
    val src = tmp() + "/fntsrc"; val ckp = tmp() + "/fntckp"
    val dst = tmp() + "/fntdst"
    def write(rows: Seq[(Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("user_id", "ts", "event_type")
        .write.mode("append").parquet(src)
    // user 1 completes signup+click in-horizon; user 2 signs up only
    write(Seq((1L, tt(0), "signup"), (1L, tt(10), "click"),
      (2L, tt(0), "signup")))
    val schema = spark.read.parquet(src).schema
    var lastStateRows = -1L
    def run(): Unit = {
      val stream = Relay.readStreamPath(spark, src, schema)
        .as[Relay.FunnelEvent]
      val q = Relay.funnelStream(stream, windowSec = 100L,
          ttlSeconds = 300L, watermark = "0 seconds")
        .writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
      lastStateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    }
    run()
    val r1 = spark.read.parquet(dst).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(r1 === Set((1L, 1), (1L, 2), (2L, 1)), s"run1: $r1")
    // far-future event advances the watermark past both users' TTL
    write(Seq((9L, tt(1000), "signup")))
    run()
    assert(lastStateRows == 1L,
      s"only user 9's fresh state must survive the horizon, got $lastStateRows")
    // user 1's purchase arrives post-eviction: the click it would chain
    // from is gone — step 3 must NOT fire (steps don't cross the horizon);
    // a fresh signup from user 2 re-fires step 1 (per-horizon counting)
    write(Seq((1L, tt(1050), "purchase"), (2L, tt(1050), "signup")))
    run()
    val r3 = spark.read.parquet(dst).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(r3 === r1 ++ Set((9L, 1), (2L, 1)),
      s"run3: no cross-horizon purchase, fresh user-2 funnel: $r3")
    val u2steps = spark.read.parquet(dst)
      .filter(col("user_id") === 2L && col("step") === 1).count()
    assert(u2steps == 2L, "user 2 re-fires step 1 in the new horizon")
  }

  test("transition TTL: pairs never span the horizon; in-horizon pairs " +
      "match the unbounded path") {
    import spark.implicits._
    val src = tmp() + "/trtsrc"; val ckp = tmp() + "/trtckp"
    val dst = tmp() + "/trtdst"
    def write(rows: Seq[(Long, Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("ent", "ord", "state", "ts")
        .write.mode("append").parquet(src)
    write(Seq((1L, 1L, "a", tt(0)), (1L, 2L, "b", tt(10))))
    val schema = spark.read.parquet(src).schema
    var lastStateRows = -1L
    def go(): Unit = {
      val stream = Relay.transitionStream(
        Relay.readStreamPath(spark, src, schema).as[Relay.SeqEvent],
        ttlSeconds = 300L, watermark = "0 seconds")
      val q = stream.writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
      lastStateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    }
    go()
    val r1 = spark.read.parquet(dst).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(r1 === Set(("a", "b")), s"run1: $r1")
    // far-future entity 9 advances the watermark past entity 1's TTL
    write(Seq((9L, 1L, "x", tt(1000))))
    go()
    assert(lastStateRows == 1L,
      s"entity 1's held event must be evicted, got $lastStateRows")
    // entity 1 re-admitted: first event emits NO (b → c) cross-horizon
    // pair; the next in-horizon pair (c → d) emits normally
    write(Seq((1L, 3L, "c", tt(1100)), (1L, 4L, "d", tt(1110))))
    go()
    val r3 = spark.read.parquet(dst).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(r3 === Set(("a", "b"), ("c", "d")),
      s"run3 must NOT contain the cross-horizon (b,c): $r3")
  }

  test("attribution TTL is lossless in-horizon and evicts idle users") {
    import spark.implicits._
    val src = tmp() + "/atttsrc"; val ckp = tmp() + "/atttckp"
    val dst = tmp() + "/atttdst"
    def write(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
      rows.toDF("user_id", "ts", "event_id", "event_type", "value")
        .write.mode("append").parquet(src)
    // user 1: click then purchase in-window (in-horizon attribution)
    write(Seq((1L, tt(0), 1L, "click", 0.0), (1L, tt(50), 2L, "purchase", 10.0)))
    val schema = spark.read.parquet(src).schema
    var lastStateRows = -1L
    def run(): Unit = {
      val stream = Relay.attributionStream(
        Relay.readStreamPath(spark, src, schema).as[Relay.AttEvent],
        windowSec = 100L, ttlSeconds = 300L, watermark = "0 seconds")
      val q = stream.writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
      lastStateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    }
    run()
    val r1 = spark.read.parquet(dst).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(r1 === Set((2L, "click", 1L)), s"run1: $r1")
    // user 1 touches again, then goes idle past the TTL
    write(Seq((1L, tt(100), 3L, "click", 0.0)))
    run()
    write(Seq((9L, tt(1000), 4L, "click", 0.0)))
    run()
    assert(lastStateRows == 1L,
      s"user 1's state row must be evicted after the horizon, got $lastStateRows")
    // post-eviction purchase: the tt(100) click is outside the 100 s
    // window ANYWAY (tt(1100) - tt(100) >> 100 s), so losing it is
    // lossless — the purchase reports touch-less 'direct', exactly as
    // the unbounded path would
    write(Seq((1L, tt(1100), 5L, "purchase", 20.0)))
    run()
    val r4 = spark.read.parquet(dst).filter(col("pid") === 5L).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(r4 === Set((5L, null, 0L)),
      s"post-horizon purchase must be 'direct' (lossless eviction): $r4")
    // ttl < window is rejected loudly
    val err = intercept[IllegalArgumentException] {
      Relay.attributionStream(
        Relay.readStreamPath(spark, src, schema).as[Relay.AttEvent],
        windowSec = 400L, ttlSeconds = 300L)
    }
    assert(err.getMessage.contains("must be >= the lookback window"))
  }

  test("ffill TTL drops the carried reading after the horizon") {
    import spark.implicits._
    val src = tmp() + "/fftsrc"; val ckp = tmp() + "/fftckp"
    val dst = tmp() + "/fftdst"
    def write(rows: Seq[(Long, java.sql.Timestamp, Long, java.lang.Double)]): Unit =
      rows.toDF("user_id", "ts", "event_id", "reading")
        .write.mode("append").parquet(src)
    write(Seq((1L, tt(0), 1L, java.lang.Double.valueOf(5.0))))
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val stream = Relay.readStreamPath(spark, src, schema)
        .as[Relay.FfillEvent]
      val q = Relay.ffillStream(stream, ttlSeconds = 300,
          watermark = "0 seconds")
        .writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
    }
    run()
    write(Seq((9L, tt(1000), 2L, java.lang.Double.valueOf(1.0))))
    run() // watermark 1000 > user1's TTL expiry 300 → reading evicted
    write(Seq((1L, tt(1100), 3L, null), (9L, tt(1100), 4L, null)))
    run()
    val filled = spark.read.parquet(dst).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(4)) null
                                 else java.lang.Double.valueOf(r.getDouble(4))))
      .toMap
    assert(filled(3L) == null,
      s"user1's gap must NOT fill across the horizon, got ${filled(3L)}")
    assert(filled(4L) == 1.0,
      s"user9's gap fills within the horizon, got ${filled(4L)}")
  }

  test("nearDup TTL forgets bucket members past the horizon") {
    import spark.implicits._
    val src = tmp() + "/ndtsrc"; val ckp = tmp() + "/ndtckp"
    val dst = tmp() + "/ndtdst"
    val textA = "the quick brown fox jumps over the lazy dog again"
    val textB = "completely different words appear in this unrelated sentence here"
    def write(rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("doc_id", "text", "ts").write.mode("append").parquet(src)
    write(Seq((1L, textA, tt(0))))
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = Relay.nearDupStream(Relay.readStreamPath(spark, src, schema),
          tsCol = "ts", ttlSeconds = 300, watermark = "0 seconds")
        .writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
    }
    run()
    write(Seq((50L, textB, tt(1000))))
    run() // watermark 1000 → doc1's bucket members (TTL 300) evicted
    write(Seq((2L, textA, tt(1100)), (51L, textB, tt(1100))))
    run()
    val pairs = spark.read.parquet(dst).select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((50L, 51L)),
      s"in-horizon (50,51) pairs; evicted doc 1 must NOT pair with 2: $pairs")
  }

  test("spanDup TTL forgets shingles past the horizon") {
    import spark.implicits._
    val src = tmp() + "/sdtsrc"; val ckp = tmp() + "/sdtckp"
    val dst = tmp() + "/sdtdst"
    val textA = "alpha beta gamma delta epsilon"
    val textB = "vee doubleu ex wye zee"
    def write(rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("doc_id", "text", "ts").write.mode("append").parquet(src)
    write(Seq((1L, textA, tt(0))))
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = Relay.spanDupStream(Relay.readStreamPath(spark, src, schema),
          tsCol = "ts", ttlSeconds = 300, watermark = "0 seconds")
        .writeStream.format("parquet").option("path", dst)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp).start()
      q.awaitTermination()
    }
    run()
    write(Seq((50L, textB, tt(1000))))
    run() // watermark 1000 → doc1's shingle state evicted
    write(Seq((2L, textA, tt(1100)), (51L, textB, tt(1100))))
    run()
    val marks = spark.read.parquet(dst).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(marks === Set((50L, 0L), (51L, 0L)),
      s"in-horizon dup (50,51) marks; evicted doc 1 must NOT mark with 2: $marks")
  }

  test("MG shard TTL resets the summary after an idle horizon") {
    import spark.implicits._
    val src = tmp() + "/mgtsrc"; val ckp = tmp() + "/mgtckp"
    def write(rows: Seq[(Int, String, java.sql.Timestamp)]): Unit =
      rows.toDF("pk", "tok", "ts").write.mode("append").parquet(src)
    write(Seq((0, "x", tt(0)), (0, "x", tt(0)), (0, "y", tt(0))))
    val schema = spark.read.parquet(src).schema
    // memory sink can't recover a checkpoint; collect via foreachBatch
    def run(): Set[(Int, String, Long)] = {
      val got = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Int, String, Long)]()
      val stream = Relay.readStreamPath(spark, src, schema).as[Relay.MgTok]
      val q = Relay.mgCandidateStream(stream, k = 2, ttlSeconds = 300,
          watermark = "0 seconds")
        .writeStream
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r =>
            got.add((r.getInt(0), r.getString(1), r.getLong(2))))
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    val r1 = run()
    assert(r1 === Set((0, "x", 3L), (0, "y", 3L)), s"run1: $r1")
    write(Seq((1, "z", tt(1000))))
    run() // watermark 1000 → shard 0 (idle since 0) evicted
    write(Seq((0, "w", tt(1100))))
    val r3 = run()
    assert(r3 === Set((0, "w", 1L)),
      s"shard 0 must restart from empty (seen=1, only w): $r3")
  }

  test("KMV shard TTL resets the sketch after an idle horizon") {
    import spark.implicits._
    val src = tmp() + "/kvtsrc"; val ckp = tmp() + "/kvtckp"
    def write(rows: Seq[(Int, Long, java.sql.Timestamp)]): Unit =
      rows.toDF("pk", "h", "ts").write.mode("append").parquet(src)
    write(Seq((0, 10L, tt(0)), (0, 5L, tt(0))))
    val schema = spark.read.parquet(src).schema
    def run(): Set[(Int, Long, Long)] = {
      val got = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Int, Long, Long)]()
      val stream = Relay.readStreamPath(spark, src, schema).as[Relay.KmvTok]
      val q = Relay.kmvStream(stream, k = 2, ttlSeconds = 300,
          watermark = "0 seconds")
        .writeStream
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r =>
            got.add((r.getInt(0), r.getLong(1), r.getLong(2))))
        }
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    val r1 = run()
    assert(r1 === Set((0, 5L, 2L), (0, 10L, 2L)), s"run1: $r1")
    write(Seq((1, 7L, tt(1000))))
    run() // watermark 1000 → shard 0 evicted
    write(Seq((0, 99L, tt(1100))))
    val r3 = run()
    assert(r3 === Set((0, 99L, 1L)),
      s"shard 0 must restart from empty (seen=1, only 99): $r3")
  }

  test("streaming DV upsert ≡ batch latest-wins; old files never rewritten") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val src = tmp() + "/dvu_src"; val ckp = tmp() + "/dvu_ckp"
    val dst = tmp() + "/dvu_dst"
    def write(rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("k", "seq", "v").write.mode("append").parquet(src)
    // seed the target through the SAME sink (first batch creates v1)
    write((0L until 200L).map(k => (k, 0L, s"base$k")))
    val schema = spark.read.parquet(src).schema
    def run(): Unit = {
      val q = Relay.writeStreamUpsertDv(
        Relay.readStreamPath(spark, src, schema), dst, ckp, "k", "seq")
      q.awaitTermination()
    }
    run()
    def files(): Map[String, Long] =
      new java.io.File(dst).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length()).toMap
    val before = files()
    // micro-batch 2: updates (incl. an in-batch duplicate — seq wins) + insert
    write(Seq((5L, 1L, "u5a"), (5L, 2L, "u5b"), (7L, 1L, "u7"),
      (9999L, 1L, "new")))
    run()
    val after = files()
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len),
        s"DV streaming sink rewrote pre-existing file $f") }
    val out = io.Sinks.readVersioned(spark, dst)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(5L) == "u5b" && out(7L) == "u7" && out(9999L) == "new"
      && out(6L) == "base6" && out.size == 201,
      s"latest-wins content wrong: ${out.toSeq.filter(_._1 < 10)}")
    // fold the accumulated DVs; content identical
    io.Sinks.optimizeTable(spark, dst, "k", targetRows = 1000000L)
    val folded = io.Sinks.readVersioned(spark, dst)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(folded == out, "OPTIMIZE changed streaming-upserted content")
  }

  override def afterAll(): Unit = spark.stop()
}
