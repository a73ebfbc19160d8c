package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

import graft.etl.Cleaning
import graft.io.Sinks

/** Structured Streaming surface (SURVEY §2.1 S7–S10, §2.9) — Spark-native
  * re-expression of the reference's streaming module
  * (`src/streaming/readers.py:11-94`, `writers.py:12-132`,
  * `checkpoints.py:4-20`).
  *
  * The reference's streaming model is INCREMENTAL RELAY (no watermarks, no
  * event-time windows): layer-to-layer append with batch-style
  * `availableNow` triggers plus a foreachBatch MERGE upsert. Both are
  * preserved; checkpoints are per-(layer, query) directories exactly like
  * `streaming_config.py:6-48`.
  */
object Relay {

  /** Per-(layer, query) checkpoint directory layout (reference
    * `src/streaming/checkpoints.py:4-20` + `streaming_config.py:6-48`):
    * one checkpoint root per environment, isolated subdirectory per
    * relay query so restarts resume the right offsets. */
  def checkpointPath(root: String, layer: String, queryName: String): String =
    s"$root/_checkpoints/$layer/$queryName"

  /** S7 — streaming table source (reference `read_stream_from_table`). */
  def readStreamTable(spark: SparkSession, table: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.readStream.format(format))((r, kv) =>
      r.option(kv._1, kv._2)).table(table)

  /** S8 — streaming path source with explicit schema (reference
    * `read_stream_from_path`; schema is REQUIRED for file streams). */
  def readStreamPath(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.readStream.schema(schema).format(format))((r, kv) =>
      r.option(kv._1, kv._2)).load(path)

  /** Stream-stream INTERVAL join — the streaming twin of
    * [[graft.operators.RangeJoin.followingWithin]]: right-side rows in
    * the window strictly AFTER each left row, as a watermarked
    * stream-stream inner join. Both sides carry event-time watermarks
    * and the time bound sits IN the join condition — that pair is what
    * lets Spark expire buffered join state once the watermark passes a
    * row's window, so state is O(rows within the watermark horizon),
    * never the whole stream. Right keys/ts are renamed (`r_*`, rts) so
    * the output schema is unambiguous; `lts` is the left event time. */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, payload: Seq[String],
      windowSec: Long, watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val l = left.withColumnRenamed(tsCol, "lts")
      .withWatermark("lts", watermark)
    val r = keys.foldLeft(
        right.select((keys :+ tsCol).map(col) ++ payload.map(col): _*)
          .withColumnRenamed(tsCol, "rts"))(
        (df, k) => df.withColumnRenamed(k, s"r_$k"))
      .withWatermark("rts", watermark)
    val cond = keys.map(k => col(k) === col(s"r_$k")).reduce(_ && _) &&
      col("rts") > col("lts") &&
      col("rts") <= col("lts") + expr(s"INTERVAL $windowSec SECONDS")
    l.join(r, cond, "inner").drop(keys.map(k => s"r_$k"): _*)
  }

  /** Streaming exact dedup — the streaming twin of
    * [[graft.dedup.Dedup.exactDedup]]: duplicates of a key arriving
    * within the event-time watermark are dropped across micro-batches,
    * and per-key state is EVICTED once the watermark passes — the
    * unbounded-state guard that makes streaming dedup viable at 100 TB
    * (plain dropDuplicates would hold every key forever). */
  def streamingDedup(df: DataFrame, keys: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Trigger names → Spark triggers (reference `writers.py:53-59`:
    * availableNow default, processingTime, once). */
  @scala.annotation.nowarn("cat=deprecation") // "once" is a reference-contract mode
  def trigger(name: String, interval: String = "10 seconds"): Trigger =
    name match {
      case "availableNow" => Trigger.AvailableNow()
      case "processingTime" => Trigger.ProcessingTime(interval)
      case "once" => Trigger.Once()
      case other => throw new IllegalArgumentException(s"unknown trigger: $other")
    }

  /** S9 — streaming sink to a path (reference `write_stream_to_table`,
    * `writers.py:12-76`): checkpointed, named, triggered; output modes
    * append/complete/update. Returns the started query; call
    * `processAllAvailable()`/`awaitTermination()` per the reference's
    * optional await. */
  def writeStreamPath(df: DataFrame, path: String, checkpoint: String,
      outputMode: String = "append", queryName: String = "relay",
      trig: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode(outputMode)
      .queryName(queryName)
      .trigger(trig)
      .start()

  /** Watermarked tumbling-window aggregation (beyond the reference's
    * relay-only surface; the standard event-time streaming shape). In
    * append mode a window emits exactly once, when the watermark passes
    * its end — late events beyond `watermark` are dropped, bounding state.
    */
  def windowedCounts(events: DataFrame, tsCol: String, window: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col(tsCol), window))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .select(
        org.apache.spark.sql.functions.col("window.start").as("window_start"),
        org.apache.spark.sql.functions.col("n_events"))

  /** One event for the stateful sessionizer. */
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)

  /** Mutable per-user session state carried across micro-batches. */
  final case class SessionState(start: Long, end: Long, nEvents: Long,
      sumValue: Double)

  /** A completed session emitted once its gap timeout expires. */
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Custom streaming state via flatMapGroupsWithState (beyond the
    * reference): per-user sessions closed after `gapSeconds` of event-time
    * inactivity. State is one small record per ACTIVE user — the
    * watermark-driven timeout guarantees it's bounded; completed sessions
    * stream out in append mode. */
  def statefulSessions(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapSeconds: Long, watermark: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, batch, state: GroupState[SessionState]) =>
          def emit(s: SessionState) = SessionOut(userId,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
            s.nEvents, s.sumValue)
          if (batch.isEmpty && state.hasTimedOut) {
            // gap elapsed in event time → close and emit the session
            val done = state.get
            state.remove()
            Iterator(emit(done))
          } else {
            val events = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            events.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.nEvents + 1, s.sumValue + e.value))
                case Some(s) =>
                  closed ::= emit(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
      .toDF()
  }

  /** One attribute-change event for the streaming SCD2 builder. */
  final case class Scd2Event(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)

  /** The OPEN dimension version per key, carried across micro-batches.
    * Carries the Timestamp itself — a millis epoch long would silently
    * truncate the event feed's microsecond precision. */
  final case class Scd2State(curType: String, from: java.sql.Timestamp)

  /** A CLOSED dimension version (the open one lives in state until its
    * successor arrives). */
  final case class Scd2Out(user_id: Long, event_type: String,
      effective_from: java.sql.Timestamp, effective_to: java.sql.Timestamp)

  /** Streaming SCD Type-2 dimension build — the incremental twin of the
    * batch `scd2` query: per key, consecutive duplicate attribute values
    * collapse; each change CLOSES the open version (emitted downstream in
    * append mode) and opens a new one held in state. State is one small
    * record per key. Contract: the change feed is in key-local event
    * order across batches (the standard CDC-feed ordering guarantee);
    * within a batch, events are sorted by (ts, event_id) before folding.
    * Streaming output ≡ batch scd2 rows with is_current = false — the
    * open versions are exactly the batch is_current rows (asserted in
    * StreamingSpec).
    *
    * Bounded state (`ttlSeconds` > 0): keyed by user, state otherwise
    * grows with distinct keys forever on an infinite stream. With a TTL
    * the input is watermarked on `ts` and a key idle for `ttlSeconds`
    * of EVENT time is FLUSHED: its open version emits with
    * effective_to = null (exactly the batch is_current row — the
    * dimension's current row as of the horizon) and the state row is
    * dropped. Re-admission semantics: a later change for a flushed key
    * opens a fresh version WITHOUT closing the flushed one (its
    * effective_to stays null); a downstream MERGE keyed on
    * (user_id, effective_from) reconciles — the standard
    * state-bound/lookback trade, documented not hidden. Within the
    * horizon, output is identical to the unbounded path. */
  def scd2Stream(events: org.apache.spark.sql.Dataset[Scd2Event],
      ttlSeconds: Long = 0L, watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val src = if (ttlSeconds > 0) events.withWatermark("ts", watermark)
              else events
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append(), timeout) {
        (userId, batch, state: GroupState[Scd2State]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          // horizon passed with no change: flush the open version as the
          // key's current dimension row and drop the state row
          val s = state.get
          state.remove()
          Iterator(Scd2Out(userId, s.curType, s.from, null))
         } else {
          // Full-precision ordering: (seconds, nanos, id) — getTime alone
          // is millis and would mis-order same-millisecond events that
          // the batch twin orders by their microsecond timestamps.
          // floorDiv, not /: pre-epoch getTime is negative and truncating
          // toward zero would order -0.5s after -1s's nanos component.
          val ordered = batch.toSeq
            .sortBy(e => (Math.floorDiv(e.ts.getTime, 1000), e.ts.getNanos, e.event_id))
          var closed = List.empty[Scd2Out]
          var cur = state.getOption
          ordered.foreach { e =>
            cur match {
              case Some(s) if s.curType != e.event_type =>
                closed ::= Scd2Out(userId, s.curType, s.from, e.ts)
                cur = Some(Scd2State(e.event_type, e.ts))
              case None =>
                cur = Some(Scd2State(e.event_type, e.ts))
              case _ => () // same attribute value: collapse
            }
          }
          cur.foreach { c =>
            state.update(c)
            if (ttlSeconds > 0) {
              val lastMs = ordered.lastOption.map(_.ts.getTime)
                .getOrElse(state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1, lastMs + ttlSeconds * 1000))
            }
          }
          closed.reverseIterator
         }
      }
      .toDF()
  }

  /** One reading for the streaming forward-filler (None = gap). */
  final case class FfillEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, reading: Option[Double])

  /** Last non-null reading per key, carried across micro-batches
    * (`lastTs` = millis of the key's newest event, driving the TTL
    * timeout; 0 on the unbounded path). */
  final case class FfillState(last: Double, lastTs: Long = 0L)

  final case class FfillOut(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, reading: Option[Double],
      reading_filled: Option[Double])

  /** Streaming forward fill — the incremental twin of the batch
    * `w8_ffill` query: gaps (None readings) repair with the key's last
    * non-null value, which persists across micro-batches in one small
    * state record per key. Same in-order contract as [[scd2Stream]].
    *
    * Bounded state (`ttlSeconds` > 0): a key idle for `ttlSeconds` of
    * event time (watermark-driven) silently drops its carried reading.
    * Re-admission semantics: the key's first post-eviction GAP rows
    * emit unfilled (reading_filled = null) where the unbounded path
    * would repair from the pre-horizon value — fills never cross the
    * horizon, the standard trade. Within the horizon, output is
    * identical to the unbounded path. */
  def ffillStream(events: org.apache.spark.sql.Dataset[FfillEvent],
      ttlSeconds: Long = 0L, watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val src = if (ttlSeconds > 0) events.withWatermark("ts", watermark)
              else events
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FfillState, FfillOut](
        OutputMode.Append(), timeout) {
        (userId, batch, state: GroupState[FfillState]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          state.remove() // horizon passed: the carried reading expires
          Iterator.empty
         } else {
          val ordered = batch.toSeq
            .sortBy(e => (Math.floorDiv(e.ts.getTime, 1000), e.ts.getNanos, e.event_id))
          var last = state.getOption
          val out = ordered.map { e =>
            if (e.reading.isDefined)
              last = Some(FfillState(e.reading.get, e.ts.getTime))
            FfillOut(userId, e.event_id, e.ts, e.reading, last.map(_.last))
          }
          last.foreach { l =>
            val st = ordered.lastOption.map(e =>
              l.copy(lastTs = math.max(l.lastTs, e.ts.getTime))).getOrElse(l)
            state.update(st)
            if (ttlSeconds > 0)
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                st.lastTs + ttlSeconds * 1000))
          }
          out.iterator
         }
      }
      .toDF()
  }

  /** One banded signature row for the streaming near-dup detector
    * (`ts` = the document's event time; null on the unbounded path). */
  final case class NearDupBandRow(band: Int, band_val: Long, id: Long,
      simhash: Long, ts: java.sql.Timestamp = null)

  /** Per-(band, band_val) bucket membership carried across micro-batches:
    * every (id, simhash, eventTimeMs) in this bucket (tsMs = 0 on the
    * unbounded path; on the TTL path members older than the horizon are
    * pruned as the watermark passes). */
  final case class NearDupState(docs: List[(Long, Long, Long)])

  final case class NearDupPair(id_a: Long, id_b: Long, hamming: Int)

  /** Streaming near-dup detection — the incremental twin of the batch
    * [[graft.dedup.Dedup.simhashPairs]] pipeline, the one extension
    * operator that previously had no streaming counterpart. Each arriving
    * document's 64-bit simhash (same codegen'd kernel as batch) is split
    * into maxHamming+1 pigeonhole bands; state lives per (band,
    * band_val) bucket via `flatMapGroupsWithState` and holds the bucket's
    * (id, simhash) members, so a new document compares only against its
    * bucket cohort — the same candidate-pruning shape as the batch band
    * join, incrementalized. Verified pairs (true Hamming ≤ maxHamming)
    * emit in append mode as (id_a, id_b, hamming), id_a < id_b.
    *
    * Contract notes: a pair colliding in SEVERAL bands emits once per
    * colliding band (they are different state groups) — downstream
    * consumers dedup with dropDuplicates(id_a, id_b) exactly like the
    * batch candidate `distinct()`; re-delivered ids are ignored
    * (exactly-once pairs per band under at-least-once input). State is a
    * bucket's full membership — keyed by band value, it grows with the
    * corpus on the unbounded path; the batch pipeline is the
    * unbounded-lookback alternative.
    *
    * Bounded state (`ttlSeconds` > 0, requires `tsCol`): dedup-window
    * watermarking — every member carries its event time; as the
    * watermark passes a member's ts + TTL it is pruned from the bucket
    * (and an all-idle bucket's state row is dropped by the event-time
    * timeout). Re-admission semantics: a duplicate arriving more than
    * the horizon after its twin is NOT paired (the twin is evicted) —
    * the standard recall/state trade of windowed dedup. Within the
    * horizon, pairs are identical to the unbounded path. */
  def nearDupStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3,
      tsCol: String = null, ttlSeconds: Long = 0L,
      watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = maxHamming + 1
    val bandBits = 64 / bands
    val mask = (1L << bandBits) - 1
    require(ttlSeconds == 0 || tsCol != null,
      "TTL eviction needs an event-time column (tsCol)")
    val withTs = graft.dedup.Dedup.simhashTable(docs, idCol, textCol,
        carryCols = Option(tsCol).toSeq)
    val tsOut =
      if (tsCol != null) col(tsCol).as("ts")
      else lit(null).cast("timestamp").as("ts")
    val banded0 = withTs
      .select((Seq(col("id"), col("simhash")) ++
          Option(tsCol).map(col).toSeq) :+
        explode(array((0 until bands).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * bandBits)
            .bitwiseAND(lit(mask)).as("band_val"))): _*)).as("bb"): _*)
      .select(col("bb.band").as("band"), col("bb.band_val").as("band_val"),
        col("id"), col("simhash"), tsOut)
    val banded =
      (if (ttlSeconds > 0) banded0.withWatermark("ts", watermark)
       else banded0).as[NearDupBandRow]
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    banded.groupByKey(r => (r.band, r.band_val))
      .flatMapGroupsWithState[NearDupState, NearDupPair](
        OutputMode.Append(), timeout) {
        (_, batch, state: GroupState[NearDupState]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          state.remove() // whole bucket idle past the horizon
          Iterator.empty
         } else {
          val ttlMs = ttlSeconds * 1000
          val wm = if (ttlSeconds > 0) state.getCurrentWatermarkMs() else 0L
          val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
          // TTL path: prune members whose eviction time the watermark passed
          seen ++= state.getOption.map(_.docs).getOrElse(Nil)
            .filter(m => ttlSeconds == 0 || m._3 + ttlMs > wm)
          val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
          // id-sorted fold → deterministic pair emission within a batch
          batch.toSeq.sortBy(_.id).foreach { r =>
            if (!seen.exists(_._1 == r.id)) {
              seen.foreach { case (oid, osh, _) =>
                val h = java.lang.Long.bitCount(osh ^ r.simhash)
                if (h <= maxHamming)
                  out += (if (oid < r.id) NearDupPair(oid, r.id, h)
                          else NearDupPair(r.id, oid, h))
              }
              seen += ((r.id, r.simhash,
                if (r.ts == null) 0L else r.ts.getTime))
            }
          }
          if (seen.isEmpty) state.remove()
          else {
            state.update(NearDupState(seen.toList))
            if (ttlSeconds > 0)
              state.setTimeoutTimestamp(math.max(wm + 1,
                seen.map(_._3).max + ttlMs))
          }
          out.iterator
         }
      }
      .toDF()
  }

  /** One positional n-gram for the streaming span-dedup twin
    * (`ts` = the document's event time; null on the unbounded path). */
  final case class SpanShingleRow(sh: String, doc_id: Long, pos: Long,
      ts: java.sql.Timestamp = null)

  /** Per-shingle state for [[spanDupStream]]: the HELD first occurrence
    * (until a second arrives) or the dup flag once the shingle is known
    * duplicated — O(1) per distinct shingle either way (`lastTs` =
    * millis of the shingle's newest occurrence, driving the TTL
    * timeout; 0 on the unbounded path). */
  final case class SpanState(firstDoc: Long, firstPos: Long, isDup: Boolean,
      lastTs: Long = 0L)

  final case class SpanMark(doc_id: Long, pos: Long)

  /** Streaming duplicate-SPAN detection — the incremental twin of
    * [[graft.dedup.Dedup.duplicateNgramPositions]]: positional n-grams
    * key the state store by shingle; the first occurrence is held, and
    * the moment a second arrives (same batch or any later one) BOTH are
    * emitted as duplicated-position marks — after that the shingle is
    * just a flag and every further occurrence emits immediately. Each
    * (doc, pos) mark is emitted exactly once, so the accumulated output
    * equals the batch mark set (StreamingSpec, across a micro-batch
    * boundary).
    *
    * State is one record per DISTINCT shingle seen — corpus-lifetime
    * growth on the unbounded path, same trade as [[nearDupStream]]'s
    * bucket membership; the batch pipeline is the unbounded-lookback
    * alternative.
    *
    * Bounded state (`ttlSeconds` > 0, requires `tsCol`): a shingle
    * with no occurrence for `ttlSeconds` of event time drops its state
    * row (watermark-driven timeout) — a held-first's mark is lost if
    * its twin arrives after the horizon, and a dup-flagged shingle
    * re-admits one unmarked "first" occurrence post-eviction — the
    * standard recall/state trade of windowed dedup, marks never missed
    * within the horizon. */
  def spanDupStream(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 5,
      tsCol: String = null, ttlSeconds: Long = 0L,
      watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    require(ttlSeconds == 0 || tsCol != null,
      "TTL eviction needs an event-time column (tsCol)")
    val tsOut =
      if (tsCol != null) col(tsCol).as("ts")
      else lit(null).cast("timestamp").as("ts")
    val sh0 = graft.dedup.Dedup.positionalShingles(docs, idCol, textCol, n,
        carryCols = Option(tsCol).toSeq)
      .select(col("sh"), col(idCol).cast("long").as("doc_id"),
        col("pos").cast("long").as("pos"), tsOut)
    val sh =
      (if (ttlSeconds > 0) sh0.withWatermark("ts", watermark) else sh0)
        .as[SpanShingleRow]
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    sh.groupByKey(_.sh)
      .flatMapGroupsWithState[SpanState, SpanMark](
        OutputMode.Append(), timeout) {
        (_, batch, state: GroupState[SpanState]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          state.remove() // shingle idle past the horizon
          Iterator.empty
         } else {
          // (doc, pos)-sorted fold → deterministic emission within a batch
          val rows = batch.toSeq.sortBy(r => (r.doc_id, r.pos))
          val st = state.getOption
          var held: Option[(Long, Long)] =
            st.filter(!_.isDup).map(s => (s.firstDoc, s.firstPos))
          var dup = st.exists(_.isDup)
          val out = scala.collection.mutable.ListBuffer.empty[SpanMark]
          rows.foreach { r =>
            if (dup) out += SpanMark(r.doc_id, r.pos)
            else held match {
              case Some((hd, hp)) =>
                dup = true
                out += SpanMark(hd, hp)
                out += SpanMark(r.doc_id, r.pos)
                held = None
              case None => held = Some((r.doc_id, r.pos))
            }
          }
          val lastTs = (st.map(_.lastTs).getOrElse(0L) +:
            rows.map(r => if (r.ts == null) 0L else r.ts.getTime)).max
          state.update(
            if (dup) SpanState(0L, 0L, isDup = true, lastTs = lastTs)
            else held.map { case (d, p) =>
                SpanState(d, p, isDup = false, lastTs = lastTs) }
              .getOrElse(SpanState(0L, 0L, isDup = false, lastTs = lastTs)))
          if (ttlSeconds > 0)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, lastTs + ttlSeconds * 1000))
          out.iterator
         }
      }
      .toDF()
  }

  /** One document for the streaming sequence packer. */
  final case class PackDoc(shard: Long, doc_id: Long, len: Long)

  /** The OPEN bin per shard, carried across micro-batches. */
  final case class PackState(bin: Long, cum: Long)

  final case class PackOut(doc_id: Long, shard: Long, bin: Long,
      n_tokens: Long)

  /** Streaming greedy sequence packing — the incremental twin of
    * [[graft.text.Corpus.packGreedy]]: documents fill the shard's open
    * bin until the next would overflow `budget`, whereupon a fresh bin
    * opens; the open (bin, cum) pair is the ONLY state, one record per
    * shard. Same in-order contract as [[scd2Stream]]: the feed is in
    * id order per shard across batches; within a batch, documents sort
    * by id before folding. Streaming ≡ batch asserted in StreamingSpec
    * across a micro-batch boundary (the open bin must keep filling from
    * carried state, not restart).
    *
    * No TTL option ON PURPOSE: unlike the user-/entity-keyed twins,
    * state here is keyed by shard — a PINNED partition count chosen at
    * start — so total state is O(shards) by construction and never
    * grows with the stream. Evicting an idle shard's open bin would
    * only corrupt its packing (the next document would reopen bin 0)
    * for zero space win. */
  def packStream(docs: DataFrame, budget: Long, shards: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(pmod(col(idCol), lit(shards.toLong)).cast("long").as("shard"),
        col(idCol).cast("long").as("doc_id"),
        graft.text.Text.tokenCount(col(textCol)).cast("long").as("len"))
      .as[PackDoc]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, PackOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard, batch, state: GroupState[PackState]) =>
          var cur = state.getOption
          val out = batch.toSeq.sortBy(_.doc_id).map { d =>
            cur = cur match {
              case None => Some(PackState(0L, d.len))
              case Some(s) if s.cum + d.len > budget =>
                Some(PackState(s.bin + 1, d.len))
              case Some(s) => Some(PackState(s.bin, s.cum + d.len))
            }
            PackOut(d.doc_id, shard, cur.get.bin, d.len)
          }
          cur.foreach(state.update)
          out.iterator
      }
      .toDF()
  }

  /** One event for the streaming funnel tracker. */
  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  /** Per-user funnel progress in event-time micros; -1 = step not yet
    * reached. O(1) regardless of the user's event volume. */
  final case class FunnelState(sTs: Long, cTs: Long, pTs: Long)

  final case class FunnelOut(user_id: Long, step: Int,
      ts: java.sql.Timestamp)

  /** Streaming windowed-funnel twin of
    * [[graft.queries.TimelineQ.funnelWindowed]]: signup → first click
    * within `windowSec` → first purchase within `windowSec` of that
    * click, emitted as (user, step, event-time) EXACTLY ONCE as each
    * step first completes. State per user is three event-time micros —
    * O(1) however many events the user produces — so a step whose
    * qualifying event arrives in a later micro-batch than the previous
    * step still fires exactly once. Same per-key in-order contract as
    * [[transitionStream]] (within a batch rows sort by event time
    * before folding): under it, "first in order" ≡ the batch side's
    * MIN-within-window, so streamed step counts equal the batch funnel
    * (StreamingSpec). Micros precision is preserved (`getTime` ms +
    * sub-ms nanos), matching the batch side's full-timestamp
    * comparisons bit-for-bit.
    *
    * Bounded state (`ttlSeconds` > 0): keyed by user, the three-micros
    * state row otherwise lives forever per DISTINCT user — O(1) per key
    * but an unbounded key space on an infinite stream. With a TTL the
    * input is watermarked on `ts` and a user idle for `ttlSeconds` of
    * event time silently drops their funnel progress. Re-admission
    * semantics: a post-eviction signup STARTS A FRESH FUNNEL — the user
    * can re-fire steps they completed before the horizon, so distinct
    * step counts become per-horizon, not per-lifetime (pick
    * `ttlSeconds` ≥ the funnel's business lifetime, and at least
    * `2 × windowSec`, to make that unobservable in practice). A
    * half-open funnel whose next step arrives after the horizon is
    * never completed — steps don't chain across the horizon. Within
    * the horizon, output is identical to the unbounded path
    * (StreamingSpec TTL test). */
  def funnelStream(events: org.apache.spark.sql.Dataset[FunnelEvent],
      windowSec: Long, ttlSeconds: Long = 0L,
      watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val wMicros = windowSec * 1000000L
    // floorDiv so the seconds component floors for pre-epoch instants
    // (plain / truncates toward zero and would double-count sub-seconds).
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    // Same-timestamp events fold in funnel-step order (signup < click <
    // purchase) so a click at exactly the signup's ts still counts,
    // matching the batch side's ts >= s_ts MIN-within-window semantics.
    def stepOrd(e: FunnelEvent): Int = e.event_type match {
      case "signup" => 0; case "click" => 1; case "purchase" => 2; case _ => 3
    }
    val src = if (ttlSeconds > 0) events.withWatermark("ts", watermark)
              else events
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), timeout) {
        (uid, batch, state: GroupState[FunnelState]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          state.remove() // idle past the horizon: funnel progress expires
          Iterator.empty
         } else {
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
          val ordered = batch.toSeq.sortBy(e => (micros(e.ts), stepOrd(e)))
          ordered.foreach { e =>
            val t = micros(e.ts)
            e.event_type match {
              case "signup" if st.sTs < 0 =>
                st = st.copy(sTs = t)
                out += FunnelOut(uid, 1, e.ts)
              case "click" if st.sTs >= 0 && st.cTs < 0 &&
                  t >= st.sTs && t <= st.sTs + wMicros =>
                st = st.copy(cTs = t)
                out += FunnelOut(uid, 2, e.ts)
              case "purchase" if st.cTs >= 0 && st.pTs < 0 &&
                  t >= st.cTs && t <= st.cTs + wMicros =>
                st = st.copy(pTs = t)
                out += FunnelOut(uid, 3, e.ts)
              case _ => ()
            }
          }
          state.update(st)
          if (ttlSeconds > 0) {
            val lastMs = ordered.lastOption.map(_.ts.getTime)
              .getOrElse(state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, lastMs + ttlSeconds * 1000))
          }
          out.iterator
         }
      }
      .toDF()
  }

  /** One event for the streaming transition tracker (`ts` = event time,
    * required only on the TTL path; null on the unbounded path). */
  final case class SeqEvent(ent: Long, ord: Long, state: String,
      ts: java.sql.Timestamp = null)

  /** Per-entity carried state: the LAST event seen (order + state). */
  final case class SeqLast(ord: Long, state: String)

  final case class SeqPair(from_state: String, to_state: String)

  /** Streaming Markov-transition extraction — the incremental twin of
    * [[graft.etl.Sequences.transitionMatrix]]'s pair step: each entity's
    * adjacent (from, to) state pairs are emitted as events arrive, with
    * the entity's LAST seen event carried as O(1) state so a pair whose
    * two events straddle a micro-batch boundary is still produced
    * exactly once. Same in-order contract as [[scd2Stream]] /
    * [[packStream]]: per entity the feed is ordered by `ord` across
    * batches; within a batch rows sort before folding, so emission is
    * deterministic. Downstream the pair stream feeds the usual
    * update-mode count aggregate to form the live transition matrix —
    * counts, like the batch side's, never exceed |states|² rows. */
  /** Streaming twin of the `pr_content_hash` corpus fingerprint
    * ([[graft.text.ContentHash.fingerprint]]): because the fingerprint
    * is (COUNT, SUM mod 2⁶⁰) — both mergeable — the SAME kernel runs
    * unchanged as a streaming global aggregate; each micro-batch folds
    * its rows into the running state and the emitted row always equals
    * the batch fingerprint of everything ingested so far. The
    * incremental table-diff primitive: a downstream consumer compares
    * the live fingerprint against a snapshot's without rescanning
    * either side. Run in complete (or update) output mode. */
  def contentHashStream(docs: DataFrame, cols: Seq[String]): DataFrame =
    graft.text.ContentHash.fingerprint(docs, cols)

  /** Bounded state (`ttlSeconds` > 0, requires `ts` on the rows): keyed
    * by entity, the held last event otherwise lives forever per DISTINCT
    * entity. With a TTL the input is watermarked on `ts` and an entity
    * idle for `ttlSeconds` of event time drops its held event.
    * Re-admission semantics: the entity's first post-eviction event
    * emits NO pair (pairs never span the horizon — the `(pre-horizon,
    * post-horizon)` transition is deliberately uncounted, exactly like
    * a batch job scoped to the horizon window); subsequent pairs are
    * identical to the unbounded path. */
  def transitionStream(events: org.apache.spark.sql.Dataset[SeqEvent],
      ttlSeconds: Long = 0L, watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val src = if (ttlSeconds > 0) events.withWatermark("ts", watermark)
              else events
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.ent)
      .flatMapGroupsWithState[SeqLast, SeqPair](
        OutputMode.Append(), timeout) {
        (_, batch, state: GroupState[SeqLast]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          state.remove() // idle past the horizon: the held event expires
          Iterator.empty
         } else {
          var held = state.getOption
          var lastMs = 0L
          val out = batch.toSeq.sortBy(_.ord).map { r =>
            if (r.ts != null) lastMs = math.max(lastMs, r.ts.getTime)
            val pair = held.map(h => SeqPair(h.state, r.state))
            held = Some(SeqLast(r.ord, r.state))
            pair
          }.flatten
          held.foreach(state.update)
          if (ttlSeconds > 0)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, lastMs + ttlSeconds * 1000))
          out.iterator
         }
      }
      .toDF()
  }

  /** One event for the streaming attribution tracker. */
  final case class AttEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String, value: Double)

  /** One in-window touch carried per user (micros, event_id, channel). */
  final case class AttTouch(tts: Long, tid: Long, channel: String)

  /** Per-user carried state: the touches still inside any future
    * purchase's lookback window — O(touches per window) per user, pruned
    * on every event. */
  final case class AttState(touches: Seq[AttTouch])

  /** One attribution row: mirrors [[graft.etl.Attribution.touchRows]]'s
    * schema (null channel = touch-less 'direct' purchase). */
  final case class AttRow(pid: Long, cents: Long, channel: String,
      n: Long, is_first: Boolean, is_last: Boolean)

  /** Streaming multi-touch attribution — the incremental twin of
    * [[graft.etl.Attribution.touchRows]]: per user, the in-window
    * touches ride `GroupState` across micro-batches (pruned to the
    * `windowSec` horizon on every event, so state is bounded by the
    * touch rate, never the history), and each arriving purchase emits
    * its per-touch rows immediately. Same in-order contract as
    * [[funnelStream]]: per user the feed is ordered by `ts` across
    * batches; within a batch rows sort by (ts, kind, event_id) with
    * touches BEFORE purchases at equal ts — matching the batch side's
    * `tts <= pts` inclusive window — and first/last ties break by
    * (tts, tid) exactly as the batch windows do. Downstream,
    * [[graft.etl.Attribution.channelReport]] over the emitted rows is
    * the live channel report (StreamingSpec: ≡ batch across a
    * micro-batch boundary).
    *
    * Bounded state (`ttlSeconds` > 0): the touch list is already pruned
    * to `windowSec` per event, but the KEY row itself otherwise lives
    * forever per DISTINCT user. With a TTL the input is watermarked on
    * `ts` and a user idle for `ttlSeconds` of event time drops their
    * state row. Re-admission semantics: for `ttlSeconds` ≥ `windowSec`
    * (required) eviction is LOSSLESS under the per-key in-order
    * contract — every evicted touch is older than the watermark by
    * ≥ ttl ≥ windowSec, so any later purchase (ts ≥ watermark) would
    * have pruned it anyway; in-horizon output is BIT-IDENTICAL to the
    * unbounded path, making this the rare TTL with no semantic trade
    * (StreamingSpec TTL test asserts both identity and eviction). */
  def attributionStream(events: org.apache.spark.sql.Dataset[AttEvent],
      windowSec: Long = 3600L, ttlSeconds: Long = 0L,
      watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(ttlSeconds <= 0 || ttlSeconds >= windowSec,
      s"attribution TTL ($ttlSeconds s) must be >= the lookback window " +
        s"($windowSec s), or eviction could drop still-attributable touches")
    val spark = events.sparkSession
    import spark.implicits._
    val wMicros = windowSec * 1000000L
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def kindOrd(e: AttEvent): Int =
      if (e.event_type == "purchase") 1 else 0
    val src = if (ttlSeconds > 0) events.withWatermark("ts", watermark)
              else events
    val timeoutConf = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[AttState, AttRow](
        OutputMode.Append(), timeoutConf) {
        (_, batch, state: GroupState[AttState]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          // idle past the horizon: every carried touch is already
          // outside any future in-order purchase's lookback — lossless
          state.remove()
          Iterator.empty
         } else {
          var touches = state.getOption.map(_.touches.toVector)
            .getOrElse(Vector.empty[AttTouch])
          val out = scala.collection.mutable.ListBuffer.empty[AttRow]
          // batch is a one-shot iterator: materialize ONCE (the sort
          // needs it anyway); the TTL base below reuses this seq
          val ordered = batch.toSeq
            .sortBy(e => (micros(e.ts), kindOrd(e), e.event_id))
          ordered.foreach { e =>
              val t = micros(e.ts)
              touches = touches.filter(_.tts > t - wMicros)
              e.event_type match {
                case "view" | "click" | "signup" =>
                  touches :+= AttTouch(t, e.event_id, e.event_type)
                case "purchase" =>
                  val cents = math.round(e.value * 100)
                  if (touches.isEmpty)
                    out += AttRow(e.event_id, cents, null, 0L,
                      is_first = true, is_last = true)
                  else {
                    val first = touches.minBy(x => (x.tts, x.tid))
                    val last = touches.maxBy(x => (x.tts, x.tid))
                    touches.foreach { x =>
                      out += AttRow(e.event_id, cents, x.channel,
                        touches.size.toLong,
                        is_first = x.tts == first.tts && x.tid == first.tid,
                        is_last = x.tts == last.tts && x.tid == last.tid)
                    }
                  }
                case _ => ()
              }
            }
          state.update(AttState(touches))
          if (ttlSeconds > 0) {
            val lastMs = ordered.lastOption.map(_.ts.getTime)
              .getOrElse(state.getCurrentWatermarkMs())
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, lastMs + ttlSeconds * 1000))
          }
          out.iterator
         }
      }
      .toDF()
  }

  /** One token routed to an MG shard — `pk` is any deterministic
    * partition of the stream (e.g. `pmod(hash(tok), P)`); all
    * occurrences of a token need NOT share a shard for the superset
    * law, but hashing by token keeps per-shard vocabularies disjoint. */
  final case class MgTok(pk: Int, tok: String,
      ts: java.sql.Timestamp = null)

  /** Per-shard carried MG summary + how many rows it has absorbed. */
  final case class MgShardState(counts: Map[String, Long], seen: Long)

  final case class MgCand(pk: Int, tok: String, seen: Long)

  /** Streaming Misra-Gries candidate state — the incremental twin of
    * [[graft.sketch.Sketch.mgCandidates]] (VERDICT r8 item 3): each
    * shard `pk` folds its tokens into an O(k) MG(k) summary carried in
    * `GroupState` across micro-batches, and after every batch re-emits
    * its current ≤ k survivors stamped with `seen` (rows absorbed so
    * far) — update semantics, so a shard's LATEST emission (max `seen`)
    * is its live candidate set. The classic MG guarantee is
    * ORDER-INDEPENDENT, so it holds across any micro-batch arrival
    * order: a key with global count > n/(k+1) exceeds the fraction in
    * at least one shard and MG(k) never evicts a key above
    * n_pk/(k+1) there — the streamed candidate union is a provable
    * superset of the true heavy hitters of everything seen, exactly
    * like the batch per-partition pass (SketchSpec's superset law,
    * re-asserted across a micro-batch boundary in StreamingSpec).
    * Downstream, the same recount-and-gate join as
    * [[graft.sketch.Sketch.heavyHitters]] turns candidates into EXACT
    * heavy hitters — the candidate set changes cost, never results.
    * State is O(k) per shard; nothing grows with the stream — shard
    * keys are a PINNED partition count, so unlike the attribute-keyed
    * twins this state is bounded even without a TTL.
    *
    * Horizon reset (`ttlSeconds` > 0, requires `ts` on the rows): a
    * shard idle for `ttlSeconds` of event time (watermark-driven)
    * drops its summary and `seen` restarts at 0 on the next
    * occurrence. MG's superset law is prefix-free — it holds for any
    * row multiset folded from empty — so post-reset emissions are the
    * provable candidate superset OF THE ROWS SINCE THE RESET: the
    * horizon-scoped heavy-hitter mode, trading lookback for the
    * guarantee that an abandoned shard's state row disappears. */
  def mgCandidateStream(toks: org.apache.spark.sql.Dataset[MgTok],
      k: Int, ttlSeconds: Long = 0L,
      watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 1, s"need k >= 1, got $k")
    val spark = toks.sparkSession
    import spark.implicits._
    val src = if (ttlSeconds > 0) toks.withWatermark("ts", watermark)
              else toks
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.pk)
      .flatMapGroupsWithState[MgShardState, MgCand](
        OutputMode.Update(), timeout) {
        (pk, batch, state: GroupState[MgShardState]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          state.remove() // shard idle past the horizon
          Iterator.empty
         } else {
          val prior = state.getOption.getOrElse(MgShardState(Map.empty, 0L))
          val counts = scala.collection.mutable.HashMap.from(prior.counts)
          var seen = prior.seen
          var lastTsMs = 0L
          batch.foreach { t =>
            seen += 1L
            if (t.ts != null) lastTsMs = math.max(lastTsMs, t.ts.getTime)
            val s = t.tok
            if (counts.contains(s)) counts(s) += 1L
            else if (counts.size < k) counts(s) = 1L
            else {
              // same in-place bulk decrement as the batch kernel
              counts.mapValuesInPlace((_, c) => c - 1L)
              counts.filterInPlace((_, c) => c > 0L)
            }
          }
          state.update(MgShardState(counts.toMap, seen))
          if (ttlSeconds > 0)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              lastTsMs + ttlSeconds * 1000))
          val snap = seen
          counts.keysIterator.map(MgCand(pk, _, snap)).toList.iterator
         }
      }
      .toDF()
  }

  /** One pre-hashed value routed to a KMV shard — `h` is the house
    * 60-bit md5 hash computed RELATIONALLY upstream (the
    * [[graft.sketch.Sketch.kmvSketch]] kernel:
    * `conv(substring(md5(tok), 1, 15), 16, 10)`), so the stateful op
    * never re-implements the hash. */
  final case class KmvTok(pk: Int, h: Long,
      ts: java.sql.Timestamp = null)

  /** Per-shard carried bottom-k set + rows absorbed. */
  final case class KmvShardState(bottom: List[Long], seen: Long)

  final case class KmvOut(pk: Int, h: Long, seen: Long)

  /** Streaming KMV bottom-k state — the incremental twin of
    * [[graft.sketch.Sketch.kmvSketch]], the [[mgCandidateStream]]
    * pattern applied to the distinct-count sketch: each shard folds its
    * hashes into an O(k) bounded TreeSet carried in `GroupState` across
    * micro-batches and re-emits its current ≤ k smallest distinct
    * hashes stamped with `seen` (update semantics — a shard's latest
    * emission is its live sketch). Bottom-k is ORDER-INDEPENDENT, so
    * the containment law survives any arrival order: a hash among the
    * k smallest distinct globally is among the k smallest of its own
    * shard, hence the union of live shard sketches re-limited to k IS
    * the batch sketch of everything seen, bit for bit (StreamingSpec
    * asserts streaming ≡ batch across a micro-batch boundary). State
    * is O(k) per shard; nothing grows with the stream — shard keys are
    * a PINNED partition count, bounded even without a TTL.
    *
    * Horizon reset (`ttlSeconds` > 0, requires `ts` on the rows): the
    * [[mgCandidateStream]] semantics — an idle shard's sketch drops
    * after the horizon and rebuilds from empty; bottom-k containment
    * is likewise prefix-free, so post-reset emissions are the exact
    * KMV sketch of the rows since the reset. */
  def kmvStream(toks: org.apache.spark.sql.Dataset[KmvTok],
      k: Int, ttlSeconds: Long = 0L,
      watermark: String = "0 seconds"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 2, s"need k >= 2, got $k")
    val spark = toks.sparkSession
    import spark.implicits._
    val src = if (ttlSeconds > 0) toks.withWatermark("ts", watermark)
              else toks
    val timeout = if (ttlSeconds > 0) GroupStateTimeout.EventTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    src.groupByKey(_.pk)
      .flatMapGroupsWithState[KmvShardState, KmvOut](
        OutputMode.Update(), timeout) {
        (pk, batch, state: GroupState[KmvShardState]) =>
         if (batch.isEmpty && state.hasTimedOut) {
          state.remove() // shard idle past the horizon
          Iterator.empty
         } else {
          val prior = state.getOption.getOrElse(KmvShardState(Nil, 0L))
          val set = new java.util.TreeSet[java.lang.Long]()
          prior.bottom.foreach(h => set.add(java.lang.Long.valueOf(h)))
          var seen = prior.seen
          var lastTsMs = 0L
          batch.foreach { t =>
            seen += 1L
            if (t.ts != null) lastTsMs = math.max(lastTsMs, t.ts.getTime)
            val boxed = java.lang.Long.valueOf(t.h)
            if (set.size < k) set.add(boxed)
            else if (t.h < set.last() && set.add(boxed)) set.pollLast()
          }
          import scala.jdk.CollectionConverters._
          val bottom = set.iterator().asScala.map(Long.unbox).toList
          state.update(KmvShardState(bottom, seen))
          if (ttlSeconds > 0) {
            val lastMs = lastTsMs
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1, lastMs + ttlSeconds * 1000))
          }
          val snap = seen
          bottom.map(KmvOut(pk, _, snap)).iterator
         }
      }
      .toDF()
  }

  /** Streaming pivot — the incremental twin of the batch `pv_daily`
    * query: wide per-group counts over a PINNED value set.
    *
    * Spark disallows `pivot` on a streaming Dataset, but a pinned-value
    * pivot IS conditional aggregation — one `count(value = v)` per
    * pinned v — which streams natively on the engine's incremental
    * aggregate state: no hand-rolled flatMapGroupsWithState value-list
    * state to schema-version, and map-side partial aggregation keeps the
    * shuffle at |groups| rows exactly like the batch plan. Pinning is
    * also the scale requirement the batch side already documents: a
    * dynamic pivot needs an extra full pass to discover columns and
    * yields a nondeterministic schema — on a stream it is impossible,
    * since new columns cannot be added to past results. Run with
    * complete/update output (or add a watermark on the group column for
    * append). */
  def pivotStream(events: DataFrame, groupCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, pinned: Seq[String],
      groupAlias: String = "day"): DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = pinned.map(v =>
      count(when(valueCol === v, 1)).as(v))
    events.groupBy(groupCol.as(groupAlias))
      .agg(counts.head, counts.tail: _*)
  }

  /** S10 — streaming upsert sink via foreachBatch (reference
    * `write_stream_upsert`, `writers.py:78-132`: MERGE INTO per batch).
    * Each micro-batch is upserted into the target keyed on `keys` with
    * latest-wins semantics ([[Sinks.upsertByKey]] — the Delta-less MERGE).
    * Late/duplicate data is thereby deduplicated per key exactly like the
    * reference's MERGE strategy (README.md:433-439). */
  def writeStreamUpsert(df: DataFrame, targetPath: String, checkpoint: String,
      keys: Seq[String], queryName: String = "upsert",
      trig: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode("update")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trig)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsertByKey(batch.sparkSession, batch, targetPath, keys)
      }
      .start()

  /** S10 on the merge-on-read path: streaming upsert via
    * [[Sinks.upsertByKeyDv]] — each micro-batch commits NEW small files
    * + deletion-vector actions instead of rewriting touched files, so
    * per-batch sink cost is ∝ batch size at ANY table footprint (the
    * property a continuous ingest needs; the eager
    * [[writeStreamUpsert]] degrades as the target grows). Within-batch
    * duplicates collapse latest-wins on `orderCol` first (the DV
    * commit's key-unique precondition); run [[Sinks.optimizeTable]] on
    * a maintenance cadence to fold the accumulated DVs, exactly like
    * Delta streaming MERGE + scheduled REORG. */
  def writeStreamUpsertDv(df: DataFrame, targetPath: String,
      checkpoint: String, keyCol: String, orderCol: String,
      queryName: String = "upsert_dv",
      trig: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode("update")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trig)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        val unique = graft.etl.Cleaning.latestByKey(
          Seq(keyCol), Seq(col(orderCol)))(batch)
        Sinks.upsertByKeyDv(batch.sparkSession, unique, targetPath, keyCol,
          nFiles = 1)
      }
      .start()

  /** [[writeStreamUpsert]] with the partition-scoped merge
    * ([[Sinks.upsertByKeyPartitioned]]): each micro-batch rewrites only
    * the partitions it touches — the streaming cost model users of a
    * Delta MERGE sink expect. `partitionCol` must be one of `keys`
    * (enforced by the sink). */
  def writeStreamUpsertPartitioned(df: DataFrame, targetPath: String,
      checkpoint: String, keys: Seq[String], partitionCol: String,
      queryName: String = "upsert_part",
      trig: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode("update")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trig)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsertByKeyPartitioned(batch.sparkSession, batch, targetPath,
          keys, partitionCol)
      }
      .start()

  /** [[writeStreamUpsert]] into a VERSIONED manifest table
    * ([[Sinks.upsertByKeyManifest]]): each micro-batch rewrites only the
    * files whose key range it hits and commits one manifest version, so
    * the stream leaves behind a time-travelable history — version N is
    * the table as of micro-batch N — and a [[Sinks.vacuum]] retention
    * pass bounds it, mirroring a Delta streaming MERGE sink end to end. */
  def writeStreamUpsertManifest(df: DataFrame, targetPath: String,
      checkpoint: String, keyCol: String,
      queryName: String = "upsert_manifest",
      trig: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .outputMode("update")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trig)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.upsertByKeyManifest(batch.sparkSession, batch, targetPath, keyCol)
      }
      .start()

  /** One event for the streaming islands tracker. */
  final case class IslEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Per-user open-island state: start day, last day, length (epoch
    * days) — O(1) per user regardless of history. */
  final case class IslState(startDay: Long, lastDay: Long, len: Long)

  /** One CLOSED island: a maximal consecutive-day run that a later,
    * non-adjacent day has sealed. */
  final case class IslRow(user_id: Long, start_day: Long, streak_len: Long)

  /** Streaming gaps-and-islands — the incremental twin of `e_islands`'
    * anchor algebra: per user, the single open island rides
    * `GroupState` (start/last/len — O(1) state, never the day
    * history), and a non-adjacent arriving day CLOSES it, emitting the
    * finished streak exactly once. Same in-order contract as
    * [[transitionStream]] (per user the feed is ts-ordered across
    * batches); duplicate days inside or across batches are absorbed by
    * the `d == lastDay` case, exactly like the batch side's distinct.
    * The still-open island per user is intentionally unemitted — it
    * can't be final until a gap or the stream's end (StreamingSpec
    * asserts closed islands ≡ batch islands minus each user's last). */
  def islandsStream(events: org.apache.spark.sql.Dataset[IslEvent]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[IslState, IslRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, batch, state: GroupState[IslState]) =>
          // floorDiv: pre-epoch timestamps floor to the correct UTC day
          val days = batch
            .map(e => Math.floorDiv(e.ts.getTime, 86400000L))
            .toSeq.distinct.sorted
          var st = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[IslRow]
          days.foreach { d =>
            st match {
              case None =>
                st = Some(IslState(d, d, 1L))
              case Some(s) if d == s.lastDay => ()
              case Some(s) if d == s.lastDay + 1 =>
                st = Some(s.copy(lastDay = d, len = s.len + 1))
              case Some(s) =>
                out += IslRow(uid, s.startDay, s.len)
                st = Some(IslState(d, d, 1L))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
      .toDF()
  }
}
