package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.operators.{AsOf, RangeJoin}

/** As-of / range-join semantics on hand-built frames (edge cases the
  * oracle queries can't isolate: equal timestamps, no-match rows,
  * duplicate-ts tie-breaks), plus plan-shape checks for the OLAP
  * grouping queries (one Expand, one shuffle).
  */
class OperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-operators-test")

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def leftDf = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 102L) // before any right row
    ).toDF("user_id", "ts", "lid")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 200L, 5.0),  // equal-ts: inclusive
      (1L, ts("2024-01-01 11:30:00"), 201L, 6.0),
      (2L, ts("2024-01-01 09:30:00"), 202L, 7.0)
    ).toDF("user_id", "ts", "rid", "rval")
  }

  test("backward as-of: inclusive at equal ts, null when no prior row") {
    val out = AsOf.backward(leftDf, rightDf, Seq("user_id"), "ts",
        payload = Seq("rid", "rval"), tieBreak = Seq("rid"))
      .orderBy("lid")
      .select("lid", "rid", "rval")
      .collect()
    // lid=100 at 10:00 matches rid=200 at exactly 10:00 (>= semantics)
    assert(out(0).getLong(0) == 100L && out(0).getLong(1) == 200L)
    // lid=101 at 12:00 matches the latest prior, rid=201 at 11:30
    assert(out(1).getLong(0) == 101L && out(1).getLong(1) == 201L)
    // lid=102 at 09:00 precedes every right row for user 2 → nulls
    assert(out(2).getLong(0) == 102L && out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("forward as-of: earliest at-or-after, null when no later row") {
    val out = AsOf.forward(leftDf, rightDf, Seq("user_id"), "ts",
        payload = Seq("rid"), tieBreak = Seq("rid"))
      .orderBy("lid")
      .select("lid", "rid")
      .collect()
    assert(out(0).getLong(0) == 100L && out(0).getLong(1) == 200L) // equal ts
    assert(out(1).getLong(0) == 101L && out(1).isNullAt(1)) // nothing after 12:00
    assert(out(2).getLong(0) == 102L && out(2).getLong(1) == 202L)
  }

  test("backward as-of tie-break on duplicate right ts is deterministic") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L),
      (1L, ts("2024-01-01 09:00:00"), 9L),
      (1L, ts("2024-01-01 09:00:00"), 8L)
    ).toDF("user_id", "ts", "rid")
    val out = AsOf.backward(l, r, Seq("user_id"), "ts",
      payload = Seq("rid"), tieBreak = Seq("rid")).select("rid").collect()
    assert(out.head.getLong(0) == 9L, "max tie-break column wins")
  }

  test("forward as-of tie-break on duplicate right ts is deterministic") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 11:00:00"), 7L),
      (1L, ts("2024-01-01 11:00:00"), 9L),
      (1L, ts("2024-01-01 11:00:00"), 8L)
    ).toDF("user_id", "ts", "rid")
    val out = AsOf.forward(l, r, Seq("user_id"), "ts",
      payload = Seq("rid"), tieBreak = Seq("rid")).select("rid").collect()
    assert(out.head.getLong(0) == 9L,
      "max tie-break column wins in the forward direction too")
  }

  test("nearest as-of: closer side wins, ties go backward, one-sided rows fall through") {
    import spark.implicits._
    val l = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L), // b at 09:59, f at 10:02 → b
      (1L, ts("2024-01-01 11:00:00"), 2L), // b at 10:02 (58m), f at 11:30 (30m) → f
      (2L, ts("2024-01-01 10:00:00"), 3L), // b at 09:00, f at 11:00 — EQUAL → b
      (3L, ts("2024-01-01 10:00:00"), 4L), // only a later row → f
      (4L, ts("2024-01-01 10:00:00"), 5L)  // no right rows at all → null
    ).toDF("user_id", "ts", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 09:59:00"), 10L),
      (1L, ts("2024-01-01 10:02:00"), 11L),
      (1L, ts("2024-01-01 11:30:00"), 12L),
      (2L, ts("2024-01-01 09:00:00"), 13L),
      (2L, ts("2024-01-01 11:00:00"), 14L),
      (3L, ts("2024-01-01 12:00:00"), 15L)
    ).toDF("user_id", "ts", "rid")
    val out = AsOf.nearest(l, r, Seq("user_id"), "ts",
        payload = Seq("rid"), tieBreak = Seq("rid"))
      .orderBy("lid").select("lid", "rid").collect()
    assert(out(0).getLong(1) == 10L, "backward 1m beats forward 2m")
    assert(out(1).getLong(1) == 12L, "forward 30m beats backward 58m")
    assert(out(2).getLong(1) == 13L, "equal distance resolves backward")
    assert(out(3).getLong(1) == 15L, "forward-only row still matches")
    assert(out(4).isNullAt(1), "no candidates on either side → null payload")
  }

  test("nearest as-of: a right row exactly at the left ts wins as backward") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (1L, ts("2024-01-01 10:00:01"), 8L)
    ).toDF("user_id", "ts", "rid")
    val out = AsOf.nearest(l, r, Seq("user_id"), "ts",
      payload = Seq("rid"), tieBreak = Seq("rid")).select("rid").collect()
    assert(out.head.getLong(0) == 7L,
      "distance 0 on the backward side beats any forward candidate")
  }

  test("as-of join shuffles once on the key (no nested loop, no broadcast of big side)") {
    val plan = AsOf.backward(leftDf, rightDf, Seq("user_id"), "ts",
      payload = Seq("rid")).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"as-of must not nested-loop:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly one key shuffle, got $shuffles:\n$plan")
  }

  test("bucketed range join equals the naive range predicate") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val r = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    val bucketed = RangeJoin.precedingWithin(l, r, Seq("user_id"), "ts",
        payload = Seq("view_id"), windowSec = 3600)
      .select("purchase_id", "view_id")
    val naive = l.join(r.withColumnRenamed("ts", "rts"), Seq("user_id"))
      .filter(col("rts") >= col("ts") - expr("INTERVAL 3600 SECONDS") &&
        col("rts") < col("ts"))
      .select("purchase_id", "view_id")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "bucketed range join must emit exactly the naive join's pairs")
  }

  test("forward bucketed range join equals the naive range predicate") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val l = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val bucketed = RangeJoin.followingWithin(l, r, Seq("user_id"), "ts",
        payload = Seq("click_id"), windowSec = 3600)
      .select("signup_id", "click_id")
    val naive = l.join(r.withColumnRenamed("ts", "rts"), Seq("user_id"))
      .filter(col("rts") <= col("ts") + expr("INTERVAL 3600 SECONDS") &&
        col("rts") > col("ts"))
      .select("signup_id", "click_id")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty,
      "forward bucketed range join must emit exactly the naive join's pairs")
  }

  test("rollup/cube run as one Expand + one aggregate exchange") {
    val plan = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup should use Expand:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1,
      s"rollup must be one shuffle (partial agg below it), got $shuffles:\n$plan")
    assert(plan.contains("HashAggregate"), "partial/final hash aggregation expected")
  }

  test("approx percentile tracks exact percentile within 5% at sf0.001") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"))
      .collect().head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx median $approx drifted >5% from exact $exact")
  }

  test("k-means training monotonically decreases total distortion") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def distortion(iters: Int): Long =
      graft.sim.KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = iters)
        .agg(org.apache.spark.sql.functions.sum("d2")).head().getLong(0)
    val d0 = distortion(0) // seed codebook (vectors 0..3)
    val d1 = distortion(1)
    val d2 = distortion(2)
    assert(d1 <= d0 && d2 <= d1,
      s"Lloyd iterations must not increase total distortion: $d0 -> $d1 -> $d2")
    assert(d1 < d0, "one training round should actually improve the seed codebook")
  }

  test("connectedComponents closes chains transitively and labels with the min id") {
    import spark.implicits._
    // 1-2-3 is a chain (1 and 3 never paired directly); 10-11 separate.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("pageRank: hub outranks leaves; mass identities hold on a star graph") {
    import spark.implicits._
    // undirected star: hub 0 <-> leaves 1..5
    val pairs = (1L to 5L).map(l => (0L, l))
    val edges = pairs.toDF("src", "dst")
      .union(pairs.map(_.swap).toDF("src", "dst"))
    val out = graft.graph.Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 6)
    val leaves = (1L to 5L).map(out)
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
    assert(out(0L) > leaves.head, "the hub must outrank leaves")
    // exact replay of the integer recurrence: every leaf's contribution
    // is score div 1, the hub's spreads div 5
    var (hub, leaf) = (1000000L, 1000000L)
    for (_ <- 1 to 3) {
      val nh = 150000L + (85L * leaf * 5L) / 100L
      val nl = 150000L + (85L * (hub / 5L)) / 100L
      hub = nh; leaf = nl
    }
    assert(out(0L) == hub && leaves.head == leaf,
      s"fixed-point recurrence drifted: got ${out(0L)}/${leaves.head}, want $hub/$leaf")
  }

  test("pageRank dangling redistribution conserves the pooled mass on directed graphs") {
    import spark.implicits._
    // directed star: hub 0 -> leaves 1..5; leaves dangle (no out-edges)
    val edges = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    val leak = graft.graph.Graph.pageRank(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val redist = graft.graph.Graph.pageRank(edges, iters = 2,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(redist.values.sum > leak.values.sum,
      "redistribution must retain mass the leaking variant loses")
    // exact replay of the corrected recurrence
    var (hub, leaf) = (1000000L, 1000000L)
    for (_ <- 1 to 2) {
      val share = (5L * leaf) / 6L
      val nh = 150000L + (85L * share) / 100L
      val nl = 150000L + (85L * (hub / 5L + share)) / 100L
      hub = nh; leaf = nl
    }
    assert(redist(0L) == hub && (1L to 5L).forall(redist(_) == leaf),
      s"corrected recurrence drifted: got ${redist(0L)}/${redist(1L)}, want $hub/$leaf")
    // on a dangling-free (symmetric) graph the flag is a no-op
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val a = graft.graph.Graph.pageRank(sym, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.graph.Graph.pageRank(sym, 2, redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "redistribution must be identity when nothing dangles")
  }

  test("pageRankUntil: stops at the L1-delta threshold and equals fixed-iters at that round") {
    import spark.implicits._
    val pairs = (1L to 5L).map(l => (0L, l))
    val edges = pairs.toDF("src", "dst")
      .union(pairs.map(_.swap).toDF("src", "dst"))
    val (scores, rounds) = graft.graph.Graph.pageRankUntil(
      edges, eps = 40000L, maxIters = 50)
    assert(rounds > 1 && rounds < 50,
      s"expected genuine convergence inside the budget, stopped at $rounds")
    val fixed = graft.graph.Graph.pageRank(edges, iters = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = scores.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == fixed,
      "convergence-terminated scores must equal the fixed-iters run at the stopping round")
    // the stopping rule is tight: one round earlier the delta was still >= eps
    val prev = graft.graph.Graph.pageRank(edges, iters = rounds - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastDelta = got.map { case (n, s) => math.abs(s - prev(n)) }.sum
    assert(lastDelta < 40000L, s"final delta $lastDelta must be under eps")
    // maxIters caps a loose eps; the dangling-corrected path converges too
    val (_, capped) = graft.graph.Graph.pageRankUntil(edges, eps = 0L, maxIters = 3)
    assert(capped == 3, "eps=0 must run exactly maxIters rounds")
    val directed = (1L to 5L).map(l => (0L, l)).toDF("src", "dst")
    val (ds, dr) = graft.graph.Graph.pageRankUntil(directed, eps = 40000L,
      maxIters = 50, redistributeDangling = true)
    val dFixed = graft.graph.Graph.pageRank(directed, iters = dr,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ds.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == dFixed,
      "corrected-path convergence must equal its fixed-iters twin")
  }

  test("pageRankUntil warm start: converged seed stops in one round; new/stale nodes handled") {
    import spark.implicits._
    val pairs = (1L to 5L).map(l => (0L, l))
    val edges = pairs.toDF("src", "dst")
      .union(pairs.map(_.swap).toDF("src", "dst"))
    val (cold, coldRounds) = graft.graph.Graph.pageRankUntil(
      edges, eps = 40000L, maxIters = 50)
    assert(coldRounds > 1, "cold start must need several rounds here")
    // seeding from the converged scores crosses the eps gate immediately
    val (warm, warmRounds) = graft.graph.Graph.pageRankUntil(
      edges, eps = 40000L, maxIters = 50, warmStart = Some(cold))
    assert(warmRounds == 1,
      s"warm start from the fixed point must stop at the first delta check, ran $warmRounds")
    val coldMap = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val warmMap = warm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one extra step from (near) the fixed point stays within eps of it
    assert(warmMap.keySet == coldMap.keySet &&
      warmMap.map { case (n, s) => math.abs(s - coldMap(n)) }.sum < 40000L,
      "warm-started scores must stay within eps of the converged seed")
    // a prior run over a DIFFERENT graph: node 6 is new (enters cold at
    // 10^6), node 99 is stale (dropped by the node-table join)
    val grown = edges.union(Seq((0L, 6L), (6L, 0L)).toDF("src", "dst"))
    val stalePrev = cold.union(Seq((99L, 123L)).toDF("node", "score"))
    val (g, _) = graft.graph.Graph.pageRankUntil(
      grown, eps = 40000L, maxIters = 50, warmStart = Some(stalePrev))
    val gMap = g.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gMap.keySet == (0L to 6L).toSet, "stale node must be dropped, new node present")
    // warm start changes the path, never the destination: same graph run
    // cold to a tight eps agrees on every score to within that eps
    val (gc, _) = graft.graph.Graph.pageRankUntil(grown, eps = 1000L, maxIters = 100)
    val gcMap = gc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drift = gMap.map { case (n, s) => math.abs(s - gcMap(n)) }.max
    assert(drift <= 40000L, s"warm and cold fixed points must agree (max drift $drift)")
  }

  test("triangleCounts: exact per-node counts; orientation dedups; pendants drop out") {
    import spark.implicits._
    // K4 on {1,2,3,4} + pendant 5-1 + disconnected path 10-11-12.
    // Every K4 node closes C(3,2)=3 triangles; nothing else closes any.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq((5L, 1L), (10L, 11L), (11L, 12L)))
      .toDF("src", "dst")
    val got = graft.graph.Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 per-node counts drifted: $got")
    // duplicate + reversed edges must not inflate counts (canonical dedup)
    val noisy = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val got2 = graft.graph.Graph.triangleCounts(noisy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got, "orientation must count each triangle exactly once")
    // loud failure when an id overflows the (deg, id) composite order key
    val big = Seq((1L << 33, 1L), (1L, 2L), (2L, 1L << 33)).toDF("src", "dst")
    val e = intercept[Exception] {
      graft.graph.Graph.triangleCounts(big).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("2^32"),
      s"expected the order-key overflow guard, got: ${e.getMessage}")
  }

  test("labelPropagate: clique collapses to one label; sync bipartite oscillation is exact") {
    import spark.implicits._
    // triangle {1,2,3} (both directions) + disconnected pair {10,11}
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
    val edges = und.toDF("src", "dst")
      .union(und.map(_.swap).toDF("src", "dst"))
    // hand replay of the synchronous (count desc, label asc) rule:
    // round 1: 1←min(2,3)=2, 2←min(1,3)=1, 3←min(1,2)=1, 10↔11 swap
    // round 2: 1←mode(1,1)=1, 2←min(2,1)=1, 3←min(2,1)=1, 10↔11 swap back
    val r1 = graft.graph.Graph.labelPropagate(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 10L -> 11L, 11L -> 10L),
      s"round-1 sync labels drifted: $r1")
    val r2 = graft.graph.Graph.labelPropagate(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 11L),
      s"round-2 sync labels drifted: $r2")
  }

  test("cusumUpper: closed form equals the max(0, ...) recurrence; level shift alarms") {
    import spark.implicits._
    // flat at 100 for 10 periods, then a +30 level shift
    val xs = (Seq.fill(10)(100L) ++ Seq.fill(5)(130L)).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }
    val out = graft.etl.Drift.cusumUpper(xs.toDF("t", "x"), "t", "x",
        ref = 100L, slack = 5L, h = 40L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).sortBy(_._1)
    // direct replay of S_t = max(0, S_{t-1} + x - ref - slack)
    var s = 0L
    val want = xs.map { case (t, x) =>
      s = math.max(0L, s + x - 100L - 5L); (t, s, if (s > 40L) 1 else 0)
    }
    assert(out.toSeq == want,
      s"closed form diverged from the recurrence: $out vs $want")
    assert(out.take(10).forall(_._3 == 0) && out.last._3 == 1,
      "alarm must stay quiet pre-shift and fire after the level shift")
  }

  test("categoryDrift: shifted-mix period alarms; absent category still contributes") {
    import spark.implicits._
    // p1/p2: 50/50 a-b mix; p3: all-a (and never sees b)
    val rows = Seq.fill(50)(("p1", "a")) ++ Seq.fill(50)(("p1", "b")) ++
      Seq.fill(50)(("p2", "a")) ++ Seq.fill(50)(("p2", "b")) ++
      Seq.fill(100)(("p3", "a"))
    val got = graft.etl.Drift.categoryDrift(rows.toDF("p", "cat"), "p", "cat",
        thresholdBp = 1000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // global: a = 200/300 = 6666bp, b = 3333bp
    // p1/p2: |5000-6666| + |5000-3333| = 3333bp; p3: |10000-6666| + |0-3333| = 6667bp
    assert(got("p1") == ((3333L, 1)) && got("p2") == ((3333L, 1)),
      s"balanced periods drifted wrong: $got")
    assert(got("p3") == ((6667L, 1)),
      "the all-a period must count the ABSENT b's global share in its L1")
  }

  test("bfsHops: exact hop distances on a path + branch; unreached absent; min wins") {
    import spark.implicits._
    // path 1→2→3→4 with shortcut 1→3, plus island 9→10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L))
      .toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val got = graft.graph.Graph.bfsHops(edges, src, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut must win: dist(3) = 1 (not 2); dist(4) = 2 via the shortcut
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      s"hop distances drifted: $got")
    // fewer rounds truncate the frontier, never mis-label reached nodes
    val r1 = graft.graph.Graph.bfsHops(edges, src, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("kCore: fixed peels match the converged core; tail peels away, clique survives") {
    import spark.implicits._
    // K5 clique {1..5} + a tail 5-6-7 hanging off it
    val k5 = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val edges = (k5 ++ Seq((5L, 6L), (6L, 7L))).toDF("src", "dst")
    val (core, rounds) = graft.graph.Graph.kCore(edges, k = 3, maxRounds = 10)
    val nodes = core.select(col("a")).union(core.select(col("b")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(nodes == Set(1L, 2L, 3L, 4L, 5L),
      s"the 3-core of K5+tail is K5, got $nodes")
    assert(rounds >= 1 && rounds < 10, s"peeling must converge, ran $rounds")
    // the fixed-rounds (oracle) form at the convergence round is identical
    val fixedE = graft.graph.Graph.kCoreRounds(edges, k = 3, rounds = rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val convE = core.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixedE == convE, "kCoreRounds at the stopping round must equal kCore")
    // a k above the max clique degree empties the graph
    assert(graft.graph.Graph.kCore(edges, k = 5, maxRounds = 10)._1.count() == 0L)
  }

  test("sssp: min path weight wins over hop count; parallel edges collapse to min; rounds truncate") {
    import spark.implicits._
    // 1→2→3 cost 1+1=2 beats the direct 1→3 cost 10; parallel 1→2 edges
    // (5 and 1) must collapse to 1; island 9→10 unreached from 1
    val edges = Seq((1L, 2L, 5L), (1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 10L),
      (9L, 10L, 1L)).toDF("src", "dst", "w")
    val src = Seq(1L).toDF("node")
    val got = graft.graph.Graph.sssp(edges, src, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L),
      s"shortest path weights drifted: $got")
    // one round can only see direct edges: 3 still reads the direct cost
    val r1 = graft.graph.Graph.sssp(edges, src, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L, 3L -> 10L),
      s"round-1 must be direct-edge relaxation only: $r1")
  }

  test("transitionMatrix: known chains count pairs; p_bp floors; tie-break totalizes order") {
    import spark.implicits._
    // user 1: a→b→a→b ; user 2: a→b→c — pairs: a→b ×3, b→a ×1, b→c ×1
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
      .toDF("uid", "seq", "state")
    val got = graft.etl.Sequences.transitionMatrix(ev, "uid", Seq("seq"), "state")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(("a", "b") -> ((3L, 10000L)),
      ("b", "a") -> ((1L, 5000L)), ("b", "c") -> ((1L, 5000L))),
      s"transition matrix drifted: $got")
    // per-from basis points sum to exactly 10000 here (no floor loss at /2)
    assert(got.collect { case ((f, _), (_, p)) if f == "b" => p }.sum == 10000L)
  }

  test("sweepConcurrency: half-open intervals; overlaps stack; end day releases") {
    import spark.implicits._
    val iv = Seq(("2024-01-01", "2024-01-03"), ("2024-01-02", "2024-01-04"),
      ("2024-01-02", "2024-01-02"))  // empty half-open interval: +1−1 same day
      .toDF("s", "e")
      .select(col("s").cast("timestamp"), col("e").cast("timestamp"))
    val got = graft.etl.Sequences.sweepConcurrency(iv, "s", "e")
      .collect().map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // Jan1: +1 → 1 active; Jan2: +2−1 → 2 active (the empty interval nets
    // zero); Jan3: −1 → 1; Jan4: −1 → 0
    assert(got == Map("2024-01-01" -> ((1L, 1L)), "2024-01-02" -> ((1L, 2L)),
      "2024-01-03" -> ((-1L, 1L)), "2024-01-04" -> ((-1L, 0L))),
      s"sweep profile drifted: $got")
  }

  test("sampleUniform: nested samples; partitioning-independent; matches the md5 order") {
    import spark.implicits._
    val df = (1L to 200L).toDF("id")
    val k10 = graft.text.Corpus.sampleUniform(df, "id", 10)
      .collect().map(_.getLong(0)).toSet
    val k5 = graft.text.Corpus.sampleUniform(df, "id", 5)
      .collect().map(_.getLong(0)).toSet
    assert(k5.subsetOf(k10), "growing k must keep the smaller sample as a prefix")
    // repartitioning must not change the pick (the no-RNG guarantee)
    val k10r = graft.text.Corpus.sampleUniform(df.repartition(13), "id", 10)
      .collect().map(_.getLong(0)).toSet
    assert(k10r == k10, "sample must be partitioning-independent")
    // and it IS the brute-force smallest-(md5, id) set
    val brute = df.select(col("id"), md5(col("id").cast("string")).as("h"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .sorted.take(10).map(_._2).toSet
    assert(k10 == brute, "sample must equal the md5-order top-k")
  }

  test("perceptron: separable fixture converges to 0 errors; classify agrees; log replays") {
    import spark.implicits._
    // y = +1 iff x1 > x2 — linearly separable by w = (0, 1, -1) scaled
    val f = (for (a <- 1L to 10L; b <- 1L to 10L if a != b)
      yield (if (a > b) 1L else -1L, 1L, a, b))
      .toDF("y", "x0", "x1", "x2")
    val log = graft.ml.Perceptron
      .trainBatch(f, Seq("x0", "x1", "x2"), "y", rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(log.last._2 == 0L,
      s"separable data must converge, final errors ${log.last._2}")
    // round 1 starts from w=0: every row misclassified, first update is
    // the class-difference vector (hand-replayed)
    assert(log.head._2 == f.count())
    val s = f.select(sum(col("y") * col("x0")), sum(col("y") * col("x1")),
      sum(col("y") * col("x2"))).head()
    assert(log.head._3 == Seq(s.getLong(0), s.getLong(1), s.getLong(2)),
      "round-1 update must be the class-difference vector")
    // the converged weights classify every training row correctly
    val wFinal = log.last._3
    val miss = graft.ml.Perceptron
      .classify(f, Seq("x0", "x1", "x2"), wFinal)
      .filter(col("pred") =!= col("y")).count()
    assert(miss == 0L, s"converged weights must fit the training set, $miss missed")
  }

  test("fuzzyPairs: deletion-neighborhood blocking finds exactly the lev<=1 pairs") {
    import spark.implicits._
    val rows = Seq(
      (1L, "alpha"), (2L, "alpha"),   // equality (dist 0)
      (3L, "alphb"),                  // substitution vs alpha
      (4L, "alpha1"),                 // insertion vs alpha
      (5L, "alph"),                   // deletion vs alpha
      (6L, "beta"), (7L, "betarax"),  // dist 3 — must NOT match
      (8L, "gamma")                   // isolated
    ).toDF("id", "key")
    val got = graft.link.Link.fuzzyPairs(rows, "id", "key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    // brute-force ground truth over all pairs
    val data = Seq(1L -> "alpha", 2L -> "alpha", 3L -> "alphb",
      4L -> "alpha1", 5L -> "alph", 6L -> "beta", 7L -> "betarax", 8L -> "gamma")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, ka) <- data; (ib, kb) <- data if ia < ib
      dd = lev(ka, kb) if dd <= 1
    } yield (ia, ib, dd)).toSet
    assert(want.nonEmpty && got == want,
      s"blocking must be lossless for lev<=1: extra=${got -- want} missing=${want -- got}")
  }

  test("mixSources: copy multiplicity = full copies + deterministic fractional slice") {
    import spark.implicits._
    val docs = (0L until 200L).map(k => (k, if (k < 100) "a" else "b"))
      .toDF("doc_id", "src")
    // a = 230% (2 full + 30% slice), b = 40% (no full, 40% slice)
    val w = when(col("src") === "a", 230L).otherwise(40L)
    val out = graft.text.Corpus.mixSources(docs, w, "doc_id")
      .groupBy("doc_id", "src").agg(count(lit(1)).as("n"),
        max(col("copy")).as("maxc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byDoc = out.map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // every a-doc appears 2 or 3 times, copies densely numbered from 0
    (0L until 100L).foreach { k =>
      val (s, n, maxc) = byDoc(k)
      assert(s == "a" && (n == 2L || n == 3L) && maxc == n - 1, s"doc $k: $n copies")
    }
    // b-docs appear at most once; the slice is the md5 bucket < 40 rule
    (100L until 200L).foreach { k =>
      byDoc.get(k).foreach { case (_, n, _) => assert(n == 1L) }
    }
    val nB = out.count(_._2 == "b")
    assert(nB > 20 && nB < 60, s"b slice should be ~40%, got $nB/100")
    // determinism: a second run yields the identical multiset
    val again = graft.text.Corpus.mixSources(docs, w, "doc_id")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.groupBy(_._1).view.mapValues(_.head._3).toMap == again)
  }

  test("bm25 discipline: identical doubles from the decimal-sum path vs a plain sum") {
    import spark.implicits._
    // the decimal contrib sum must be order-independent: summing the
    // same 6dp contributions in reversed order yields the same score
    val xs = Seq(1.234567, 2.000001, 0.999999, 3.141593)
    def sumDec(vs: Seq[Double]): java.math.BigDecimal =
      vs.map(v => new java.math.BigDecimal(v).setScale(6, java.math.RoundingMode.HALF_UP))
        .reduce(_.add(_))
    assert(sumDec(xs) == sumDec(xs.reverse))
    // and the registered query returns a deterministic top-10
    val a = SparkEntry.queries("t_bm25")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = SparkEntry.queries("t_bm25")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b && a.size == 10)
    assert(a.map(_._2) == a.map(_._2).sorted.reverse, "scores must be ranked desc")
  }

  test("connectedComponents on an empty pair list returns no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.dedup.Dedup.connectedComponents(empty).count() == 0)
  }

  test("ccIncremental: manifest change-feed append merges label-for-label with delta-sized work") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccinc").toString + "/edges"
    // v1: chain 1-2-3, pair 10-11, pair 20-21
    val e1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    graft.io.Sinks.writeWithManifest(spark, e1, dir, "id_a", nFiles = 2)
    val prev = graft.dedup.Dedup.connectedComponents(e1).localCheckpoint()
    // v2 append: a bridge 3-10 (merges two components), a brand-new
    // component 30-31, and a repeat of 20-21 (must be a no-op)
    val delta = Seq((3L, 10L), (30L, 31L), (20L, 21L)).toDF("id_a", "id_b")
    graft.io.Sinks.appendWithManifest(spark, delta, dir, "id_a", nFiles = 1)
    val inserted = graft.io.Sinks.readChanges(spark, dir, fromVersion = 1L)
      .filter(col("_change_type") === "insert").select("id_a", "id_b")
    val (inc, nSuper) = graft.dedup.Dedup.ccIncremental(prev, inserted)
    // bounded recompute: CC re-ran on 2 super-edges (the bridge between
    // prior clusters + the new pair), never the 7-edge full graph
    assert(nSuper == 2L, s"expected 2 super-edges, got $nSuper")
    val cold = graft.dedup.Dedup
      .connectedComponents(e1.union(delta))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = inc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == cold, s"incremental must equal cold label-for-label: $got vs $cold")
    // an intra-component append (no merging) passes labels through
    val (same, zero) = graft.dedup.Dedup
      .ccIncremental(inc, Seq((1L, 3L)).toDF("id_a", "id_b"))
    assert(zero == 0L)
    assert(same.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == cold)
  }

  test("kCoreIncremental: change-feed append recomputes the core on the delta-local region only") {
    import spark.implicits._
    // old graph: K4 clique {1..4} (the 3-core) + a tail 4-5-6
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val oldE = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val (oldCore, _) = graft.graph.Graph.kCore(oldE, k = 3, maxRounds = 20)
    // append completes a second K4 on {4,5,6,7}: 5,6,7 get promoted
    val delta = Seq((4L, 6L), (4L, 7L), (5L, 7L), (6L, 7L)).toDF("src", "dst")
    val all = oldE.union(delta)
    val (inc, bfsR, peelR) =
      graft.graph.Graph.kCoreIncremental(oldCore, all, delta, k = 3)
    val (cold, coldR) = graft.graph.Graph.kCore(all, k = 3, maxRounds = 20)
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(inc) == edgeSet(cold),
      "incremental k-core must equal the cold recompute edge-for-edge")
    assert(peelR <= coldR, s"incremental peels $peelR must not exceed cold $coldR")
    assert(bfsR <= 3, s"promotion region is one hop of the delta, BFS ran $bfsR")
    // a no-op append far from the core (degree-1 leaves are ineligible):
    // the affected region is empty and the core passes through unchanged
    val leaf = Seq((8L, 9L)).toDF("src", "dst")
    val (inc2, _, peel2) = graft.graph.Graph
      .kCoreIncremental(inc, all.union(leaf), leaf, k = 3)
    assert(edgeSet(inc2) == edgeSet(cold))
    assert(peel2 == 0, s"nothing eligible changed — expected 0 peels, ran $peel2")
  }

  test("associationRules: basket stats floor to bp; dup lines collapse; min support filters") {
    import spark.implicits._
    // b1:{x,y} (x twice — must collapse), b2:{x,y}, b3:{x,z}, b4:{x}
    val b = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "x")).toDF("b", "i")
    val got = graft.mine.Mine.associationRules(b, "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // n=4, n_x=4, n_y=2, n_z=1; (x,y) co-occurs 2×, (x,z) 1×
    assert(got == Map(
      ("x", "y") -> ((2L, 5000L, 5000L, 10000L)),   // lift 1.0: y ⊥ x exactly
      ("y", "x") -> ((2L, 5000L, 10000L, 10000L)),  // conf P(x|y) = 1
      ("x", "z") -> ((1L, 2500L, 2500L, 10000L)),
      ("z", "x") -> ((1L, 2500L, 10000L, 10000L))), s"rules drifted: $got")
    // raising the pair-support floor drops the singleton pair, both directions
    val kept = graft.mine.Mine.associationRules(b, "b", "i", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("x", "y"), ("y", "x")))
  }

  test("skyline2d: matches brute-force dominance; frontier ties all survive") {
    import spark.implicits._
    val pts = Seq((0L, 1L), (1L, 5L), (1L, 3L), (2L, 7L), (2L, 7L),
      (3L, 7L), (3L, 9L), (5L, 9L)).toDF("x", "y")
    val got = graft.mine.Mine.skyline2d(pts, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // brute force: r survives iff no s with s.x<=r.x, s.y>=r.y, strict somewhere
    val rows = Seq((0L, 1L), (1L, 5L), (1L, 3L), (2L, 7L), (2L, 7L),
      (3L, 7L), (3L, 9L), (5L, 9L))
    val brute = rows.filter { r =>
      !rows.exists(s => s._1 <= r._1 && s._2 >= r._2 && s != r)
    }
    // (2,7) appears twice and both copies must survive (equal points
    // never dominate each other); the brute filter above treats the
    // twin as a dominator, so assert against the hand-derived set + dup
    assert(got == Seq((0L, 1L), (1L, 5L), (2L, 7L), (2L, 7L), (3L, 9L)),
      s"skyline drifted: $got (strict-dominance brute set: $brute)")
  }

  test("rrf: reciprocal contributions sum; absent docs score one-sided; doc_id breaks ties") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = graft.sim.Fusion.rrf(Seq(a, b), k0 = 0, topK = 10)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // d20: 1e6/2 + 1e6/1 = 1.5e6; d10 and d30 tie at 1e6 vs 5e5
    assert(got == Seq((1, 20L, 1500000L), (2, 10L, 1000000L),
      (3, 30L, 500000L)), s"fusion drifted: $got")
    // exact tie (both rank 1 in one ranker each) breaks on doc_id asc
    val t1 = Seq((1L, 50L, 1)).toDF("query_id", "doc_id", "rank")
    val t2 = Seq((1L, 40L, 1)).toDF("query_id", "doc_id", "rank")
    val tied = graft.sim.Fusion.rrf(Seq(t1, t2), k0 = 0, topK = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(tied == Seq((1, 40L), (2, 50L)))
  }

  test("abChiSquare: closed-form 2x2 matches hand value; null effect and degenerate margins score 0") {
    import spark.implicits._
    // a=30/b=70 vs c=10/d=90: chi2 = 200·(2700−700)²/(100·100·40·160) = 12.5
    val strong = (Seq.fill(30)((0, 1)) ++ Seq.fill(70)((0, 0)) ++
      Seq.fill(10)((1, 1)) ++ Seq.fill(90)((1, 0))).toDF("variant", "succ")
    val s = graft.etl.Drift.abChiSquare(strong, "variant", "succ").head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ==
      ((100L, 100L, 30L, 10L)))
    assert((s.getLong(4), s.getLong(5)) == ((3000L, 1000L)))
    assert(s.getLong(6) == 12500000L && s.getInt(7) == 1,
      s"chi2_micro=${s.getLong(6)} significant=${s.getInt(7)}")
    // identical arms: ad − bc = 0 exactly
    val nullEff = (Seq.fill(50)((0, 1)) ++ Seq.fill(50)((0, 0)) ++
      Seq.fill(50)((1, 1)) ++ Seq.fill(50)((1, 0))).toDF("variant", "succ")
    val ne = graft.etl.Drift.abChiSquare(nullEff, "variant", "succ").head()
    assert(ne.getLong(6) == 0L && ne.getInt(7) == 0)
    // empty B arm: degenerate margin must score 0, not divide by zero
    val oneArm = Seq.fill(50)((0, 1)).toDF("variant", "succ")
    val oa = graft.etl.Drift.abChiSquare(oneArm, "variant", "succ").head()
    assert(oa.getLong(6) == 0L && oa.getInt(7) == 0)
  }

  test("hits: hand recurrence with max-normalization; bipartite roles separate cleanly") {
    import spark.implicits._
    // hubs {2,4} → authorities {1,3}: 2→1, 2→3, 4→3
    val e = Seq((2L, 1L), (2L, 3L), (4L, 3L)).toDF("src", "dst")
    val got = graft.graph.Graph.hits(e, rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // r1: ra=(1e6, 2e6) → a=(5e5, 1e6); rh=(1.5e6, 1e6) → h=(1e6, 666666)
    // r2: ra=(1e6, 1666666) → a=(600000, 1e6); rh=(1.6e6, 1e6) → h=(1e6, 625000)
    assert(got == Map(
      1L -> ((0L, 600000L)), 2L -> ((1000000L, 0L)),
      3L -> ((0L, 1000000L)), 4L -> ((625000L, 0L))),
      s"hits drifted: $got")
  }

  test("personalizedPageRank: hand recurrence replays; unreachable stays 0; all-sources = pageRank") {
    import spark.implicits._
    // cycle 1→2→3→1 plus feeder 4→1: 4 forwards mass but never receives
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val s = Seq(1L).toDF("node")
    val got = graft.graph.Graph.personalizedPageRank(e, s, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // s1 = (150000, 850000, 0, 0); s2 = (150000, 127500, 722500, 0);
    // s3 = (150000 + 85·722500 div 100, 127500, 108375, 0)
    assert(got == Map(1L -> 764125L, 2L -> 127500L, 3L -> 108375L, 4L -> 0L),
      s"ppr drifted: $got")
    // seeding EVERY node reduces to plain PageRank (same basis, same init)
    val all = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val ppr = graft.graph.Graph.personalizedPageRank(e, all, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = graft.graph.Graph.pageRank(e, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr == pr, "all-sources PPR must equal global PageRank")
  }

  test("linkPredictRA: wedge scores replay by hand; adjacency excluded; cap drops hub wedges") {
    import spark.implicits._
    // path 1-2-3 (wedge through 2, deg 2) + hub 9 over leaves 4..7
    val e = Seq((1L, 2L), (2L, 3L), (9L, 4L), (9L, 5L), (9L, 6L), (9L, 7L))
      .toDF("src", "dst")
    def run(cap: Int) = graft.graph.Graph.linkPredictRA(e, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // cap 3 excludes the deg-4 hub: only (1,3) via 2, score ⌊10⁶/2⌋
    assert(run(3) == Map((1L, 3L) -> ((1L, 500000L))))
    // cap 10 admits the hub: its 6 leaf pairs each score ⌊10⁶/4⌋
    val wide = run(10)
    assert(wide.size == 7)
    assert(wide((1L, 3L)) == ((1L, 500000L)))
    for (p <- Seq((4L, 5L), (4L, 6L), (4L, 7L), (5L, 6L), (5L, 7L), (6L, 7L)))
      assert(wide(p) == ((1L, 250000L)), s"hub pair $p drifted")
    // an existing edge never re-predicts: closing 1-3 removes the pair
    val closed = graft.graph.Graph.linkPredictRA(
      e.union(Seq((3L, 1L)).toDF("src", "dst")), 3)
      .collect()
    assert(closed.isEmpty, "adjacent pair must be anti-joined away")
  }

  test("expSmooth: hand-computed taps; partial head windows; null values carry no weight") {
    import spark.implicits._
    val df = Seq((1L, 1, Some(10L)), (1L, 2, Some(20L)), (1L, 3, None),
      (1L, 4, Some(40L)), (2L, 1, Some(7L))).toDF("k", "t", "x")
    val got = graft.etl.Sequences.expSmooth(df, "k", Seq("t"), "x", taps = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    // (1,1): 80/8 = 10; (1,2): (160+40)/12 = 16;
    // (1,3): x null → (80+20)/6 = 16 (the null tap adds no weight);
    // (1,4): (320+0+40+10)/11 = 33; (2,1): fresh key → 7
    assert(got == Map((1L, 1) -> 10L, (1L, 2) -> 16L, (1L, 3) -> 16L,
      (1L, 4) -> 33L, (2L, 1) -> 7L), s"expSmooth drifted: $got")
  }

  test("minhashLshPairsIncremental: append run equals cold rerun pair-for-pair") {
    import spark.implicits._
    // three near-dup families + singletons; B holds a dup of an A doc
    // (the cross-batch pair the incremental path must find), an intra-B
    // dup pair, and an unrelated doc
    val mk = (id: Long, t: String) => (id, t)
    val a = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog today"),
      mk(2L, "the quick brown fox jumps over the lazy dog today"),
      mk(3L, "an entirely different document about spark shuffles"),
      mk(4L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
    ).toDF("doc_id", "text")
    val b = Seq(
      mk(5L, "the quick brown fox jumps over the lazy dog today"),
      mk(6L, "completely novel content mentioning catalyst expression codegen"),
      mk(7L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
    ).toDF("doc_id", "text")
    val all = a.unionByName(b)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cold = pairSet(Dedup.minhashLshPairs(all, "doc_id", "text"))
    val coldA = pairSet(Dedup.minhashLshPairs(a, "doc_id", "text"))
    val oldIndex = Dedup.lshBandIndex(a, "doc_id", "text")
    val (updated, incPairs) = Dedup.minhashLshPairsIncremental(
      oldIndex, b, all, "doc_id", "text")
    // the law: pairs(A∪B) = pairs(A) ∪ incremental(B), values included
    assert(coldA ++ pairSet(incPairs) == cold,
      s"incremental union drifted from cold: ${coldA ++ pairSet(incPairs)} vs $cold")
    // every incremental pair touches a new doc (B side actually new-sided)
    assert(pairSet(incPairs).forall { case (x, y, _) => x >= 5L || y >= 5L })
    // the persisted artifact equals a cold index build row-for-row
    val coldIdx = Dedup.lshBandIndex(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val gotIdx = updated
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(gotIdx == coldIdx, "updated index must equal cold index build")
  }

  test("harmonicCloseness: hand-computed path graph; landmark self-distance excluded") {
    import spark.implicits._
    // path 1-2-3-4 (symmetric edges), landmarks {1, 4}, 3 rounds
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val lms = Seq(1L, 4L).toDF("node")
    val got = graft.graph.Graph.harmonicCloseness(e, lms, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // node 1: d(1,4)=3 → 3333; node 2: d(2,1)=1, d(2,4)=2 → 15000;
    // node 3 symmetric to 2; node 4 symmetric to 1 — dist-0 self rows drop
    assert(got == Map(
      1L -> (1L, 3333L), 2L -> (2L, 15000L),
      3L -> (2L, 15000L), 4L -> (1L, 3333L)), s"closeness drifted: $got")
  }

  test("olsSlopeBp: exact positive/negative/constant-x slopes, sign-safe floor division") {
    import spark.implicits._
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 12L), ("up", 3L, 14L),     // slope 2
      ("down", 1L, 9L), ("down", 2L, 6L), ("down", 3L, 3L),  // slope -3
      ("third", 1L, 1L), ("third", 2L, 2L), ("third", 3L, 2L), // slope 1/2
      ("flat", 5L, 1L), ("flat", 5L, 9L)                     // den = 0
    ).toDF("g", "x", "y")
    val got = graft.ml.Stats.olsSlopeBp(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got == Map("up" -> Some(20000L), "down" -> Some(-30000L),
      "third" -> Some(5000L), "flat" -> None), s"slopes drifted: $got")
  }

  test("sigmaOutliers: only the far point trips the integer 3-sigma gate") {
    import spark.implicits._
    // group g: fifteen 100s and one 1000 — the 1000 sits √15 ≈ 3.9σ out
    // (with nine ties it would be EXACTLY 3σ and the strict > gate
    // rightly excludes it); group h is tight (all equal → variance 0,
    // (nx−S)² = 0 not > 0, no flags)
    val rows = (1L to 15L).map(i => ("g", i, 100L)) ++ Seq(("g", 16L, 1000L)) ++
      (1L to 4L).map(i => ("h", i, 7L))
    val got = graft.ml.Stats.sigmaOutliers(rows.toDF("g", "id", "x"),
        Seq("g"), col("x"), sigmas = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("g", 16L)), s"outliers drifted: $got")
  }

  test("chunkSliding: window/stride offsets, short tail chunk, single-chunk tiny doc") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val got = graft.text.Corpus.chunkSliding(docs, "doc_id", "text",
        window = 3, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 1 (5 tokens): starts 0,2,4 → 3-token, 3-token, 1-token chunks;
    // doc 2 (1 token): single chunk of 1
    assert(got == Set((1L, 0L, 0L, 3L), (1L, 1L, 2L, 3L), (1L, 2L, 4L, 1L),
      (2L, 0L, 0L, 1L)), s"chunks drifted: $got")
  }

  test("embeddingDrift: hand-computed per-dim mean gaps; zero gap stays zero") {
    import spark.implicits._
    val a = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((3L, Seq(2.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = graft.etl.Drift.embeddingDrift(a, b, "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    // dim 1: means 2.0 vs 2.0 → 0; dim 2: means 3.0 vs 2.0 → +10000 fx
    assert(got == Map(1L -> 0L, 2L -> 10000L), s"drift drifted: $got")
  }

  test("negativeEdgeSample: never a real edge or self, at most k per node, deterministic") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (8L, 1L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val edgeSet = und.flatMap(p => Seq(p, p.swap)).toSet
    def sample() = graft.graph.Graph.negativeEdgeSample(e, k = 2, trials = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val s1 = sample()
    assert(s1.nonEmpty, "sample must not be empty on an 8-cycle")
    assert(s1.forall { case (u, v) => u != v && !edgeSet((u, v)) },
      s"sampled a self-pair or real edge: $s1")
    assert(s1.groupBy(_._1).values.forall(_.size <= 2), "k bound violated")
    assert(s1.toSet == sample().toSet, "sampling must be deterministic")
  }

  override def afterAll(): Unit = spark.stop()
}
