package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

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

  test("connectedComponents on an empty pair list returns no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.dedup.Dedup.connectedComponents(empty).count() == 0)
  }

  override def afterAll(): Unit = spark.stop()
}
