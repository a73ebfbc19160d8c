package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Graph
import graft.sketch.Sketch

/** Specs for [[graft.graph.Graph.hyperBall]] — the load-bearing law is
  * that the round-t counter of a node IS the HLL sketch of its exact
  * t-hop ball (HLL(A ∪ B) = bucketwise max), so the per-node estimate
  * must EQUAL the estimate computed from the exact reachable set by an
  * independent path — not merely approximate it. */
class HyperBallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  // est_milli re-derived independently of Graph.hyperBall: the same
  // integer algebra over Sketch.hllRegisters' DENSE register table.
  private def estMilliFromBall(members: Seq[Long]): Long = {
    val s = spark
    import s.implicits._
    val regs = Sketch.hllRegisters(
      members.map(_.toString).toDF("tok"), "tok", m = 64)
    val sHarm = regs.agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - register AS INT))")))
      .head().getLong(0)
    (BigInt("104629932386080576765952") / BigInt(sHarm)).toLong
  }

  private def pathGraph() = {
    val s = spark
    import s.implicits._
    // undirected path 1 — 2 — 3
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
  }

  test("round-t estimate equals the HLL estimate of the exact t-hop ball") {
    val r = Graph.hyperBall(pathGraph(), m = 64, rounds = 2)
      .collect()
      .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    val balls = Map(
      (0, 1L) -> Seq(1L), (0, 2L) -> Seq(2L), (0, 3L) -> Seq(3L),
      (1, 1L) -> Seq(1L, 2L), (1, 2L) -> Seq(1L, 2L, 3L),
      (1, 3L) -> Seq(2L, 3L),
      (2, 1L) -> Seq(1L, 2L, 3L), (2, 2L) -> Seq(1L, 2L, 3L),
      (2, 3L) -> Seq(1L, 2L, 3L))
    balls.foreach { case (key, members) =>
      assert(r(key) === estMilliFromBall(members),
        s"round ${key._1} node ${key._2}")
    }
  }

  test("estimates are monotone in t and reach a fixpoint past the diameter") {
    val r = Graph.hyperBall(pathGraph(), m = 64, rounds = 3)
      .collect()
      .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    for (node <- 1L to 3L; t <- 0 to 2)
      assert(r((t, node)) <= r((t + 1, node)), s"node $node round $t")
    // diameter 2: round 3 must equal round 2 exactly, node for node
    for (node <- 1L to 3L) assert(r((3, node)) === r((2, node)))
  }

  test("disconnected components never leak mass across the gap") {
    val s = spark
    import s.implicits._
    // two disjoint edges: {1,2} and {10,11}
    val e = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val r = Graph.hyperBall(e, m = 64, rounds = 3)
      .filter(col("round") === 3).collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r(1L) === estMilliFromBall(Seq(1L, 2L)))
    assert(r(10L) === estMilliFromBall(Seq(10L, 11L)))
  }

  test("warm start from prior registers: append(Δ) then incremental ≡ " +
      "cold, rounds ≪ cold") {
    val sp = spark
    import sp.implicits._
    // A directed 8-path: cold convergence needs ~8 rounds (balls grow
    // one hop per round). Δ appends a single edge extending the head;
    // seeding from the prior fixed point re-converges in ~2 rounds and
    // the final registers are BIT-IDENTICAL to a cold run on the
    // appended graph (max-merge sketches are append-safe monotone).
    val path = (1L until 8L).map(i => (i, i + 1))
    val e1 = path.toDF("src", "dst")
    val (regs1, r1) = Graph.hyperBallRegisters(e1, m = 16, maxRounds = 20)
    assert(r1 >= 7, s"cold base run must take ~path-length rounds, got $r1")
    val aug = (path :+ (0L, 1L)).toDF("src", "dst")
    val (coldRegs, coldRounds) =
      Graph.hyperBallRegisters(aug, m = 16, maxRounds = 20)
    val (incRegs, incRounds) = Graph.hyperBallRegisters(aug, m = 16,
      maxRounds = 20, seedRegisters = Some(regs1))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(canon(incRegs) === canon(coldRegs),
      "incremental registers must equal the cold fixed point bit-for-bit")
    assert(incRounds < coldRounds,
      s"warm start must converge in fewer rounds: inc=$incRounds cold=$coldRounds")
    // and the estimates agree with the public per-round kernel's last round
    val est = Graph.hyperBallEstimate(incRegs, m = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Graph.hyperBall(aug, m = 16, rounds = coldRounds)
    val lastT = coldRounds.toLong
    val pub = full.filter(s"round = $lastT")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(est === pub,
      "hyperBallEstimate must reproduce the public kernel's estimates")
  }
}
