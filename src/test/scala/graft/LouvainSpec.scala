package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Graph

/** Specs for [[graft.graph.Graph.louvainRounds]]: the synchronous
  * modularity-gain local moves must recover clean community structure
  * and be bit-deterministic at any partitioning (the tie-break is
  * label-ordered, never arrival-ordered). */
class LouvainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  private def sym(pairs: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
  }

  test("two disjoint triangles collapse to exactly two communities") {
    // round 1 from singletons sends each triangle into a 2+1 split;
    // round 2's gain argmax (stay ties broken by smaller label) folds
    // both stragglers back — hand-traced.
    val e = sym(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L))
    val lab = Graph.louvainRounds(e, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab(1L) === lab(2L) && lab(2L) === lab(3L))
    assert(lab(4L) === lab(5L) && lab(5L) === lab(6L))
    assert(lab(1L) !== lab(4L))
  }

  test("labels are identical at any partitioning") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 2L -> 7L, 7L -> 8L)
    val a = Graph.louvainRounds(sym(pairs), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = Graph.louvainRounds(sym(pairs).repartition(7), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a === b)
  }

  test("two-level: empty supergraph preserves level-1 labels exactly") {
    // disjoint triangles: level 1 resolves both communities, the
    // contraction has NO inter-community edges → the weighted pass is
    // empty and the coalesce path must keep every level-1 label
    val e = sym(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L))
    val one = Graph.louvainRounds(e, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val two = Graph.louvainTwoLevel(e, rounds1 = 2, rounds2 = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(two === one)
  }

  test("two-level: the contraction pass can merge what level 1 cannot") {
    // a 6-cycle: level-1 synchronous moves from singletons pair nodes
    // up but can't see past the pairs; the contraction turns pairs
    // into supernodes whose weighted pass coarsens further — assert
    // the two-level partition is no finer than level 1's
    val cyc = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L,
      6L -> 1L)
    val one = Graph.louvainRounds(sym(cyc), rounds = 2)
      .collect().map(r => r.getLong(1)).distinct.length
    val two = Graph.louvainTwoLevel(sym(cyc), rounds1 = 2, rounds2 = 2)
      .collect().map(r => r.getLong(1)).distinct.length
    assert(two <= one)
    assert(two >= 1)
  }

  test("zero rounds returns the singleton partition") {
    val e = sym(Seq(1L -> 2L, 2L -> 3L))
    val lab = Graph.louvainRounds(e, rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("warm start from prior labels: append(Δ) then incremental ≡ cold, " +
      "rounds ≪ cold") {
    // Two planted 5-cliques bridged weakly; Δ appends one PENDANT node
    // per clique — community structure is stable, so the seeded run
    // must recover the COLD run's partition in fewer rounds. The
    // comparison is PARTITION-canonical (sorted member sets), the
    // honest equivalence for a local-move algorithm whose label ids
    // are path artifacts; the scaladoc states the same contract.
    def clique(ns: Seq[Long]) =
      for (a <- ns; b <- ns if a < b) yield (a, b)
    def partition(lab: Map[Long, Long]): Set[Set[Long]] =
      lab.groupBy(_._2).values.map(_.keySet.toSet).toSet
    val g1 = clique(1L to 5L) ++ clique(11L to 15L) ++ Seq(5L -> 11L)
    val d2 = Seq(6L -> 1L, 16L -> 11L) // one pendant per clique
    val (coldSeedLab, coldRounds0) =
      Graph.louvainConverge(sym(g1), maxRounds = 10)
    assert(coldRounds0 >= 2, s"cold base run suspiciously fast: $coldRounds0")
    val aug = sym(g1 ++ d2)
    val (coldLab, coldRounds) = Graph.louvainConverge(aug, maxRounds = 10)
    val (incLab, incRounds) = Graph.louvainConverge(aug, maxRounds = 10,
      seedLabels = Some(coldSeedLab))
    val coldMap = coldLab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incMap = incLab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partition(incMap) === partition(coldMap),
      s"incremental partition diverged: inc=$incMap cold=$coldMap")
    assert(incRounds < coldRounds,
      s"warm start must converge in fewer rounds: inc=$incRounds cold=$coldRounds")
  }
}
