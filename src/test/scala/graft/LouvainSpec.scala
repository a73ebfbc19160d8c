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
}
