package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Graph
import graft.sim.Spectral

/** Hand-computed cases for the round-9 iterative ops: Katz centrality
  * (per-edge floors before sums) and the fixed-point power iteration
  * (max-rescale each round, floor divisions). */
class SpectralGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-test")

  test("katz: path graph 1→2→3, per-edge (10⁶+c)/16 floors") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.katz(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // c1: 2 ← (1e6+0)/16 = 62500; 3 ← 62500
    // c2+: 2 stays 62500; 3 ← (1e6+62500)/16 = 66406 (floor)
    assert(out === Map(1L -> 0L, 2L -> 62500L, 3L -> 66406L))
  }

  test("betweennessBp: path graph — the inner nodes carry the flow") {
    val s = spark
    import s.implicits._
    // undirected path 1—2—3—4 from source 1: δ(3)=10⁴ (carries the
    // path to 4), δ(2)=2·10⁴ (carries paths to 3 AND 4: σ₂(10⁴+δ₃)/σ₃).
    val prs = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (prs ++ prs.map(_.swap)).toDF("src", "dst")
    val out = Graph.betweennessBp(edges, Seq(1L).toDF("node"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(2L -> 20000L, 3L -> 10000L))
  }

  test("betweennessBp: diamond — σ-ratio splits dependency between " +
    "equal-count predecessors") {
    val s = spark
    import s.implicits._
    // 1—2—4 and 1—3—4: σ(4)=2, so 2 and 3 each carry HALF the
    // dependency on 4: δ = σ_u·10⁴/σ_v = 1·10⁴/2 = 5000.
    val prs = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val edges = (prs ++ prs.map(_.swap)).toDF("src", "dst")
    val out = Graph.betweennessBp(edges, Seq(1L).toDF("node"), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(2L -> 5000L, 3L -> 5000L))
  }

  test("powerDirection: axis-heavy 2-D cloud converges to the heavy axis") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
      (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val v = Spectral.powerDirection(vecs, "embedding", dim = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Gram = diag(3·1024², 1024²); v0 = (1024,1024);
    // v1 = (1024, 1024/3 = 341); v2 = (1024, 341/3 = 113);
    // v3 = (1024, 113/3 = 37) — collapsing onto the ×3 axis
    assert(v === Map(0L -> 1024L, 1L -> 37L))
  }

  test("labelProjections: opposite clusters land at opposite signs") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.0f, 0.1f)),
      (3L, 1, Seq(-1.0f, 0.0f)), (4L, 1, Seq(-1.0f, -0.1f)))
      .toDF("vec_id", "label", "embedding")
    val p = Spectral.labelProjections(vecs, "embedding", "label",
        dim = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(p(0L) > 0L !== p(1L) > 0L) // opposite ends of the component
    // not exactly ±equal: floor quantization is sign-asymmetric
    // (floor(102.4)=102, floor(-102.4)=-103) — magnitudes match to <1%
    assert(math.abs(p(0L) + p(1L)) * 100 <= math.abs(p(0L)))
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}
