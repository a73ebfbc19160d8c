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

  test("betweennessBpWarm: append(Δ) then incremental ≡ cold; only the " +
      "sources that can see the Δ edge recompute") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    // two far-apart undirected components: a 6-path 1..6 and a 6-path
    // 11..16; Δ appends edge 15—16's... no: append a NEW edge 3—20
    // hanging a leaf off the FIRST component. With rounds = 3, sources
    // in the second component can never see node 3 → they must reuse.
    val prs0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), (15L, 16L))
    val delta = Seq((3L, 20L), (20L, 3L))
    val e0 = (prs0 ++ prs0.map(_.swap)).toDF("src", "dst")
    val e1 = (prs0 ++ prs0.map(_.swap) ++ delta).toDF("src", "dst")
    val dEdges = delta.toDF("src", "dst")
    val sources = (Seq(1L, 2L, 4L, 6L) ++ Seq(11L, 13L, 16L)).toDF("node")
    val rounds = 3
    val prev = Graph.brandesPerSource(e0, sources, rounds).localCheckpoint()
    val cold = Graph.betweennessBp(e1, sources, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (warmDf, nAffected) =
      Graph.betweennessBpWarm(e1, sources, rounds, prev, dEdges)
    val warm = warmDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm === cold, s"warm/cold divergence:\n  w=$warm\n  c=$cold")
    // sources within 2 hops of Δ-source {3, 20}: 1, 2, 4 (6 is 3 hops
    // away; the whole 11..16 component is unreachable) — strictly
    // fewer than the 7 sources a cold run pays for
    assert(nAffected == 3L,
      s"expected exactly sources {1,2,4} to recompute, got $nAffected")
    // sanity: the appended leaf actually changed the result (4 now
    // carries no new flow but 3 does — the test isn't vacuous)
    val before = Graph.betweennessBp(e0, sources, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before != cold, "Δ edge must change betweenness")
  }

  test("betweennessBpSampled: stride=1 recovers exact bit-for-bit; " +
      "stride>1 runs a strict source subsample and scales") {
    val s = spark
    import s.implicits._
    val prs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (2L, 7L), (7L, 4L))
    val edges = (prs ++ prs.map(_.swap)).toDF("src", "dst")
    val sources = (1L to 7L).toDF("node")
    val exact = Graph.betweennessBp(edges, sources, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the estimator at stride 1 IS the exact path: sample = all
    // sources, scale factor n/n = 1
    val full = Graph.betweennessBpSampled(edges, sources, rounds = 3,
        stride = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === exact, s"stride=1 must equal exact:\n  s=$full\n  e=$exact")
    // stride 3: the hash coin keeps a strict non-empty subsample, and
    // the scaled estimate stays in the right regime (same support
    // shape, integer-exact arithmetic)
    val kept = (1L to 7L).filter(v => ((v * 48271) % 1048573) % 3 == 0)
    assert(kept.nonEmpty && kept.size < 7)
    val est = Graph.betweennessBpSampled(edges, sources, rounds = 3,
        stride = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-check: estimate = (Σ over kept sources of delta) * 7 div kept
    val per = Graph.brandesPerSource(edges,
        kept.toDF("node"), rounds = 3)
      .filter(org.apache.spark.sql.functions.col("node") =!=
        org.apache.spark.sql.functions.col("s"))
      .groupBy("node").agg(org.apache.spark.sql.functions.sum("delta_bp").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1) * 7 / kept.size).toMap
    assert(est === per, s"estimator algebra drifted:\n  got=$est\n  want=$per")
  }

  test("TextRank keywordsWarm: appended docs recompute alone; untouched " +
      "docs reuse prior rows bit-exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val oldDocs = Seq(
      (1L, "alpha beta gamma alpha beta delta"),
      (2L, "red green blue red green yellow")).toDF("doc_id", "text")
    val newDocs = Seq(
      (3L, "spark catalyst tungsten spark codegen catalyst"))
      .toDF("doc_id", "text")
    val all = oldDocs.unionByName(newDocs)
    val prev = graft.text.TextRank.keywords(oldDocs, col("text"),
      iters = 3, topK = 2).localCheckpoint()
    val cold = graft.text.TextRank.keywords(all, col("text"),
        iters = 3, topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3))).toSet
    val warm = graft.text.TextRank.keywordsWarm(newDocs, col("text"),
        iters = 3, topK = 2, prev = prev)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3))).toSet
    assert(warm === cold, s"warm/cold divergence:\n  w=$warm\n  c=$cold")
    // an UPDATED doc replaces its prior rows (no resurrection, no dups)
    val doc2v2 = Seq((2L, "solo")).toDF("doc_id", "text")
    val warm2 = graft.text.TextRank.keywordsWarm(doc2v2, col("text"),
      iters = 3, topK = 2, prev = prev)
    assert(warm2.filter(col("doc_id") === 2L).count() == 0,
      "a 1-token doc has no co-occurrence graph — old rows must not leak")
    assert(warm2.filter(col("doc_id") === 1L).count() == 2)
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
