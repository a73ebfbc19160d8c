package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity
import graft.text.Corpus

/** Hand-built-row semantics for the round-9 part-2 operators: MaxSim
  * late-interaction ranking, int8 scalar quantization, length-bucket
  * padding accounting, the token-budget waterfall, and curriculum phase
  * banding.
  */
class RankCurateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-rank-test")

  test("maxSimTopK: a group duplicating the query group ranks first " +
    "with a perfect per-query-vector match") {
    import spark.implicits._
    // groups of 2 vectors; group 1 = exact copy of query group 0,
    // group 2 = orthogonal-ish, group 3 = anti-aligned.
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)), // query g0
      (2L, Array(1f, 0f, 0f, 0f)), (3L, Array(0f, 1f, 0f, 0f)), // g1 copy
      (4L, Array(0f, 0f, 1f, 0f)), (5L, Array(0f, 0f, 0f, 1f)), // g2 orth
      (6L, Array(-1f, 0f, 0f, 0f)), (7L, Array(0f, -1f, 0f, 0f)) // g3 anti
    ).toDF("vec_id", "embedding")
    val out = Similarity.maxSimTopK(rows, queryGroup = 0L, groupSize = 2,
        k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // g1: both query vectors find an exact match → 2 · 10000.
    // g2: best dot 0 for both → 0. g3: each query vector's MAX over the
    // two doc vectors is 0 (its anti-aligned twin scores −1 but the
    // OTHER, orthogonal vector scores 0) → 0; the g2/g3 tie breaks on
    // group id.
    assert(out === Array(
      (1, 1L, 2L, 20000L), (2, 2L, 2L, 0L), (3, 3L, 2L, 0L)))
  }

  test("maxSimTopK: query group never appears in its own ranking") {
    import spark.implicits._
    val rows = (0L until 12L).map(i =>
      (i, Array.tabulate(4)(j => if (j == (i % 4).toInt) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.maxSimTopK(rows, queryGroup = 1L, groupSize = 4,
      k = 10)
    assert(!out.collect().map(_.getLong(1)).contains(1L))
  }

  test("sq8Quantize bounds and exact round-trip on axis vectors") {
    import spark.implicits._
    val rows = Seq((0L, Array(3f, 0f, 0f)), (1L, Array(-2f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.normalized(rows)
      .select(col("id"), Similarity.sq8Quantize(col("nv")).as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
      .sortBy(_._1)
    assert(q(0)._2 === Seq(127, 0, 0))
    assert(q(1)._2 === Seq(-127, 0, 0))
  }

  test("sq8TopK: an exact duplicate vector ranks first; quantized dots " +
    "stay within the ±127²·dims envelope") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(1f, 2f, 3f, 4f)),   // duplicate of the query
      (2L, Array(4f, 3f, 2f, 1f)),
      (3L, Array(-1f, -2f, -3f, -4f))).toDF("vec_id", "embedding")
    val out = Similarity.sq8TopK(rows.filter(col("vec_id") === 0L), rows,
        k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.head._2 === 1L) // the duplicate wins rank 1
    assert(out.forall { case (_, _, qdot) =>
      qdot <= 127L * 127L * 4 && qdot >= -127L * 127L * 4 })
    // anti-aligned vector ranks last with a negative dot
    assert(out.last._2 === 3L && out.last._3 < 0L)
  }

  test("lengthBuckets: hand-computed waste and save accounting") {
    import spark.implicits._
    // width 10: bucket 0 = {5, 8}, bucket 1 = {10}, global max 10.
    val rows = Seq((1L, 5L), (2L, 8L), (3L, 10L)).toDF("id", "len")
    val out = Corpus.lengthBuckets(rows, "len", 10)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // bucket 0: 2 docs, sum 13, max 8 → padded 16, waste (3·1e4)/16=1875,
    //   save vs global pad 20: (20−16)·1e4/20 = 2000.
    // bucket 1: 1 doc, sum 10, max 10 → padded 10, waste 0, save 0.
    assert(out === Array(
      (0L, 2L, 13L, 8L, 16L, 1875L, 2000L),
      (1L, 1L, 10L, 10L, 10L, 0L, 0L)))
  }

  test("tokenBudget: small source caps at its mass, leftover " +
    "redistributes to the open sources, never over-allocating") {
    import spark.implicits._
    // a: 10, b: 100, c: 100 tokens; budget 90 → want 30 each,
    // a caps at 10, leftover 20 splits 10/10 onto b and c.
    val rows = Seq(("a", 10L), ("b", 100L), ("c", 100L))
      .toDF("source", "n_tok")
    val out = Corpus.tokenBudget(rows, "source", "n_tok", budget = 90L)
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      ("a", 10L, 30L, 10L, 10000L),
      ("b", 100L, 30L, 40L, 4000L),
      ("c", 100L, 30L, 40L, 4000L)))
    assert(out.map(_._4).sum <= 90L)
  }

  test("curriculumPhase: bands are monotone in score and cover " +
    "[0, phases)") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, i)).toDF("id", "score")
    val out = Corpus.curriculumPhase(rows, "score", 4)
      .select("id", "phase").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(out.map(_._2).distinct.sorted === Seq(0, 1, 2, 3))
    // monotone: sorting by score never decreases the phase
    assert(out.sliding(2).forall { case Array(a, b) => a._2 <= b._2 })
    // equal-width: scores 1..25 → 0, 26..50 → 1, etc.
    assert(out.filter(_._1 <= 25).forall(_._2 == 0))
    assert(out.filter(_._1 > 75).forall(_._2 == 3))
  }

  test("aHashNearDupPairs: identical payloads collide at hamming 0; " +
    "banding never reports a pair beyond maxHamming") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"), // dup
      (3L, "completely different content with other words and letters " +
        "spread over enough bytes to fill all thirty two hash frames"))
      .toDF("doc_id", "text")
    val media = graft.mm.Multimodal.asMedia(docs, "doc_id", "text", "t")
    val pairs = graft.mm.Multimodal.aHashNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L))) // exact dup found at distance 0
    assert(pairs.forall(_._3 <= 3L))
  }

  test("aHashNearDupPairsIncremental: cold(A ∪ B) ≡ pairs(A) ∪ " +
    "incremental(B), and the updated index matches a cold index build") {
    import spark.implicits._
    def t(seed: String) =
      s"$seed lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val a = Seq((1L, t("one")), (2L, t("two")), (3L, t("three")))
      .toDF("doc_id", "text")
    val b = Seq((101L, t("one") + " x"), (102L, t("four")))
      .toDF("doc_id", "text") // 101 = near-twin of 1; 102 = fresh
    val mA = graft.mm.Multimodal.asMedia(a, "doc_id", "text", "t")
    val mB = graft.mm.Multimodal.asMedia(b, "doc_id", "text", "t")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cold = pairSet(graft.mm.Multimodal.aHashNearDupPairs(mA.unionByName(mB)))
    val idxA = graft.mm.Multimodal.aHashBandIndex(mA)
    val (full, newPairs) =
      graft.mm.Multimodal.aHashNearDupPairsIncremental(idxA, mB)
    val oldPairs = pairSet(graft.mm.Multimodal.aHashNearDupPairs(mA))
    assert(cold === oldPairs ++ pairSet(newPairs))
    // the incremental run actually found the cross-batch twin
    assert(pairSet(newPairs).exists(p => p._1 == 1L && p._2 == 101L))
    val coldIdx = graft.mm.Multimodal
      .aHashBandIndex(mA.unionByName(mB))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val incIdx = full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(coldIdx === incIdx)
  }

  test("aHash: bit i set exactly when frame i's checksum exceeds the mean") {
    import spark.implicits._
    val frames = Seq(
      (7L, 0, 10), (7L, 1, 20), (7L, 2, 30), (7L, 3, 100))
      .toDF("media_id", "frame_idx", "frame_checksum")
    // mean = 40 → only frame 3 (checksum 100) exceeds it → hash = 1<<3.
    val h = graft.mm.Multimodal.aHash(frames)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(h === Array((7L, 8L)))
  }

  test("curriculumPhase: single phase and constant score degrade to " +
    "all-zero phases") {
    import spark.implicits._
    val rows = Seq((1L, 7L), (2L, 7L)).toDF("id", "score")
    assert(Corpus.curriculumPhase(rows, "score", 1)
      .select("phase").collect().map(_.getInt(0)).forall(_ == 0))
    assert(Corpus.curriculumPhase(rows, "score", 5)
      .select("phase").collect().map(_.getInt(0)).forall(_ == 0))
  }

  override def afterAll(): Unit = spark.stop()
}
