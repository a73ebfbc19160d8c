package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Corpus2Q, OverlapQ, RetrievalQ, TimelineQ}
import graft.sim.Similarity

/** Hand-built edge cases for the round-8 retrieval / timeline / overlap /
  * corpus-mix packs — the cases the corpus oracle can't isolate:
  * duplicate-token phrases, containment directionality, gap-spine
  * arithmetic, funnel window cutoffs, isqrt exactness at square
  * boundaries, and hard-negative label exclusion.
  */
class TimelineRetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-tlr-test")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---------------------------------------------------------- phrase

  test("phraseMatches: repeated-token phrase sets each bit exactly once") {
    import spark.implicits._
    // phrase "a b a": doc 1 has a match at 1 and an overlapping one at 3;
    // doc 2 has "a b" and "b a" but never the full phrase.
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "a b c b a")).toDF("doc_id", "text")
    val out = RetrievalQ.phraseMatches(docs, Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 1), (1L, 3)), s"got $out")
  }

  test("phraseMatches: match at position 1 and at the last possible anchor") {
    import spark.implicits._
    val docs = Seq((7L, "x y z x y")).toDF("doc_id", "text")
    val xy = RetrievalQ.phraseMatches(docs, Seq("x", "y"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(xy == Seq((7L, 1), (7L, 4)), s"got $xy")
    // "y x" never occurs ("y z" at 2, "y" at 5 has no successor): the
    // anchor arithmetic must not produce a phantom match off the end
    val yx = RetrievalQ.phraseMatches(docs, Seq("y", "x"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(yx.isEmpty, s"got $yx")
  }

  // ----------------------------------------------------- hard negatives

  test("hardNegativeTopK excludes same-label rows even when they are nearest") {
    import spark.implicits._
    // q (label 0) is nearly identical to n1 (label 0) — which must NOT
    // appear; nearest different-label is n2.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.14f, 0.0f), 0),
      (2L, Array(0.9f, 0.43f, 0.0f), 1),
      (3L, Array(0.0f, 1.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 1.0f), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativeTopK(
        emb.filter(col("vec_id") === 0L), emb, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(out.map(_._2) == Seq(2L, 3L, 4L), s"got $out")
  }

  test("hardNegativeTopK with all-distinct labels equals plain top-k") {
    import spark.implicits._
    val emb = (0L until 12L).map { i =>
      (i, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat + 1f), i.toInt)
    }.toDF("vec_id", "embedding", "label")
    val q = emb.filter(col("vec_id") < 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq.sorted
    val hard = rows(Similarity.hardNegativeTopK(q, emb, k = 4))
    val plain = rows(Similarity.bruteForceTopKAgg(q, emb, k = 4))
    assert(hard == plain,
      "unique labels: hard-negative top-k must equal self-excluding top-k")
  }

  // ------------------------------------------------------------ gapfill

  test("gapFillDaily: explicit zero days, running total, gap age") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-04 09:00:00")),
      (2L, ts("2024-01-02 00:00:00"))).toDF("user_id", "ts")
    val out = TimelineQ.gapFillDaily(ev).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 2L, 2L, 0),
      (1L, "2024-01-02", 0L, 2L, 1),
      (1L, "2024-01-03", 0L, 2L, 2),
      (1L, "2024-01-04", 1L, 3L, 0),
      (2L, "2024-01-02", 1L, 1L, 0)), s"got $out")
  }

  test("gapFillDaily spine accounting matches raw events at sf0.001") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val out = TimelineQ.gapFillDaily(ev)
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total == ev.count(), "spine must conserve the event count")
    // contiguity: per user, rows == datediff(max day, min day) + 1
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        (datediff(max("day"), min("day")) + 1).as("span"))
      .filter(col("rows") =!= col("span")).count()
    assert(bad == 0, "every user's spine must be contiguous")
  }

  // ------------------------------------------------------------- funnel

  test("funnelWindowed: late steps fall outside the 1-day window") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes all steps inside the windows
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 12:00:00")),
      (1L, "purchase", ts("2024-01-02 11:00:00")),
      // u2 clicks 2 days after signup: drops at step 2
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "click", ts("2024-01-03 00:00:00")),
      (2L, "purchase", ts("2024-01-03 01:00:00")),
      // u3 clicks BEFORE signing up: the pre-signup click must not count
      (3L, "click", ts("2024-01-01 00:00:00")),
      (3L, "signup", ts("2024-01-02 00:00:00")),
      (3L, "purchase", ts("2024-01-02 01:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = TimelineQ.funnelWindowed(ev).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(out == Seq((1, 3L), (2, 1L), (3, 1L)), s"got $out")
  }

  test("funnelWindowed: exact window boundary is inclusive") {
    import spark.implicits._
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-02 00:00:00")), // exactly +1 day
      (1L, "purchase", ts("2024-01-02 00:00:01")) // 1s into click's window
    ).toDF("user_id", "event_type", "ts")
    val out = TimelineQ.funnelWindowed(ev).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(out == Seq((1, 1L), (2, 1L), (3, 1L)), s"got $out")
  }

  // -------------------------------------------------------- containment

  test("containmentPairs is directional: substring doc fully contained") {
    import spark.implicits._
    // doc 1's shingle set is a strict subset of doc 2's
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = OverlapQ.containmentPairs(docs, 9000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(out == Seq((1L, 2L, 10000L)),
      s"only the small→big direction is ≥ 90%: got $out")
  }

  test("containmentPairs at 0 bp returns both directions with exact counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "c d e f g")).toDF("doc_id", "text")
    // shingles: doc1 {abc,bcd,cde}, doc2 {cde,def,efg} → inter = 1, n = 3
    val out = OverlapQ.containmentPairs(docs, 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq((1L, 2L, 3L, 1L, 3333L), (2L, 1L, 3L, 1L, 3333L)),
      s"got $out")
  }

  // -------------------------------------------------------- minhash est

  test("minhashEstPairs: identical docs estimate exactly 10000 bp") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u v"),
      (2L, "p q r s t u v"),
      (3L, "completely different words here now")).toDF("doc_id", "text")
    val out = OverlapQ.minhashEstPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq((1L, 2L, 10000L, 10000L, 0L)), s"got $out")
  }

  test("minhashEstPairs estimates stay in [0, 10000] on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = OverlapQ.minhashEstPairs(docs)
    val bad = out.filter(col("est_bp") < 0 || col("est_bp") > 10000 ||
      col("err_bp") =!= abs(col("est_bp") - col("exact_bp"))).count()
    assert(bad == 0)
    assert(out.count() > 0, "sf0.001 planted near-dups must produce pairs")
  }

  // ---------------------------------------------------------- mix + oov

  test("mixTempAccounting: exact isqrt at square boundaries, rate algebra") {
    import spark.implicits._
    // sources sized n, n±1 around a perfect square: isqrt must floor
    // exactly (15²=225 → w=15; 224 → 14; 226 → 15)
    val docs = (1L to 225L).map(i => (i, "s225"))
      .++((1L to 224L).map(i => (1000L + i, "s224")))
      .++((1L to 226L).map(i => (2000L + i, "s226")))
      .toDF("doc_id", "source")
    val out = Corpus2Q.mixTempAccounting(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == Seq(
      ("s224", 224L, 14L, 9333L),
      ("s225", 225L, 15L, 10000L),
      ("s226", 226L, 15L, 10000L)), s"got $out")
  }

  test("mixTempAccounting: selected counts bounded by rate semantics") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Corpus2Q.mixTempAccounting(docs)
    val bad = out.filter(col("n_selected") > col("n_docs") ||
      (col("rate_bp") === 10000 && col("n_selected") =!= col("n_docs")))
      .count()
    assert(bad == 0,
      "rate 10000 must keep every doc; selection can never exceed the source")
  }

  test("oovByLang: val-only bigram counts as OOV, train bigram does not") {
    import spark.implicits._
    // hashBucket(doc_id, 10): bucket < 2 → train. Pick ids empirically:
    // find one train id and one val id from a candidate range.
    val probe = (1L to 50L).map(i => (i, "probe")).toDF("doc_id", "x")
      .withColumn("b", graft.text.Corpus.hashBucket(col("doc_id"), 10))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val trainId = probe.find(_._2 < 2).get._1
    val valId = probe.find(_._2 >= 2).get._1
    val docs = Seq(
      (trainId, "en", "a b c"),
      (valId, "en", "a b z")).toDF("doc_id", "lang", "text")
    val out = Corpus2Q.oovByLang(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // val bigrams: "a b" (seen in train), "b z" (OOV) → 1 of 2 = 5000 bp
    assert(out == Seq(("en", 2L, 1L, 5000L)), s"got $out")
  }
}
