package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** Substring-level duplicate-span semantics on hand-built docs (the edge
  * cases the corpus oracle can't isolate: within-doc repeats, full-doc
  * coverage, sub-n short docs), plus the recall harness's arithmetic
  * invariants.
  */
class PrepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-prep-test")

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g"),     // shares "a b c d e" with doc 2
      (2L, "a b c d e x y"),
      (3L, "z z z z z z z z z z"), // 6 within-doc repeats of "z z z z z"
      (4L, "short doc")            // < n tokens: no shingles at all
    ).toDF("doc_id", "text")
  }

  test("duplicateNgramSpans: cross-doc + within-doc dups, short-doc zeroes") {
    val out = Dedup.duplicateNgramSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out === Seq(
      (1L, 3L, 1L, 1L, 3333L),
      (2L, 3L, 1L, 1L, 3333L),
      (3L, 6L, 6L, 1L, 10000L), // one maximal run covers all six positions
      (4L, 0L, 0L, 0L, 0L)))
  }

  test("removeDuplicateNgramSpans: covered tokens cut, order kept, " +
      "full-coverage doc empties, short doc intact") {
    val out = Dedup.removeDuplicateNgramSpans(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      (1L, "f g", 7L, 5L),
      (2L, "x y", 7L, 5L),
      (3L, "", 10L, 10L),
      (4L, "short doc", 2L, 0L)))
  }

  test("span report and scrub agree: a doc loses tokens iff it has dup spans") {
    val sf = "/root/testdata/sf0.001"
    val report = SparkEntry.queries("d_span_ngram")(spark, sf)
      .select("doc_id", "dup_ngrams").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scrub = SparkEntry.queries("d_span_scrub")(spark, sf)
      .select("doc_id", "n_removed").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(report.keySet === scrub.keySet)
    report.foreach { case (id, dup) =>
      assert((dup > 0) === (scrub(id) > 0),
        s"doc $id: dup_ngrams=$dup but n_removed=${scrub(id)}")
    }
  }

  test("t_quality_pctl keeps exactly floor(n/4) docs per language") {
    val sf = "/root/testdata/sf0.001"
    val perLang = Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("t_quality_pctl")(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(kept.getOrElse(lang, 0L) === n / 4,
        s"lang $lang: n=$n kept=${kept.getOrElse(lang, 0L)}")
    }
  }

  test("benchmarkSpanOverlap marks only benchmark-overlapping spans, " +
      "not corpus self-dups") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g"),   // "a b c d e" is in the benchmark
      (2L, "a b c d e f g"),   // corpus self-dup of doc 1 — but only the
                               // benchmark overlap may mark
      (3L, "p q r s t u")      // clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "x a b c d e y")).toDF("doc_id", "text")
    val out = Dedup.benchmarkSpanOverlap(corpus, bench, "doc_id", "text",
        n = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // docs 1/2: 3 5-grams, only pos 0 ("a b c d e") contaminated — the
    // full-doc self-dup between them must NOT mark anything
    assert(out === Seq(
      (1L, 3L, 1L, 1L, 3333L),
      (2L, 3L, 1L, 1L, 3333L),
      (3L, 2L, 0L, 0L, 0L)))
  }

  test("BPE merges: the Sennrich worked example, ties on pair text") {
    import spark.implicits._
    // freqs: low 5, lower 2, newest 6, widest 3
    // round 1: (e,s)=9 ties (s,t)=9 → (e,s) on text; round 2: (es,t)=9;
    // round 3: (l,o)=7 ties (o,w)=7 → (l,o)
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")
    ).toDF("doc_id", "text")
    val merges = graft.text.Bpe.learnMerges(docs, "text", rounds = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L)))
  }

  test("BPE applyMerges encodes a fresh word with the learned merge order") {
    import spark.implicits._
    val out = graft.text.Bpe.applyMerges(
        Seq("lowest").toDF("word"), "word",
        Seq(("e", "s"), ("es", "t"), ("l", "o")))
      .select("sym").head().getString(0)
    assert(out === "lo w est")
  }

  test("BPE mergePair is greedy left-to-right on repeat chains") {
    import spark.implicits._
    val out = Seq("z z z", "z z z z").toDF("s")
      .select(graft.text.Bpe.mergePair(
        org.apache.spark.sql.functions.col("s"),
        org.apache.spark.sql.functions.lit("z"),
        org.apache.spark.sql.functions.lit("z")).as("m"))
      .collect().map(_.getString(0))
    assert(out === Seq("zz z", "zz zz"))
  }

  test("sim_recall_lsh: one row per query, hits <= k, recall_bp = hits * 2000") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("sim_recall_lsh")(spark, sf).collect()
    val nQueries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 25 === 0).count()
    assert(rows.length.toLong === nQueries)
    rows.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0L && hits <= 5L)
      assert(r.getLong(2) === hits * 2000L)
    }
  }

  override def afterAll(): Unit = spark.stop()
}
