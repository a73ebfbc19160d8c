package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Unigram

/** Laws of the unigram-LM Viterbi segmenter ([[graft.text.Unigram]]):
  * the DP finds the minimum-cost segmentation on a hand-computed
  * fixture, equal-cost ties break on the lexicographically smallest
  * path, single characters always keep words segmentable, and the
  * vocabulary induction reproduces hand counts.
  */
class TokenizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-tokenize")

  override def afterAll(): Unit = spark.stop()

  private def vocabDF(entries: (String, Long)*) = {
    import spark.implicits._
    entries.toDF("piece", "cost")
  }

  test("Viterbi picks the minimum-cost segmentation") {
    import spark.implicits._
    // "abc": a+b+c = 15, ab+c = 13, a+bc = 14, abc = 20 → "ab c"
    val vocab = vocabDF("a" -> 5L, "b" -> 5L, "c" -> 5L,
      "ab" -> 8L, "bc" -> 9L, "abc" -> 20L)
    val got = Unigram.segmentWords(Seq("abc").toDF("word"), vocab,
        maxPieceLen = 3, maxWordLen = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(got.toSeq == Seq(("abc", 13L, 2L, "ab c")))
  }

  test("equal-cost ties break on the lexicographically smallest path") {
    import spark.implicits._
    // "aa": "a a" cost 4 vs "aa" cost 4 — path "a a" < "aa" wins
    val vocab = vocabDF("a" -> 2L, "aa" -> 4L)
    val got = Unigram.segmentWords(Seq("aa").toDF("word"), vocab,
        maxPieceLen = 2, maxWordLen = 4)
      .collect().map(r => (r.getLong(1), r.getString(3)))
    assert(got.toSeq == Seq((4L, "a a")))
  }

  test("single-char fallback segments words no multi-char piece covers") {
    import spark.implicits._
    val vocab = vocabDF("x" -> 9L, "y" -> 9L, "z" -> 9L)
    val got = Unigram.segmentWords(Seq("xyz", "zz").toDF("word"), vocab,
        maxPieceLen = 4, maxWordLen = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(3))))
      .toMap
    assert(got("xyz") == ((27L, "x y z")))
    assert(got("zz") == ((18L, "z z")))
  }

  test("vocabulary induction counts substring occurrences by word freq") {
    import spark.implicits._
    // words: "ab" freq 3, "ba" freq 2 → pieces: a: 3+2=5, b: 3+2=5,
    // ab: 3, ba: 2; with minCount=3 the piece "ba" (freq 2) is dropped
    // but single chars survive regardless.
    val wf = Seq(("ab", 3L), ("ba", 2L)).toDF("word", "freq")
    val got = Unigram.pieceVocab(wf, maxPieceLen = 2, minCount = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("a", "b", "ab"))
    // cost = max(1, 40 - bitlen(freq)): freq 5 → bitlen 3 → 37;
    // freq 3 → bitlen 2 → 38
    assert(got("a") == 37L && got("b") == 37L && got("ab") == 38L)
  }

  test("DP rounds settle exactly at word length (all-1-char worst case)") {
    import spark.implicits._
    val vocab = vocabDF("q" -> 1L)
    val got = Unigram.segmentWords(Seq("qqqqqqqq").toDF("word"), vocab,
        maxPieceLen = 4, maxWordLen = 8)
      .collect()
    assert(got.length == 1 && got.head.getLong(2) == 8L,
      "8-char word over a 1-char vocab needs all 8 rounds")
  }
}
