package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Importance, Privacy}

/** Privacy + importance-selection semantics on hand-built rows — the PII
  * shapes the synthetic corpus cannot carry (emails, SSNs, phones, IPs),
  * scrub idempotence, pseudonym stability, and the DSIR weight-sign /
  * trimmed-model invariants.
  */
class CurateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-curate-test")

  test("scrubPii: every default class redacted, surrounding text kept") {
    import spark.implicits._
    val rows = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "ssn 123-45-6789 on file",
      "call 25-989-741-2988 now",
      "host 10.0.255.3 unreachable",
      "plain text stays").toDF("text")
    val out = rows.select(Privacy.scrubPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(out === Seq(
      "mail me at <EMAIL> today",
      "ssn <SSN> on file",
      "call <PHONE> now",
      "host <IP> unreachable",
      "plain text stays"))
  }

  test("scrubPii is idempotent and piiCounts matches the redactions") {
    import spark.implicits._
    val rows = Seq(
      "a@b.co and c@d.net and 1.2.3.4 and 123-45-6789").toDF("text")
    val once = rows.select(Privacy.scrubPii(col("text")).as("t"))
    val twice = once.select(Privacy.scrubPii(col("t")).as("t"))
    assert(once.collect().map(_.getString(0)).toSeq ===
      twice.collect().map(_.getString(0)).toSeq)
    val c = rows.select(Privacy.piiCounts(col("text")).as("c"))
      .select("c.n_email", "c.n_ssn", "c.n_phone", "c.n_ip")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(c === Array((2L, 1L, 0L, 1L)))
  }

  test("phone/SSN digit-group shapes are disjoint (no cross-matching)") {
    import spark.implicits._
    val rows = Seq("25-989-741-2988", "123-45-6789").toDF("text")
    val out = rows.select(Privacy.scrubPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(out === Seq("<PHONE>", "<SSN>"))
  }

  test("pseudonymize: stable under same salt, distinct under rotation") {
    import spark.implicits._
    val ids = Seq("Customer#000000007", "Customer#000000008").toDF("id")
    val a = ids.select(Privacy.pseudonymize(col("id"), "s1").as("p"))
      .collect().map(_.getString(0))
    val b = ids.select(Privacy.pseudonymize(col("id"), "s1").as("p"))
      .collect().map(_.getString(0))
    val rot = ids.select(Privacy.pseudonymize(col("id"), "s2").as("p"))
      .collect().map(_.getString(0))
    assert(a.toSeq === b.toSeq)          // stable → joinable across tables
    assert(a.toSet.intersect(rot.toSet).isEmpty) // rotation severs linkage
    assert(a.distinct.length === a.length)       // injective on the sample
  }

  test("kAnonymityAudit: class sizes and the meets_k gate") {
    import spark.implicits._
    val released = Seq(
      ("a", 0L), ("a", 0L), ("a", 0L),
      ("b", 0L)).toDF("seg", "band")
    val out = Privacy.kAnonymityAudit(released, Seq("seg", "band"), k = 2L)
      .orderBy("seg")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out === Array(("a", 3L, 1L), ("b", 1L, 0L)))
  }

  test("tokenWeights: sign tracks the probability ratio; weights sum to 0") {
    import spark.implicits._
    // target: "x x y" → p(x)=2/3, p(y)=1/3; raw: "x y y" → p(x)=1/3
    val docs = Seq(
      (1L, "x x y", "tgt"),
      (2L, "x y y", "raw")).toDF("doc_id", "text", "src")
    val w = Importance.tokenWeights(docs, col("src") === "tgt")
      .orderBy("tok")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // w(x) = ct·NR − cr·NT = 2·3 − 1·3 = 3 > 0 (target-heavier)
    // w(y) = 1·3 − 2·3 = −3 < 0 (raw-heavier); Σ over vocab = 0 always:
    // Σ ct·NR = NT·NR = Σ cr·NT.
    assert(w === Array(("x", 3L), ("y", -3L)))
  }

  test("selectTopAffinity: trimmed model scores only in-model tokens; " +
      "full and generous-trim selections agree") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x", "tgt"),
      (2L, "x x y", "raw"),
      (3L, "y y y", "raw"),
      (4L, "x y y", "raw")).toDF("doc_id", "text", "src")
    val full = Importance.selectTopAffinity(docs, col("src") === "tgt",
        keepDenom = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // a trim wide enough to hold the whole vocab changes nothing
    val wide = Importance.selectTopAffinity(docs, col("src") === "tgt",
        keepDenom = 3L, modelTopK = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(full.toSeq === wide.toSeq)
    // top-1/3 of the 3 raw docs = the single most target-like (doc 2)
    assert(full.map(_._1).toSeq === Seq(2L))
  }
}
