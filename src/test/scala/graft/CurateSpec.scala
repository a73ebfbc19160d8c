package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Corpus, Importance, Privacy}

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

  test("shardPlan: masses sum to the corpus, skew_bp centers on 10000") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, 10L + i % 7)).toDF("id", "w")
    val plan = graft.text.Corpus.shardPlan(docs, "id", "w", 8).collect()
    assert(plan.map(_.getLong(0)).forall(s => s >= 0 && s < 8))
    assert(plan.map(_.getLong(1)).sum === 200L)
    val totW = docs.agg(sum("w")).head().getLong(0)
    assert(plan.map(_.getLong(2)).sum === totW)
    // every shard's skew is the integer ratio vs the fair share
    plan.foreach { r =>
      assert(r.getLong(4) === r.getLong(2) * 10000L * 8L / totW)
    }
  }

  test("sampleWeighted: nested samples, partitioning-independent, " +
      "weight-1 degrades to sampleUniform") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, 1L + i % 5)).toDF("id", "w")
    val s10 = Corpus.sampleWeighted(docs, "id", "w", 10)
      .collect().map(_.getLong(0)).toSeq
    val s25 = Corpus.sampleWeighted(docs, "id", "w", 25)
      .collect().map(_.getLong(0)).toSeq
    assert(s25.take(10) === s10, "growing k must keep the old sample as a prefix")
    val rep = Corpus.sampleWeighted(docs.repartition(13), "id", "w", 10)
      .collect().map(_.getLong(0)).toSeq
    assert(rep === s10, "sample must not depend on partitioning")
    val ones = docs.withColumn("w", lit(1L))
    val wOne = Corpus.sampleWeighted(ones, "id", "w", 10)
      .collect().map(_.getLong(0)).toSeq
    val uni = Corpus.sampleUniform(docs, "id", 10)
      .collect().map(_.getLong(0)).toSeq
    assert(wOne === uni, "weight 1 must reproduce the uniform sample")
  }

  test("mmrSelect: first pick is pure relevance; low lambda prefers a " +
      "diverse vector over an exact duplicate of the first pick") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),  // the query
      (1L, Array(1.0f, 0.0f)),  // identical direction: rel 1
      (2L, Array(1.0f, 0.0f)),  // duplicate of 1: rel 1, sim(1,2)=1
      (3L, Array(0.0f, 1.0f))   // orthogonal: rel 0
    ).toDF("vec_id", "embedding")
    val picks = graft.sim.Similarity
      .mmrSelect(vecs, queryId = 0L, k = 3, lambdaBp = 3000)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // rank1 = argmax rel (id tiebreak) = 1; rank2: dup 2 scores
    // 0.3·1 − 0.7·1 = −0.4 < orthogonal 3's 0.3·0 − 0.7·0 = 0 → 3 wins
    assert(picks === Seq(1L, 3L, 2L))
    val greedy = graft.sim.Similarity
      .mmrSelect(vecs, queryId = 0L, k = 2, lambdaBp = 10000)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // λ=1 disables the penalty: pure relevance order, dup included
    assert(greedy === Seq(1L, 2L))
  }

  test("mmrSelect: exhaustion returns existing picks; absent query returns empty") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.6f, 0.8f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val over = graft.sim.Similarity
      .mmrSelect(vecs, queryId = 0L, k = 5, lambdaBp = 7000)
      .collect()
    assert(over.length === 2, "k past the candidate count returns what exists")
    assert(over.map(_.getInt(0)).toSeq === Seq(1, 2))
    val none = graft.sim.Similarity
      .mmrSelect(vecs, queryId = 99L, k = 3, lambdaBp = 7000)
      .collect()
    assert(none.isEmpty, "a queryId absent from the corpus yields no picks")
  }

  test("kmvJaccard: exact when both sides fit inside k") {
    import spark.implicits._
    val a = Seq("a", "b", "c", "d", "a").toDF("tok") // {a b c d}
    val b = Seq("c", "d", "e", "f").toDF("tok")      // {c d e f}
    val r = graft.sketch.Sketch.kmvJaccard(a, b, "tok", k = 256).head()
    assert(r.getAs[Long]("k_eff") === 6L)   // |union| < k → sketch IS the set
    assert(r.getAs[Long]("n_inter") === 2L) // {c, d}
    assert(r.getAs[Long]("jacc_bp") === 2L * 10000L / 6L)
  }
}
