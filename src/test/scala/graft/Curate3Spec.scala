package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.Sketch
import graft.text.Corpus

/** Law-based semantics for the round-9 part-3 operators: CDC
  * shift-invariance, KMV matrix exactness/degeneracy, nDCG bounds, and
  * the leakage-free-split guarantee (no near-dup pair straddles a
  * split).
  */
class Curate3Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-c3-test")
  private val sf = "/root/testdata/sf0.001"

  test("chunkCdc: prepending a paragraph preserves every chunk hash " +
    "below the first boundary (shift invariance)") {
    import spark.implicits._
    val base = (1 to 200).map(i => s"tok${i % 37}w$i").mkString(" ")
    val shifted = "intro words inserted at the very top " + base
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val chunks = Corpus.chunkCdc(df, "doc_id", "text", modulus = 7)
      .select("doc_id", "chunk_id", "chunk_hash")
      .collect()
    val a = chunks.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    val b = chunks.filter(_.getLong(0) == 2L).map(_.getString(2)).toSet
    assert(a.length >= 3, s"need >=3 chunks in the base doc, got ${a.length}")
    // Every base chunk EXCEPT the first (whose start merges with the
    // inserted prefix) must reappear verbatim in the shifted doc.
    val tail = a.drop(1).map(_.getString(2))
    assert(tail.forall(b.contains),
      s"shifted doc lost ${tail.count(h => !b.contains(h))} content chunks")
  }

  test("chunkCdc: chunks tile the document — counts sum to token count, " +
    "starts are consistent") {
    import spark.implicits._
    val text = (1 to 120).map(i => s"w${i % 23}x$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Corpus.chunkCdc(df, "doc_id", "text", modulus = 5)
      .orderBy("chunk_id")
      .select("start_pos", "n_tok")
      .collect()
    assert(rows.map(_.getLong(1)).sum == 120L)
    // each chunk starts where the previous ended
    rows.sliding(2).foreach {
      case Array(p, n) =>
        assert(n.getLong(0) == p.getLong(0) + p.getLong(1))
      case _ => ()
    }
    assert(rows.head.getLong(0) == 0L)
  }

  test("kmvJaccardMatrix: identical groups score 10000 bp, disjoint " +
    "groups 0, and the estimate is exact under k") {
    import spark.implicits._
    val toks =
      (1 to 50).flatMap(i => Seq(("a", s"t$i"), ("b", s"t$i"))) ++
        (1 to 50).map(i => ("c", s"z$i")) ++
        (1 to 25).map(i => ("d", s"t$i")) // half of a/b
    val m = Sketch.kmvJaccardMatrix(toks.toDF("g", "tok"), k = 128)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4))
      .toMap
    assert(m(("a", "b")) == 10000L)
    assert(m(("a", "c")) == 0L)
    assert(m(("b", "c")) == 0L)
    // |a ∪ d| = 50, |a ∩ d| = 25 → exactly 5000 bp (both sides < k)
    assert(m(("a", "d")) == 5000L)
  }

  test("c_split_leakfree: no near-dup pair straddles a split, and the " +
    "split is the cluster representative's bucket") {
    val splits = SparkEntry.queries("c_split_leakfree")(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = SparkEntry.queries("d_minhash_lsh")(spark, sf)
      .select("id_a", "id_b")
    assert(pairs.count() > 0, "testdata lost its near-dup pairs")
    val straddle = pairs
      .join(splits.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "split_a"), Seq("id_a"))
      .join(splits.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "split_b"), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddle == 0L, s"$straddle near-dup pairs straddle splits")
    // contrast: the naive per-doc split DOES straddle on this corpus —
    // the failure mode this operator exists to close (if the corpus
    // ever stops exhibiting it, the test should tell us the premise
    // changed rather than silently passing).
    val naive = Corpus.splitByHash(
      graft.Tables.documents(spark, sf).select("doc_id"), "doc_id")
      .select(col("doc_id"), col("split"))
    val naiveStraddle = pairs
      .join(naive.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "split_a"), Seq("id_a"))
      .join(naive.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "split_b"), Seq("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(naiveStraddle > 0L,
      "corpus no longer shows naive-split leakage; premise changed")
  }

  test("e_attribution: first/last-touch conserve total purchase value; " +
    "linear loses only sub-micro-cent remainders") {
    import spark.implicits._
    val out = SparkEntry.queries("e_attribution")(spark, sf).collect()
    val totalCents = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")))
      .as[Long].head()
    assert(out.map(_.getLong(1)).sum == totalCents, "first-touch leaks value")
    assert(out.map(_.getLong(2)).sum == totalCents, "last-touch leaks value")
    val lin = out.map(_.getLong(3)).sum
    // each purchase drops < n_touches micro-cents of remainder; bound
    // loosely by purchases × max-touches-per-hour being far under 1 cent
    // per purchase at this SF
    assert(lin <= totalCents * 1000000L)
    assert(totalCents * 1000000L - lin < totalCents * 1000L,
      s"linear model lost more than rounding: $lin vs ${totalCents * 1000000L}")
    assert(out.map(_.getString(0)).toSet ==
      Set("view", "click", "signup", "direct"))
  }

  test("chunkCdc dedup: planted doc copy is fully reclaimable at the " +
    "chunk level") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"tok${i % 31}q$i").mkString(" ")
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val cdc = Corpus.chunkCdc(df, "doc_id", "text", modulus = 7)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("chunk_hash").orderBy(col("doc_id"), col("start_pos"))
    val removable = cdc.withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .agg(sum("n_tok")).as[Long].head()
    assert(removable == 150L, s"expected the full copy (150 tok), got $removable")
  }

  test("t_ndcg: bounded by 10000 bp, zero on the no-relevance query, " +
    "and IDCG prefix sums are internally consistent") {
    val rows = SparkEntry.queries("t_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRel, dcg, idcg, ndcg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ndcg >= 0L && ndcg <= 10000L, s"ndcg_bp out of range: $ndcg")
      assert(dcg <= idcg, s"DCG $dcg exceeds ideal $idcg")
      if (nRel == 0L) {
        assert(dcg == 0L && idcg == 0L && ndcg == 0L)
      } else {
        assert(idcg > 0L)
      }
    }
    val q4 = rows.find(_.getLong(0) == 4L).get
    assert(q4.getLong(1) == 0L && q4.getLong(4) == 0L)
  }
}
