package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Cleaning
import graft.plans.TextKernels

/** Property-based specs (SURVEY §5: dedup idempotence, null-fill totality)
  * over generated inputs — invariants that must hold for ANY data, not
  * just the fixtures. */
class PropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("2", "graft-prop-test")

  /** Deterministic mini property driver (the scalatest-scalacheck bridge
    * isn't resolvable offline): n generated cases with fixed seeds. */
  private def forAll[T](gen: Gen[T], n: Int = 10)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default.withSize(20), Seed(i.toLong)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val rowGen: Gen[(Long, Option[String], Option[Double])] = for {
    id <- Gen.choose(0L, 5L)
    name <- Gen.option(Gen.oneOf("a", "b", "c"))
    score <- Gen.option(Gen.choose(-10.0, 10.0))
  } yield (id, name, score)

  private val dfGen: Gen[Seq[(Long, Option[String], Option[Double])]] =
    Gen.listOfN(12, rowGen)

  private def toDf(rows: Seq[(Long, Option[String], Option[Double])]): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2.orNull,
        r._3.map(Double.box).orNull)).asJava, schema)
  }

  test("property: removeDuplicates is idempotent and row-minimal") {
    forAll(dfGen) { rows =>
      val df = toDf(rows)
      val once = Cleaning.removeDuplicates()(df)
      val twice = Cleaning.removeDuplicates()(once)
      assert(once.count() == twice.count())
      assert(once.count() == rows.distinct.size)
    }
  }

  test("property: handleNulls is total — no nulls remain") {
    forAll(dfGen) { rows =>
      val filled = Cleaning.handleNulls()(toDf(rows))
      assert(filled.filter(
        col("name").isNull || col("score").isNull || col("id").isNull)
        .count() == 0)
      assert(filled.count() == rows.size, "fill must not drop rows")
    }
  }

  test("property: latestByKey yields exactly one row per key, from the input") {
    forAll(dfGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = toDf(rows)
        val out = Cleaning.latestByKey(Seq("id"),
          Seq(col("name"), col("score")))(df).collect()
        val keys = rows.map(_._1).distinct
        assert(out.length == keys.size)
        val inputSet = rows.map(r => (r._1, r._2.orNull,
          r._3.map(Double.box).orNull)).toSet
        assert(out.forall(r =>
          inputSet.contains((r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) null else Double.box(r.getDouble(2))))))
      }
    }
  }

  test("property: shingle kernel matches a naive specification") {
    val textGen = Gen.listOfN(8, Gen.oneOf("x", "y", "zz", ""))
      .map(_.mkString(" "))
    forAll(textGen) { text =>
      val kernel = TextKernels.shingles(text, 3).toSeq
      val toks = text.split(" ", -1)
      val naive = if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(kernel == naive)
    }
  }

  test("property: minhash signatures are permutation-invariant over sets") {
    val setGen = Gen.nonEmptyListOf(Gen.oneOf("p", "q", "r", "s", "t"))
      .map(_.distinct)
    forAll(setGen) { shingleSet =>
      val a = TextKernels.minhash(shingleSet.toArray, 8).toSeq
      val b = TextKernels.minhash(shingleSet.reverse.toArray, 8).toSeq
      assert(a == b, "signature must not depend on shingle order")
    }
  }

  test("property: 64-bit simhash banding never misses a pair within the Hamming budget") {
    // pigeonhole soundness of simhashPairs' candidate generation: flip at
    // most maxHamming=3 of 64 bits and at least one 16-bit band must
    // still match exactly — for ANY base signature, including ones with
    // the sign bit set.
    val caseGen = for {
      base <- Gen.choose(Long.MinValue, Long.MaxValue)
      k <- Gen.choose(0, 3)
      bits <- Gen.listOfN(k, Gen.choose(0, 63))
    } yield (base, bits.foldLeft(base)((b, j) => b ^ (1L << j)))
    forAll(caseGen, n = 50) { case (a, b) =>
      val bandsMatch = (0 until 4).exists(i =>
        ((a >>> (i * 16)) & 0xffffL) == ((b >>> (i * 16)) & 0xffffL))
      assert(bandsMatch, s"banding missed pair $a / $b")
    }
  }

  test("property: prefix-filtered jaccard equals the naive join on random corpora") {
    // The prefix-filter lemma must hold for ANY corpus and threshold —
    // duplicate-heavy, near-identical, and disjoint docs alike — not
    // just the testdata fixtures (ExtensionsSpec covers those).
    import spark.implicits._
    val docGen = Gen.listOfN(10,
      Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
    val caseGen = for {
      docs <- docGen
      tau <- Gen.oneOf(0.5, 0.7, 0.8, 0.9)
    } yield (docs, tau)
    forAll(caseGen, n = 5) { case (docs, tau) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def rows(r: DataFrame) = r.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
      assert(
        rows(graft.dedup.Dedup.jaccardPairsPrefix(df, "doc_id", "text", 3, tau)) ==
          rows(graft.dedup.Dedup.jaccardPairs(df, "doc_id", "text", 3, tau)),
        s"prefix/naive divergence at tau=$tau on $docs")
    }
  }

  test("property: large-star/small-star CC equals min-label propagation") {
    import spark.implicits._
    import graft.dedup.Dedup
    // random multigraphs with self-loops filtered — clusters must agree
    // edge-for-edge with the propagation labels on ANY shape
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    forAll(edgeGen, n = 5) { rawPairs =>
      val pairs = rawPairs.filter { case (a, b) => a != b }
      whenever(pairs.nonEmpty) {
        val df = pairs.toDF("id_a", "id_b")
        val prop = Dedup
          .connectedComponents(df, maxIter = 40, shallowRounds = 40)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val star = Dedup.connectedComponentsStar(df)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(star == prop, s"star/propagation divergence on $pairs")
      }
    }
    // adversarial diameter: a 60-edge chain needs 60 propagation rounds
    // but O(log n) star rounds — this also exercises the auto-switch in
    // connectedComponents (shallowRounds default 8 < diameter)
    val chainDf = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val viaAuto = Dedup.connectedComponents(chainDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAuto == (0L to 60L).map(i => (i, 0L)).toSet,
      "auto-switched chain must collapse to cluster 0")
  }

  test("property: greedy packing never overflows a bin (except oversized docs)") {
    import spark.implicits._
    val budget = 20L
    // token counts spanning under- and over-budget docs
    val lenGen = Gen.listOfN(30, Gen.choose(1, 30))
    forAll(lenGen, n = 5) { lens =>
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val packed = graft.text.Corpus.packGreedy(docs, budget, shards = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(packed.length == lens.length, "every doc must land in a bin")
      packed.groupBy(p => (p._2, p._3)).foreach { case ((shard, bin), members) =>
        val total = members.map(_._4).sum
        assert(total <= budget || members.length == 1,
          s"bin ($shard,$bin) holds $total tokens over budget $budget " +
            s"with ${members.length} docs")
      }
      // bins fill greedily in id order: replay the fold per shard
      packed.groupBy(_._2).foreach { case (_, members) =>
        val sorted = members.sortBy(_._1)
        var bin = 0L; var cum = 0L; var first = true
        sorted.foreach { case (_, _, actualBin, len) =>
          if (first) { cum = len; first = false }
          else if (cum + len > budget) { bin += 1; cum = len }
          else cum += len
          assert(actualBin == bin, "bin assignment must match the greedy fold")
        }
      }
    }
  }

  test("property: simhash is invariant to token order and multiplicity") {
    import org.apache.spark.unsafe.types.UTF8String
    val tokGen = Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "e"))
    forAll(tokGen) { toks =>
      val base = TextKernels.simhash64(UTF8String.fromString(toks.mkString(" ")))
      val shuffled = TextKernels.simhash64(
        UTF8String.fromString(toks.reverse.mkString(" ")))
      val duped = TextKernels.simhash64(
        UTF8String.fromString((toks ++ toks.headOption).mkString(" ")))
      assert(base == shuffled, "signature must not depend on token order")
      assert(base == duped, "signature votes over DISTINCT tokens")
    }
  }

  test("property: vector kernels match the interpreted HOF folds on random vectors") {
    import graft.sim.Similarity
    // random float embeddings incl. negatives/zeros — the kernel contract
    // is bit-identity with the interpreted fold, not approximate equality
    val vecGen = Gen.listOfN(4,
      Gen.listOfN(8, Gen.oneOf(Gen.choose(-3.0f, 3.0f), Gen.const(0.0f))))
    forAll(vecGen, n = 5) { vecs =>
      whenever(vecs.forall(v => v.exists(_ != 0.0f))) {
        import spark.implicits._
        val df = vecs.zipWithIndex
          .map { case (v, i) => (i.toLong, v.toArray) }
          .toDF("vec_id", "embedding")
        val nrm = Similarity.normalized(df).as("f")
          .join(Similarity.normalizedHof(df).as("h"), col("f.id") === col("h.id"))
        assert(nrm.filter(col("f.nv") =!= col("h.nv")).count() == 0)
        val dots = Similarity.normalized(df)
          .select(Similarity.dot(col("nv"), col("nv")).as("slow"),
            Similarity.dotFast(col("nv"), col("nv")).as("fast"),
            Similarity.lshSignatureHof(col("nv"), 16, 8).as("sslow"),
            Similarity.lshSignature(col("nv"), 16, 8).as("sfast"))
        assert(dots.filter(col("slow") =!= col("fast") ||
          col("sslow") =!= col("sfast")).count() == 0)
      }
    }
  }

  test("property: pageRank mass bounds and determinism on random graphs") {
    import spark.implicits._
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.nonEmptyListOf(for {
        u <- Gen.choose(0L, 9L); v <- Gen.choose(0L, 9L) if u != v
      } yield (u, v))
    forAll(edgeGen, n = 5) { es =>
      whenever(es.nonEmpty) {
        // undirected closure: every node has out-edges, so total mass is
        // conserved up to floor losses: n·150000 ≤ Σscore ≤ n·10⁶
        val edges = (es ++ es.map(_.swap)).toDF("src", "dst")
        val out = graft.graph.Graph.pageRank(edges, iters = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
        val n = out.size
        val total = out.map(_._2).sum
        assert(total <= n * 1000000L,
          s"mass created: $total > ${n * 1000000L}")
        assert(total >= n * 150000L, s"more than damped mass lost: $total")
        assert(out.forall(_._2 >= 150000L), "every node keeps the base rank")
        // bit-determinism: a rerun yields the identical fixed-point scores
        val again = graft.graph.Graph.pageRank(edges, iters = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
        assert(out == again)
      }
    }
  }

  test("property: span report/scrub invariants hold on random corpora") {
    import graft.dedup.Dedup
    val n = 3
    // small alphabet + short docs → dense duplicate structure
    val docGen = Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c")).map(_.take(8)))
    forAll(docGen, n = 8) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val report = Dedup.duplicateNgramSpans(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val scrub = Dedup.removeDuplicateNgramSpans(df, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      texts.indices.foreach { i =>
        val id = i.toLong
        val (total, dup, spans, bp) = report(id)
        val (clean, nTok, nRem) = scrub(id)
        assert(dup <= total && spans <= dup)
        assert(bp == (if (total == 0) 0L else dup * 10000 / total))
        // every dup position covers n tokens; covers can overlap but a
        // nonempty mark set removes at least one full n-gram
        if (dup > 0) assert(nRem >= n && nRem <= math.min(nTok, n * dup))
        else assert(nRem == 0L)
        // the rebuilt text is the kept tokens in original order
        val kept = if (clean.isEmpty) 0L else clean.split(" ").length.toLong
        assert(kept == nTok - nRem)
        // order preserved even when non-contiguous: kept tokens are a
        // subsequence of the original
        assert(clean.isEmpty ||
          isSubsequence(clean.split(" "), texts(i).toArray))
      }
    }
  }

  private def isSubsequence(sub: Array[String], full: Array[String]): Boolean = {
    var j = 0
    full.foreach { t => if (j < sub.length && sub(j) == t) j += 1 }
    j == sub.length
  }

  test("property: BPE mergePair preserves character content and only removes spaces") {
    import graft.text.Bpe
    import spark.implicits._
    val symGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "ab", "c")).map(_.take(8))
    forAll(symGen, n = 8) { syms =>
      val sym = syms.mkString(" ")
      val out = Seq(sym).toDF("s")
        .select(Bpe.mergePair(col("s"), lit("a"), lit("b")).as("m"))
        .head().getString(0)
      assert(out.replace(" ", "") == sym.replace(" ", ""),
        s"character content changed: '$sym' -> '$out'")
      // merged token count = original minus number of disjoint (a,b)
      // adjacencies taken greedily left-to-right
      var i = 0
      var merges = 0
      while (i < syms.length - 1) {
        if (syms(i) == "a" && syms(i + 1) == "b") { merges += 1; i += 2 }
        else i += 1
      }
      assert(out.split(" ").length == syms.length - merges,
        s"greedy merge count mismatch: '$sym' -> '$out'")
    }
  }

  override def afterAll(): Unit = spark.stop()
}
