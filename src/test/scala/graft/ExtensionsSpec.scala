package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.mm.Multimodal
import graft.sim.Similarity
import graft.text.Text

/** Specs for the LLM-data-pipeline extension operators (text analysis,
  * dedup, similarity, multimodal) over the sf0.001 testdata. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = Sessions.local("4", "graft-ext-test")
  private val sf = "/root/testdata/sf0.001"

  test("rollingHash: order-sensitive, deterministic") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c"), (2L, "c b a"), (3L, "a b c"))).toDF("id", "text")
    val out = df.select(col("id"), Text.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(3L), "same text, same hash")
    assert(out(1L) != out(2L), "reordered text, different hash")
  }

  test("bagOfWordsFingerprint: order- and multiplicity-insensitive") {
    val df = spark.createDataFrame(Seq(
      (1L, "a b c"), (2L, "c b a a"), (3L, "a b d"))).toDF("id", "text")
    val out = df.select(col("id"), Text.bagOfWordsFingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("langId: stopword argmax with en tie priority") {
    val df = spark.createDataFrame(Seq(
      (1L, "the cat of the house"), (2L, "el gato de la casa"),
      (3L, "xyzzy qwerty"))).toDF("id", "text")
    val out = df.select(col("id"), Text.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "es" && out(3L) == "und")
  }

  test("shingles: short docs yield empty set, not descending-sequence junk") {
    val df = spark.createDataFrame(Seq((1L, "a b"), (2L, "a b c d")))
      .toDF("id", "text")
    val out = df.select(col("id"),
        Dedup.shingles(Text.tokens(col("text")), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty)
    assert(out(2L) == Seq("a b c", "b c d"))
  }

  test("custom expressions are bit-identical to the HOF formulations") {
    val docs = Tables.documents(spark, sf)
    val both = docs.select(
      Dedup.shingles(graft.text.Text.tokens(col("text")), 3).as("slow_sh"),
      Dedup.shinglesFast(col("text"), 3).as("fast_sh"))
    assert(both.filter(col("slow_sh") =!= col("fast_sh")).count() == 0)
    val sigs = docs.select(
      Dedup.minhashSignature(Dedup.shinglesFast(col("text"), 3), 16).as("slow_sig"),
      Dedup.minhashSigFast(Dedup.shinglesFast(col("text"), 3), 16).as("fast_sig"))
    assert(sigs.filter(col("slow_sig") =!= col("fast_sig")).count() == 0)
    val simhashes = Dedup.simhashTable(docs, "doc_id", "text").as("f")
      .join(Dedup.simhashTableHof(docs, "doc_id", "text").as("h"),
        col("f.id") === col("h.id"))
    assert(simhashes.filter(col("f.simhash") =!= col("h.simhash")).count() == 0)
    val emb = Tables.embeddings(spark, sf)
    val nrm = Similarity.normalized(emb).as("f")
      .join(Similarity.normalizedHof(emb).as("h"), col("f.id") === col("h.id"))
    assert(nrm.filter(col("f.nv") =!= col("h.nv")).count() == 0)
    val dots = Similarity.normalized(emb)
      .select(Similarity.dot(col("nv"), col("nv")).as("slow"),
        Similarity.dotFast(col("nv"), col("nv")).as("fast"))
    assert(dots.filter(col("slow") =!= col("fast")).count() == 0)
    val sigs2 = Similarity.normalized(emb)
      .select(Similarity.lshSignatureHof(col("nv"), 16, 64).as("slow"),
        Similarity.lshSignature(col("nv"), 16, 64).as("fast"))
    assert(sigs2.filter(col("slow") =!= col("fast")).count() == 0)
    // md5_bucket kernel vs the conv/substring/pmod Column form, over
    // long keys, negative longs, and string keys
    val buckets = Seq(2, 7, 100)
    val keys = spark.range(-500, 500).select(col("id"),
      concat(lit("k"), col("id")).as("s"))
    buckets.foreach { b =>
      assert(keys.filter(
        graft.text.Corpus.hashBucket(col("id"), b) =!=
          graft.text.Corpus.hashBucketHof(col("id"), b)).count() == 0,
        s"md5_bucket($b) drifted from the HOF form on longs")
      assert(keys.filter(
        graft.text.Corpus.hashBucket(col("s"), b) =!=
          graft.text.Corpus.hashBucketHof(col("s"), b)).count() == 0,
        s"md5_bucket($b) drifted from the HOF form on strings")
    }
  }

  test("bigrams_arr kernel is bit-identical to the HOF formulations") {
    val docs = Tables.documents(spark, sf)
    // pair form vs the slice/transform HOF (multiset equality)
    val fast = graft.text.Lm.bigrams(docs)
    val slow = graft.text.Lm.bigramsHof(docs)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "bigrams_arr drifted from the transform/slice HOF form")
    // positional form vs the sequence/transform HOF (p = 1-based pos of w2)
    val fastPos = docs.select(col("doc_id"),
        explode(Text.bigramsArr(col("text"), withPos = true)).as("b"))
      .select(col("doc_id"), col("b.p"), col("b.w1"), col("b.w2"))
    val slowPos = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), expr(
        """explode(transform(sequence(1, size(t) - 1),
             i -> struct(i AS p, t[i - 1] AS w1, t[i] AS w2)))""").as("b"))
      .select(col("doc_id"), col("b.p"), col("b.w1"), col("b.w2"))
    assert(fastPos.exceptAll(slowPos).isEmpty &&
      slowPos.exceptAll(fastPos).isEmpty,
      "positional bigrams_arr drifted from the sequence/transform HOF form")
    // empty and single-token docs yield no rows, matching the HOF forms
    val edge = spark.createDataFrame(Seq((1L, ""), (2L, "solo"),
      (3L, "a b"))).toDF("doc_id", "text")
    val edgeRows = graft.text.Lm.bigrams(edge).collect()
    assert(edgeRows.length == 1 &&
      edgeRows(0).getString(1) == "a" && edgeRows(0).getString(2) == "b")
  }

  test("text-stats/quality/langId kernels are bit-identical to the HOF formulations") {
    val docs = Tables.documents(spark, sf)
    val en = Text.langStopwords.toMap.apply("en")
    val st = Text.textStatsFast(col("text"))
    val qs = Text.qualityStatsFast(col("text"), en)
    val both = docs.select(
      Text.tokenCount(col("text")).as("h_nt"),
      Text.distinctTokenCount(col("text")).as("h_nd"),
      Text.typeTokenRatio(col("text")).as("h_ttr"),
      Text.avgTokenLen(col("text")).as("h_avg"),
      Text.stopwordHits(col("text"), en).as("h_hits"),
      Text.stopwordRatio(col("text"), en).as("h_sr"),
      Text.qualityScore(col("text"), en).as("h_q"),
      Text.langId(col("text")).as("h_lang"),
      st.getField("n_tokens").as("f_nt"),
      st.getField("n_distinct").as("f_nd"),
      st.getField("ttr").as("f_ttr"),
      st.getField("avg_tok_len").as("f_avg"),
      qs.getField("stop_hits").as("f_hits"),
      qs.getField("stop_ratio").as("f_sr"),
      qs.getField("quality").as("f_q"),
      Text.langIdFast(col("text")).as("f_lang"))
    // =!= (not a double-tolerance compare): the kernels must reproduce the
    // HOF doubles BIT-identically or the DuckDB oracle hashes diverge.
    for (c <- Seq("nt", "nd", "ttr", "avg", "hits", "sr", "q", "lang"))
      assert(both.filter(col(s"h_$c") =!= col(s"f_$c")).count() == 0,
        s"kernel field $c diverges from the HOF form")
  }

  test("extension-registered SQL functions work") {
    val n = spark.sql(
      "SELECT shingles('a b c d', 3) AS sh, minhash_sig(shingles('a b c d', 3), 4) AS sig")
      .selectExpr("size(sh) AS ns", "size(sig) AS nk").collect()(0)
    assert(n.getInt(0) == 2 && n.getInt(1) == 4)
    val v = spark.sql(
      """SELECT simhash64('a b c') AS sh,
                vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                vec_l2_normalize(array(3.0D, 4.0D)) AS nv,
                srp_signature(array(1.0D, 2.0D), 8, 2) AS sig""").collect()(0)
    assert(v.getDouble(1) == 11.0)
    assert(v.getSeq[Double](2) == Seq(0.6, 0.8))
    assert(v.getLong(0) != 0L)
  }

  test("minhashLshPairs recall vs exact jaccardPairs on testdata") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH+verify must not produce false positives")
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.8,
        s"LSH recall ${lsh.size}/${exact.size} below 0.8")
  }

  test("prefix-filtered jaccardPairs equals the naive all-pairs join exactly") {
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // same pairs AND same jaccard values — the prefix filter must be a
    // pure candidate-generation optimization, invisible in the output
    assert(rows(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8)) ==
      rows(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)))
    // and at a second threshold, where prefix lengths differ
    assert(rows(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)) ==
      rows(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)))
    // BOTH adaptive branches: dictVocabMax = 0 pins the prefix filter,
    // the default picks the broadcast-dictionary posting join on this
    // small-vocabulary corpus — identical output either way
    assert(rows(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 3, 0.8,
        dictVocabMax = 0L)) ==
      rows(Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)))
  }

  test("containmentPairs: dictionary and prefix branches agree exactly") {
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val dict = rows(graft.queries.OverlapQ.containmentPairs(docs, 9000L))
    val pref = rows(graft.queries.OverlapQ.containmentPairs(docs, 9000L,
      dictVocabMax = 0L))
    assert(dict == pref, "containment plan branches diverged")
    assert(dict.nonEmpty)
    // Σdf²-forced prefix route (budget below the corpus's Σdf²) is the
    // same exact relation — the huge-hot regime's branch, VERDICT r12 #4
    val df2Routed = rows(graft.queries.OverlapQ.containmentPairs(docs, 9000L,
      sumDf2Max = 1L))
    assert(dict == df2Routed, "Σdf²-routed prefix branch diverged")
  }

  test("wide ANN layout keeps occupancy bounded past the single-word clamp") {
    import graft.sim.AnnParams
    // Single-word ceiling: r clamps at 15, so occupancy grows linearly
    // past ~2.1M vectors; the wide ladder keeps it at target.
    def occupancy(n: Long, r: Int): Long = n / (1L << r)
    val n4m = 4000000L
    assert(AnnParams.bandBitsFor(n4m) == AnnParams.SlotBits,
      "4M vectors must saturate the single-word clamp")
    assert(occupancy(n4m, AnnParams.bandBitsFor(n4m)) >
      AnnParams.TargetOccupancy,
      "clamped layout is past its occupancy target at 4M — the ceiling")
    assert(occupancy(n4m, AnnParams.bandBitsForWide(n4m)) <=
      AnnParams.TargetOccupancy,
      "wide ladder must hold occupancy at target at 4M vectors")
    // ...and out to 10^9 (occupancy ≤ target until ~6.9e10)
    assert(occupancy(1000000000L,
      AnnParams.bandBitsForWide(1000000000L)) <= AnnParams.TargetOccupancy)
    // word layout invariants: each word fits signed-64, bands split evenly
    val wide = AnnParams.forCountWide(n4m)
    assert(wide.words == 2 && wide.planesPerWord == 60 && wide.planes == 120)
    // the wide engine path runs and is deterministic on a real corpus
    val e = Tables.embeddings(spark, sf)
    val p = AnnParams.forCountWide(graft.sim.AnnParams.corpusCount(e))
    val out1 = Similarity.lshTopK(e.filter(col("vec_id") % 100 === 0), e,
      k = 3, params = p).collect().toSet
    val out2 = Similarity.lshTopK(e.filter(col("vec_id") % 100 === 0), e,
      k = 3, params = p).collect().toSet
    assert(out1 == out2 && out1.nonEmpty, "wide path must be deterministic")
  }

  test("bucket cap's hash prefilter falls back exactly when it under-fills") {
    // 8 identical vectors → one bucket per band, all 8 in it; cap = 2
    // with T = (2·2·1048573) div 8 = 524286 and ids 11..18 whose
    // multiplicative hashes ALL sit above T — zero survivors, so the
    // prefilter path must take the full-sort fallback and still keep
    // exactly the first cap by (hash, id): ids 11 and 12. Every query
    // then collides with only those two (self excluded) plus whatever
    // the hot-bucket Hamming-1 re-probe finds (nothing — all other
    // buckets are empty).
    val ids = Seq(11L, 12L, 13L, 14L, 15L, 16L, 17L, 18L)
    val vecs = spark.createDataFrame(
        ids.map(i => (i, Array.fill(64)(0.5f))))
      .toDF("vec_id", "embedding")
    // corpusN above CapSortMax forces the prefilter branch
    val prefiltered = graft.sim.AnnParams(bands = 4, slotBits = 15,
      bandBits = 4, bucketCap = 2, corpusN = Similarity.CapSortMax + 1)
    def pairsOf(p: graft.sim.AnnParams) =
      Similarity.lshCandidateSims(vecs, vecs, p)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = pairsOf(prefiltered)
    val expected = (for {
      q <- ids; n <- Seq(11L, 12L) if n != q
    } yield (q, n)).toSet
    assert(pairs == expected,
      s"fallback path diverged from the exact capped algebra: $pairs")
    // the small-regime window branch produces the identical relation
    assert(pairsOf(prefiltered.copy(corpusN = 0L)) == pairs,
      "window and prefilter cap branches diverged")
  }

  test("postingJoinFits gates on Σdf², not vocabulary count alone") {
    // Synthetic HUGE-HOT corpus: every doc shares the same 4 shingles
    // (vocab stays tiny as docs grow) — the regime where Σdf² grows
    // quadratically in corpus size while the vocabulary count would
    // happily pick the posting join forever.
    val docs = spark.createDataFrame(
      (1L to 60L).map(i => (i, "a b c d e f"))).toDF("doc_id", "text")
    val shRel = docs.select(col("doc_id").as("id"),
      explode(Dedup.shinglesFast(col("text"), 3)).as("sh"))
    // 4 distinct shingles, df = 60 each → Σdf² = 4·3600 = 14400
    assert(Dedup.postingJoinFits(shRel, 1000000L, 14400L),
      "exact budget boundary should still fit")
    assert(!Dedup.postingJoinFits(shRel, 1000000L, 14399L),
      "Σdf² above budget must route off the posting join")
    assert(!Dedup.postingJoinFits(shRel, 3L, Long.MaxValue),
      "vocabulary gate still applies")
    assert(!Dedup.postingJoinFits(shRel, 0L, Long.MaxValue),
      "dictVocabMax = 0 forces the prefix branch without a stats job")
  }

  test("int8 quantization reconstructs within one step per dimension") {
    import org.apache.spark.sql.functions._
    // |x - q*scale/127| < scale/127 for floor quantization — the bound a
    // storage-path consumer relies on when reranking over dequantized
    // vectors.
    val worst = SparkEntry.queries("sim_quant")(spark, sf)
      .join(Tables.embeddings(spark, sf), "vec_id")
      .filter(col("maxabs") > 0)
      .withColumn("x", element_at(col("embedding"), col("dim") + 1).cast("double"))
      .withColumn("err",
        abs(col("x") - col("q") * col("maxabs") / lit(127.0)) * lit(127.0)
          / col("maxabs"))
      .agg(max("err")).collect()(0).getDouble(0)
    assert(worst <= 1.0 + 1e-9, s"reconstruction error $worst steps")
  }

  test("simhash: identical docs get identical signatures; hamming 0") {
    val df = spark.createDataFrame(Seq(
      (1L, "spark query engine test"), (2L, "spark query engine test"),
      (3L, "completely different words here"))).toDF("doc_id", "text")
    val sh = Dedup.simhashTable(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(3L))
  }

  test("cosine: self-similarity is 1.0") {
    val emb = Tables.embeddings(spark, sf).limit(5)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("e"))
    val sims = emb.select(round(Similarity.cosine(col("e"), col("e")), 6).as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(_ == 1.0))
  }

  test("allPairsAboveThreshold is block-count independent") {
    val emb = Tables.embeddings(spark, sf)
    val one = Similarity.allPairsAboveThreshold(emb, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val three = Similarity.allPairsAboveThreshold(emb, 0.3, blocks = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one == three && one.nonEmpty)
  }

  test("TopKAggregator result equals the window top-k exactly") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val window = Similarity.bruteForceTopK(queries, emb, 5)
      .orderBy("query_id", "rank").collect().toSeq
    val agg = Similarity.bruteForceTopKAgg(queries, emb, 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(window == agg)
  }

  test("ivfTopK: exact sims, bounded ranks, sane recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val bf = Similarity.bruteForceTopK(queries, emb, 5)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val ivf = Similarity.ivfTopK(queries, emb, 5, centroidStride = 50, nprobe = 4)
      .collect()
    assert(ivf.forall(_.getInt(1) <= 5))
    // rerank is exact: any (query, neighbor) IVF returns that brute force
    // also ranked must carry the identical similarity
    ivf.foreach { r =>
      bf.get((r.getLong(0), r.getLong(2)))
        .foreach(s => assert(s == r.getDouble(3), "IVF rerank must be exact"))
    }
    val recall = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
      .intersect(bf.keySet).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF nprobe=4 recall $recall unexpectedly low")
  }

  test("ivfpqTopK: exact rerank sims, bounded ranks, sane recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val bf = Similarity.bruteForceTopK(queries, emb, 5)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    // ksub=4 is only 2 bits per subspace — at that code rate the exact
    // rerank depth is the recall knob, so probe deeper than the query
    // registration's rerank=20
    val pq = graft.sim.PQ.ivfpqTopK(queries, emb, 5,
        centroidStride = 50, nprobe = 4,
        subspaces = 4, subDim = 16, ksub = 4, iters = 1, rerank = 50)
      .collect()
    assert(pq.nonEmpty && pq.forall(_.getInt(1) <= 5))
    // the rerank is exact cosine on real vectors: any pair brute force
    // also ranked must carry the identical similarity
    pq.foreach { r =>
      bf.get((r.getLong(0), r.getLong(2)))
        .foreach(s => assert(s == r.getDouble(3), "PQ rerank must be exact"))
    }
    // ADC is an approximation of an approximation (coarse cells + codes):
    // recall floor is looser than plain IVF but must stay meaningful
    val recall = pq.map(r => (r.getLong(0), r.getLong(2))).toSet
      .intersect(bf.keySet).size.toDouble / bf.size
    assert(recall >= 0.2, s"IVF-PQ recall $recall unexpectedly low")
  }

  test("persisted IVF index: reloaded search equals fresh search; manifest prunes cells") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val cent = graft.sim.KMeans.train(emb, "vec_id", "embedding", k = 4, iters = 1)
      .select(col("cid").as("cent_id"),
        Similarity.l2NormalizeCol(expr("transform(c, x -> x / 1048576.0D)")).as("cv"))
    // build once, persist through the manifest sink KEYED ON THE CELL —
    // per-file cent_id ranges make the min/max manifest prune unprobed
    // cells at the file level (the storage-layer twin of nprobe)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx_").toString + "/idx"
    graft.io.Sinks.writeWithManifest(spark,
      Similarity.buildIvfIndex(emb, cent), dir, "cent_id", nFiles = 4)
    val loaded = graft.io.Sinks.readVersioned(spark, dir)
    val fromIndex = Similarity.ivfSearchIndex(queries, loaded, cent, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    val fresh = Similarity.ivfTopKWithCentroids(queries, emb, cent, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(fromIndex.sameElements(fresh),
      "persisted-index search must equal the fresh-assignment search")
    // file pruning: a single cell's key-range read opens fewer files
    val oneCell = graft.io.Sinks.readVersionedKeyRange(spark, dir, "cent_id", 0L, 0L)
    assert(oneCell.inputFiles.length < loaded.inputFiles.length,
      s"cell read must prune files (${oneCell.inputFiles.length} of ${loaded.inputFiles.length})")
  }

  test("persisted BM25 index: reloaded scoring equals inline; manifest prunes by term") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val terms = Seq("vector", "hash", "merge")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx_").toString + "/idx"
    graft.io.Sinks.writeWithManifest(spark,
      graft.text.Bm25.buildIndex(docs), dir, "tok", nFiles = 4)
    val loaded = graft.io.Sinks.readVersioned(spark, dir)
    val fromIndex = graft.text.Bm25.scoreFromIndex(loaded, terms, k = 10).collect()
    val inline = SparkEntry.queries("t_bm25")(spark, sf).collect()
    assert(fromIndex.sameElements(inline),
      "persisted-index BM25 must equal the inline build+score")
    // token-keyed manifest: a term-range read opens fewer postings files
    val ranged = graft.io.Sinks.readVersionedKeyRange(spark, dir, "tok",
      "vector", "vector")
    assert(ranged.inputFiles.length < loaded.inputFiles.length,
      s"term read must prune postings files (${ranged.inputFiles.length} of ${loaded.inputFiles.length})")
  }

  test("incremental index append: build(A)+append(B) equals build(A∪B), O(new-files) commit") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val (docsA, docsB) =
      (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 =!= 0))
    // ── BM25 postings ──
    val bmDir = java.nio.file.Files.createTempDirectory("graft_bm25_app_").toString + "/idx"
    graft.io.Sinks.writeWithManifest(spark,
      graft.text.Bm25.buildIndex(docsA), bmDir, "tok", nFiles = 4)
    graft.text.Bm25.appendToIndex(spark, docsB, bmDir, nFiles = 2)
    val bmLoaded = graft.io.Sinks.readVersioned(spark, bmDir)
    val bmFresh = graft.text.Bm25.buildIndex(docs)
    assert(bmLoaded.exceptAll(bmFresh).isEmpty && bmFresh.exceptAll(bmLoaded).isEmpty,
      "appended postings must equal the full rebuild row-for-row")
    val terms = Seq("vector", "hash", "merge")
    assert(graft.text.Bm25.scoreFromIndex(bmLoaded, terms, k = 10).collect()
      .sameElements(graft.text.Bm25.scoreFromIndex(bmFresh, terms, k = 10).collect()),
      "scores against build(A)+append(B) must be bit-identical to build(A∪B)")
    // the append commit is O(new files): v=2 carries exactly the 2
    // appended add rows, no removes, and no pre-existing file re-listed
    assert(graft.io.Sinks.currentVersion(bmDir) == 2L)
    val v2 = spark.read.parquet(s"$bmDir/_manifest/v=2").collect()
    assert(v2.length == 2 && v2.forall(_.getAs[String]("action") == "add"),
      s"append delta must be 2 add rows, got ${v2.length}")
    // ── IVF assignment ──
    val emb = Tables.embeddings(spark, sf)
    val (embA, embB) =
      (emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 =!= 0))
    val cent = graft.sim.KMeans.train(emb, "vec_id", "embedding", k = 4, iters = 1)
      .select(col("cid").as("cent_id"),
        Similarity.l2NormalizeCol(expr("transform(c, x -> x / 1048576.0D)")).as("cv"))
    val ivfDir = java.nio.file.Files.createTempDirectory("graft_ivf_app_").toString + "/idx"
    graft.io.Sinks.writeWithManifest(spark,
      Similarity.buildIvfIndex(embA, cent), ivfDir, "cent_id", nFiles = 4)
    Similarity.appendToIvfIndex(spark, embB, cent, ivfDir, nFiles = 2)
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val viaAppend = Similarity.ivfSearchIndex(queries,
        graft.io.Sinks.readVersioned(spark, ivfDir), cent, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    val fresh = Similarity.ivfTopKWithCentroids(queries, emb, cent, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(viaAppend.sameElements(fresh),
      "search over build(A)+append(B) must equal the fresh full-corpus search")
  }

  test("batch BM25 equals per-query scoreFromIndex; trimmed LM model is bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val index = graft.text.Bm25.buildIndex(docs)
    val batch = Seq(
      (1L, "vector"), (1L, "hash"), (1L, "merge"),
      (2L, "join"), (2L, "scan"),
      (3L, "stream"), (3L, "window"), (3L, "sort"))
    val fromBatch = graft.text.Bm25.scoreBatchFromIndex(
        index, batch.toDF("query_id", "term"), k = 10)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq }
    batch.groupBy(_._1).foreach { case (qid, terms) =>
      val single = graft.text.Bm25.scoreFromIndex(index, terms.map(_._2), k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(fromBatch(qid) == single,
        s"batch scoring must be bit-identical to per-query for query $qid")
    }
    // bounded LM model: the trim caps the broadcast side BY PARAMETER
    val b = graft.text.Lm.bigrams(docs)
    assert(graft.text.Lm.bigramModel(b, modelTopK = 100).count() == 100L)
    assert(graft.text.Lm.bigramModel(b, minCount = 1000000L).count() == 0L)
    // with the cap at/above |model| the trim is the identity, so the
    // trimmed score path equals the untrimmed one
    val full = graft.text.Lm.lmScore(docs).orderBy("doc_id").collect()
    val capped = graft.text.Lm.lmScore(docs, modelTopK = 1000000)
      .orderBy("doc_id").collect()
    assert(capped.sameElements(full),
      "a non-binding trim must not change lm scores")
    // same for the salient-term vocab cap
    val st = graft.text.Lm.salientTerm(docs).orderBy("doc_id").collect()
    val stCapped = graft.text.Lm.salientTerm(docs, vocabTopK = 1000000)
      .orderBy("doc_id").collect()
    assert(stCapped.sameElements(st),
      "a non-binding vocab cap must not change salient terms")
  }

  test("lshTopK: no false results and sane recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val bf = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(queries, emb, 5,
        graft.sim.Similarity.annParamsFor(emb, sf))
      .select("query_id", "rank", "neighbor_id", "sim").collect()
    assert(lsh.forall(_.getInt(1) <= 5))
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = lshPairs.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.10, s"LSH recall $recall unexpectedly low")
  }

  test("lshTopKMultiprobe: dominates plain LSH per query at the same index") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val bf = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ap = graft.sim.Similarity.annParamsFor(emb, sf)
    val lsh = pairs(Similarity.lshTopK(queries, emb, 5, ap))
    val mp = pairs(Similarity.lshTopKMultiprobe(queries, emb, 5, ap,
      probes = 4))
    // probes=0 degenerates to EXACTLY plain LSH (superset law base case)
    val mp0 = pairs(Similarity.lshTopKMultiprobe(queries, emb, 5, ap,
      probes = 0))
    assert(mp0 === lsh)
    // per-query true-hit dominance: the candidate set is a superset,
    // so every exact hit LSH finds, multiprobe finds too
    val lshHits = lsh.intersect(bf).groupBy(_._1).view.mapValues(_.size)
    val mpHits = mp.intersect(bf).groupBy(_._1).view.mapValues(_.size)
    lshHits.foreach { case (q, h) =>
      assert(mpHits.getOrElse(q, 0) >= h, s"query $q lost hits")
    }
  }

  test("corpus ops: split is total+stable, cap binds, chunks respect contiguity") {
    import graft.text.Corpus
    val docs = Tables.documents(spark, sf)
    val split = Corpus.splitByHash(docs, "doc_id")
    assert(split.count() == docs.count(), "split must assign every row")
    assert(split.select("split").distinct().count() == 3)
    // stability: the same key always lands in the same split
    val again = Corpus.splitByHash(docs, "doc_id")
      .select(col("doc_id"), col("split").as("split2"))
    assert(split.join(again, "doc_id")
      .filter(col("split") =!= col("split2")).count() == 0)
    val capped = Corpus.stratifiedCap(docs, "source", "doc_id", 5)
    val maxPerSource = capped.groupBy("source").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerSource <= 5)
    // chunking: within a (source, chunk) the doc_ids are contiguous in
    // the per-source order, and chunk ids start at 0
    val chunked = Corpus.chunkByTokenBudget(
      docs.select(col("doc_id"), col("source"),
        size(graft.text.Text.tokens(col("text"))).cast("long").as("n_tokens")),
      "source", "doc_id", "n_tokens", budget = 500)
    assert(chunked.agg(min("chunk_id")).collect()(0).getLong(0) == 0L)
    val nonMonotonic = chunked
      .withColumn("prev", lag("chunk_id", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")))
      .filter(col("prev").isNotNull && col("chunk_id") < col("prev"))
    assert(nonMonotonic.count() == 0, "chunk ids must be monotone per source")
  }

  test("multimodal: stub decode is deterministic byte math") {
    val docs = spark.createDataFrame(Seq((7L, "abcd"))).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val row = Multimodal.decodeFeatures(media).collect()(0)
    assert(row.getLong(0) == 7L)
    assert(row.getInt(1) == 4 % 640 && row.getInt(2) == (4 * 7) % 480)
    assert(row.getDouble(3) == ('a' + 'b' + 'c' + 'd').toDouble / 4)
  }

  test("RewriteSqDist replaces the squared-distance HOF with the kernel, bit-identically") {
    import spark.implicits._
    val df = Seq((Array(1L, 5L, -3L), Array(2L, 2L, 4L)),
        (Array(0L, 0L, 0L), Array(0L, 0L, 0L)))
      .toDF("a", "b")
    val hof = df.select(org.apache.spark.sql.functions.expr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)")
      .as("d2"))
    // The rule rewrites the analyzed fold into the kernel (checked on the
    // analyzed plan — a LocalRelation toy plan constant-folds away before
    // optimizedPlan can be inspected; the parquet-backed plan is asserted
    // in the sim_kmeans test below)...
    val rewritten = graft.plans.RewriteSqDist(hof.queryExecution.analyzed)
    assert(rewritten.toString.contains("vec_sqdist_long"),
      s"rule did not fire:\n$rewritten")
    // ...and fold, kernel function, and hand math agree ((1)²+(3)²+(7)² = 59).
    assert(hof.as[Long].collect().toSeq == Seq(59L, 0L))
    val kernel = df.selectExpr("vec_sqdist_long(a, b) AS d2")
    assert(kernel.as[Long].collect().toSeq == Seq(59L, 0L))
    // A non-matching fold (different combiner) is left untouched.
    val other = df.select(org.apache.spark.sql.functions.expr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + 2 * t)"))
    assert(!graft.plans.RewriteSqDist(other.queryExecution.analyzed)
      .toString.contains("vec_sqdist_long"))
  }

  test("SqDist kernel preserves HOF null semantics (null element, length mismatch)") {
    import spark.implicits._
    val df = Seq(
      ("nulls", Array[java.lang.Long](1L, null, 3L), Array[java.lang.Long](1L, 2L, 3L)),
      ("short", Array[java.lang.Long](1L, 2L), Array[java.lang.Long](1L, 2L, 3L)),
      ("clean", Array[java.lang.Long](1L, 2L, 3L), Array[java.lang.Long](1L, 2L, 4L)))
      .toDF("label", "a", "b")
    val out = df.selectExpr("label",
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t) AS hof",
      "vec_sqdist_long(a, b) AS kernel")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(out("nulls") == ((null, null)), s"null element: ${out("nulls")}")
    assert(out("short") == ((null, null)), s"length mismatch: ${out("short")}")
    assert(out("clean") == ((1L, 1L)), s"clean: ${out("clean")}")
  }

  test("RewriteSqDist is ANSI-faithful: overflow raises, TRY folds are untouched") {
    import spark.implicits._
    val df = Seq((Array(Long.MaxValue, 1L), Array(0L, 1L))).toDF("a", "b")
    val hofSql =
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t) AS d2"
    // Under the session's ANSI default the fold overflows loudly…
    def causes(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.toString).toSeq
    val hofErr = intercept[Exception] { df.selectExpr(hofSql).collect() }
    assert(causes(hofErr).exists(_.toLowerCase.contains("overflow")),
      s"expected ANSI overflow from the fold, got: ${causes(hofErr).mkString(" <- ")}")
    // …so the kernel the rule substitutes must raise too, not wrap.
    val rewritten = graft.plans.RewriteSqDist(
      df.selectExpr(hofSql).queryExecution.analyzed)
    val kernels = rewritten.expressions.flatMap(_.collect {
      case k: graft.plans.SqDistExpr => k })
    assert(kernels.nonEmpty && kernels.forall(_.failOnError),
      s"ANSI fold must map to the exact kernel:\n$rewritten")
    intercept[ArithmeticException] {
      graft.plans.VectorKernels.sqDistLongExact(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(Long.MaxValue, 1L)),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(0L, 1L)))
    }
    // A TRY-mode fold (overflow → NULL mid-expression) has no kernel twin
    // and must be left untouched.
    val tryDf = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> try_multiply(try_subtract(x, y), " +
        "try_subtract(x, y))), 0L, (acc, t) -> try_add(acc, t)) AS d2")
    assert(!graft.plans.RewriteSqDist(tryDf.queryExecution.analyzed)
      .toString.contains("vec_sqdist_long"))
  }

  test("sim_kmeans assignment runs on the kernel, not the interpreted fold") {
    val plan = graft.sim.KMeans
      .fit(Tables.embeddings(spark, "/root/testdata/sf0.001"),
        "vec_id", "embedding", k = 2, iters = 1)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("vec_sqdist_long"), s"kernel missing from plan:\n$plan")
  }

  override def afterAll(): Unit = spark.stop()
}
