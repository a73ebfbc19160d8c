package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — the tokenizer-training half of a
  * pretraining pipeline (Sennrich et al. 2016), re-expressed as iterated
  * relational rounds over the corpus word-frequency table.
  *
  * Each round: count adjacent symbol pairs (weighted by word frequency),
  * pick the single most frequent pair (count desc, then pair text — fully
  * deterministic), and rewrite every word's symbol sequence with that
  * pair merged. The merge rewrite is pure string algebra — double every
  * space so each adjacent pair owns its delimiters, replace
  * `' a  b '` → `' ab '`, collapse — which makes the round reproducible
  * bit-for-bit in any engine with left-to-right non-overlapping
  * `replace` semantics (Spark and DuckDB both): on repeat chains like
  * `a a a` it merges greedily left-to-right, exactly like the reference
  * BPE implementation.
  *
  * 100 TB shape: rounds iterate over the WORD-FREQUENCY table, not the
  * corpus — |vocab| rows (Heaps-law bounded), built with one partial-agg
  * shuffle from the corpus and never rescanned; each round is one
  * pair-explode + partial-agg count (|vocab|·avg-word-len rows), a 1-row
  * top-pair aggregate broadcast back (never a data-sized collect), and a
  * projection rewrite. The classic driver-side pair-heap BPE is
  * inherently sequential; this trades heap updates for k tiny
  * relational rounds — the right shape when the vocab itself is
  * distributed.
  */
object Bpe {

  /** Space-separated character symbolization of a word:
    * "low" → "l o w". Regex capture — engine-portable (same semantics in
    * Spark `$1` / DuckDB `\1` replacement syntax). */
  def symbolize(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Adjacent symbol pairs of a symbol string, as (a, b) structs. */
  private def adjacentPairs(sym: Column): Column = {
    val arr = split(sym, " ")
    when(size(arr) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(transform(sequence(lit(1), size(arr) - 1),
        i => struct(element_at(arr, i).as("a"),
          element_at(arr, i + 1).as("b"))))
  }

  /** One merge rewrite: every adjacent (a, b) in `sym` becomes `ab`,
    * greedy left-to-right. Doubling spaces first gives every pair its own
    * delimiters, so non-overlapping replace hits ALL disjoint
    * occurrences in one pass. */
  def mergePair(sym: Column, a: Column, b: Column): Column = {
    val doubled = concat(lit(" "),
      regexp_replace(sym, " ", "  "), lit(" "))
    val merged = call_function("replace",
      doubled,
      concat(lit(" "), a, lit("  "), b, lit(" ")),
      concat(lit(" "), a, b, lit(" ")))
    trim(regexp_replace(merged, " +", " "))
  }

  /** The corpus word-frequency table: (word, freq). One shuffle. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `rounds` BPE merges over the corpus. Returns the merge table
    * (round, sym_a, sym_b, pair_count) — one row per round, the artifact
    * a tokenizer ships. Wholly declarative: the per-round winning pair is
    * a 1-row aggregate cross-joined (broadcast) back into the rewrite —
    * no driver-side collect in the loop. */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    var vocab = wordFreq(docs, textCol)
      .select(symbolize(col("word")).as("sym"), col("freq"))
    var merges: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      val top = topPair(vocab).withColumn("round", lit(r))
      val mergeRow = top.select("round", "sym_a", "sym_b", "pair_count")
      merges = Some(merges.map(_.unionByName(mergeRow)).getOrElse(mergeRow))
      // localCheckpoint: each round's vocab feeds BOTH the next round's
      // pair count and its rewrite; truncating lineage keeps round k's
      // plan O(1) instead of O(k) nested rewrites.
      vocab = vocab
        .crossJoin(broadcast(top.select(col("sym_a"), col("sym_b"))))
        .select(mergePair(col("sym"), col("sym_a"), col("sym_b")).as("sym"),
          col("freq"))
        .localCheckpoint(eager = false)
    }
    merges.get.orderBy("round")
  }

  /** Apply a learned merge table to fresh words: fold the merges in round
    * order over the symbolization — the tokenizer's encode step. */
  def applyMerges(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame =
    words.withColumn("sym",
      merges.foldLeft(symbolize(col(wordCol))) { case (sym, (a, b)) =>
        mergePair(sym, lit(a), lit(b))
      })

  /** Scan-fused whole-document encode accounting: per doc, whitespace
    * word count vs post-BPE token count, with NO explode and NO shuffle —
    * the words stay inside array HOFs (`filter`/`aggregate`) so the whole
    * encode is one codegen'd projection over the scan. Each learned
    * round's (sym_a, sym_b) pair joins in as a broadcast 1-row cross join
    * (the established BPE fold shape).
    *
    * Because it is STATELESS row-at-a-time, this exact form also runs
    * unchanged on a `readStream` source (stream-static broadcast joins
    * against the merge table) — the streaming twin asserted in
    * StreamingSpec. Docs with no non-empty word report (0, 0) rather
    * than dropping out (the explode+groupBy form in `t_bpe_apply` has no
    * row to aggregate for them). */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame, rounds: Int = 3): DataFrame = {
    val withM = (1 to rounds).foldLeft(docs)((df, r) =>
      df.crossJoin(broadcast(merges.filter(col("round") === r)
        .select(col("sym_a").as(s"__a$r"), col("sym_b").as(s"__b$r")))))
    val words = filter(split(col(textCol), " "), w => w =!= "")
    def enc(w: Column) = (1 to rounds).foldLeft(symbolize(w))((s, r) =>
      mergePair(s, col(s"__a$r"), col(s"__b$r")))
    withM.select(col(idCol).as("doc_id"),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L),
        (acc, w) => acc + size(split(enc(w), " ")).cast("long"))
        .as("n_bpe_tokens"))
  }

  /** The round's winning pair: max count, ties on pair text — a 1-row
    * aggregate (TakeOrderedAndProject), never a data-sized sort. */
  private def topPair(vocab: DataFrame): DataFrame =
    vocab.select(explode(adjacentPairs(col("sym"))).as("p"), col("freq"))
      .groupBy(col("p.a").as("sym_a"), col("p.b").as("sym_b"))
      .agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("sym_a"), col("sym_b"))
      .limit(1)
}
