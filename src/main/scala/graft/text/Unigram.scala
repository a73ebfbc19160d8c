package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword segmentation, re-expressed
  * Spark-first: encoding a word over a piece vocabulary IS a shortest
  * path through the word's character positions (node p = "first p chars
  * consumed", edge p → p+|piece| when the piece matches at p, weight =
  * the piece's cost), so the Viterbi segmenter becomes a Bellman-Ford
  * DP over the |word|-node DAG — the [[graft.graph.Graph]] iterative
  * discipline applied to tokenization, sister to the BPE rounds of
  * [[Bpe]].
  *
  * Everything is integer-exact and RNG-free so the DuckDB oracle can
  * replay vocabulary induction AND the DP bit-for-bit (the DP via an
  * exhaustive recursive CTE — affordable for the oracle's small SF;
  * the engine side never enumerates paths):
  *  - piece costs are `max(1, 40 − bitlen(freq))` — the `bin`-length
  *    trick of [[graft.sketch.Sketch]], no float log;
  *  - equal-cost ties break on the lexicographically smallest path
  *    string, a total order both engines share (binary collation).
  *    The tie-break is DP-compatible: two distinct prefix paths over
  *    the same consumed chars always differ at an index where neither
  *    has ended (they carry identical word chars, differing only in
  *    space placement, and never end in a space), so `p1 < p2` implies
  *    `p1 + s1 < p2 + s2` for any suffixes — prefix optimality holds.
  *
  * Scale shape: every round operates on the DISTINCT-WORD table (the
  * [[Bpe]] |vocab|-rows-never-the-corpus contract) crossed with ≤
  * maxWordLen positions; the piece vocabulary is construction-bounded
  * (≤ maxPieceLen substrings of distinct words above minCount) and
  * broadcast; rounds = maxWordLen with lineage truncated per round.
  * Per-document encoding joins the corpus against the |words|-row
  * segmentation map — one broadcast join, one aggregate.
  */
object Unigram {

  /** Piece vocabulary from a word-frequency table (word, freq): every
    * contiguous substring of length 1..maxPieceLen, weighted by the
    * frequency of each word it occurs in (once per occurrence
    * position); pieces reaching `minCount` survive, and single
    * characters ALWAYS survive so every word stays segmentable.
    * cost(piece) = max(1, 40 − bitlen(total freq)) — frequent pieces
    * cheap, integer-exact. Returns (piece, cost). */
  def pieceVocab(wordFreq: DataFrame, maxPieceLen: Int,
      minCount: Long): DataFrame =
    wordFreq
      .select(col("word"), col("freq"),
        explode(expr(
          s"""flatten(transform(sequence(1, length(word)),
              s -> transform(sequence(1, $maxPieceLen),
                   l -> struct(s AS s, l AS l))))""")).as("sl"))
      .filter(col("sl.s") + col("sl.l") - 1 <= length(col("word")))
      .select(expr("substr(word, sl.s, sl.l)").as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("pfreq"))
      .filter(col("pfreq") >= minCount || length(col("piece")) === 1)
      .select(col("piece"),
        greatest(lit(1L), lit(40L) - length(bin(col("pfreq"))).cast("long"))
          .as("cost"))

  /** Viterbi segmentation of each distinct word: the minimum-total-cost
    * segmentation over `vocab` (piece, cost), ties on the smallest path
    * string. Bellman-Ford over positions: after round r, best(word, p)
    * is optimal over segmentations with ≤ r pieces; maxWordLen rounds
    * settle every position (pieces consume ≥ 1 char). Words longer
    * than maxWordLen are excluded (the caller's contract — raise the
    * round budget to cover them). Returns (word, cost, n_pieces,
    * pieces) with pieces space-joined. */
  def segmentWords(words: DataFrame, vocab: DataFrame, maxPieceLen: Int,
      maxWordLen: Int): DataFrame = {
    val w = words.select(col("word")).distinct()
      .filter(length(col("word")) <= maxWordLen && length(col("word")) >= 1)
    var best = w.select(col("word"), lit(0).as("pos"),
      lit(0L).as("cost"), lit("").as("path"))
    for (r <- 1 to maxWordLen) {
      val ext = best
        .select(col("word"), col("pos"), col("cost"), col("path"),
          explode(expr(s"sequence(1, $maxPieceLen)")).as("l"))
        .filter(col("pos") + col("l") <= length(col("word")))
        .select(col("word"), col("pos"), col("cost"), col("path"), col("l"),
          expr("substr(word, pos + 1, l)").as("piece"))
        .join(broadcast(vocab.withColumnRenamed("cost", "pcost")),
          Seq("piece"))
        .select(col("word"), (col("pos") + col("l")).as("pos"),
          (col("cost") + col("pcost")).as("cost"),
          when(col("path") === "", col("piece"))
            .otherwise(concat(col("path"), lit(" "), col("piece")))
            .as("path"))
      val stepped = best.union(ext)
        .groupBy("word", "pos")
        .agg(min(struct(col("cost"), col("path"))).as("m"))
        .select(col("word"), col("pos"),
          col("m.cost").as("cost"), col("m.path").as("path"))
      best = if (r % 4 == 0 || r == maxWordLen) stepped.localCheckpoint()
             else stepped
    }
    best.filter(col("pos") === length(col("word")))
      .select(col("word"), col("cost"),
        size(split(col("path"), " ")).cast("long").as("n_pieces"),
        col("path").as("pieces"))
  }
}
