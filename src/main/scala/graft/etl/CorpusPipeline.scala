package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{Corpus, Text}

/** The end-to-end LLM-corpus preparation pipeline as a declarative
  * [[PipelineConfig]] DAG: dedup → quality filter → decontam → split →
  * pack — the canonical pretraining data-prep chain, run through the same
  * config parser / topo-sort / logging runner as the medallion flights
  * DAG, so corpus prep gets the orchestration semantics (failure
  * isolation, structured task logs, dependency-ordered execution) for
  * free.
  *
  * Each stage is a named function over the library operators the oracle
  * suite already verifies one by one (`d_exact`, `t_quality`,
  * `t_decontam`, `c_split_hash`, `c_pack`) — this module only COMPOSES
  * them; the DAG's value is the operational wrapper, not new semantics.
  * Every stage is a declarative plan: the chain fuses scan-side work
  * (fingerprints, quality stats) and keeps the only shuffles the ones the
  * member operators already pay (dedup's hash shuffle, packing's shard
  * exchange).
  */
object CorpusPipeline {

  /** The DAG in the reference's pipelines.yaml shape ([[PipelineConfig]]);
    * stage order is the production norm: dedup first (cheapest row
    * reduction), then the per-doc quality gate, then benchmark
    * decontamination, then the leakage-safe split, then packing. */
  val config: String =
    """pipelines:
      |  corpus:
      |    tasks:
      |      - operation: read_documents_raw
      |        input_from: null
      |      - operation: transform_dedup
      |        input_from: read_documents_raw
      |      - operation: transform_quality_filter
      |        input_from: transform_dedup
      |      - operation: transform_decontam
      |        input_from: transform_quality_filter
      |      - operation: transform_split
      |        input_from: transform_decontam
      |      - operation: transform_pack
      |        input_from: transform_split
      |      - operation: write_packed_corpus
      |        input_from: transform_pack
      |""".stripMargin

  private val enStop = Text.langStopwords.toMap.apply("en")

  /** Exact dedup on the order-insensitive bag-of-words fingerprint —
    * min-id survivor per bag (the `t_filter_pipeline` construction). */
  def dedupStage(docs: DataFrame): DataFrame =
    graft.dedup.Dedup.exactDedup(
      docs.withColumn("fingerprint", Text.bagOfWordsFingerprint(col("text"))),
      col("fingerprint"), "doc_id")

  /** Composite quality gate at `minQuality` (stopword ratio + lexical
    * diversity + length band — the `t_quality` score). */
  def qualityStage(docs: DataFrame, minQuality: Double = 0.5): DataFrame =
    docs.withColumn("quality",
        Text.qualityStatsFast(col("text"), enStop).getField("quality"))
      .filter(col("quality") >= minQuality)

  /** Benchmark decontamination: REMOVE every corpus document sharing any
    * word 3-gram with the held-out benchmark slice (ids ≡ 0 mod 25 — the
    * `t_decontam` bench derivation), and the bench docs themselves. The
    * bench n-gram set is tiny relative to the corpus → broadcast; the
    * corpus side streams through one semi-join + one anti-join, no
    * corpus-shingle shuffle. */
  def decontamStage(docs: DataFrame): DataFrame = {
    val benchSh = docs.filter(col("doc_id") % 25 === 0)
      .select(explode(graft.dedup.Dedup.shinglesFast(col("text"), 3)).as("sh"))
      .distinct()
    val corpus = docs.filter(col("doc_id") % 25 =!= 0)
    val contaminated = corpus
      .select(col("doc_id"),
        explode(graft.dedup.Dedup.shinglesFast(col("text"), 3)).as("sh"))
      .join(broadcast(benchSh), Seq("sh"))
      .select("doc_id").distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Leakage-safe md5 split ([[Corpus.splitByHash]]); the pipeline
    * carries the TRAIN slice forward (val/test are derivable any time —
    * the split is a pure function of the id). */
  def splitStage(docs: DataFrame, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    Corpus.splitByHash(docs, "doc_id", trainPct, valPct)
      .filter(col("split") === "train")

  /** Exact greedy packing into `budget`-token bins, `shards`-way
    * parallel ([[Corpus.packGreedy]]) — returns the (doc_id, shard, bin,
    * n_tokens) packing manifest. */
  def packStage(docs: DataFrame, budget: Long = 256L,
      shards: Int = 8): DataFrame =
    Corpus.packGreedy(docs, budget, shards)

  /** Bind the DAG's operation names to the stages. `readDocs` supplies
    * the raw corpus; the packed manifest lands at `outDir/packed`. */
  def ops(readDocs: SparkSession => DataFrame, outDir: String,
      minQuality: Double = 0.5, trainPct: Int = 80, valPct: Int = 10,
      budget: Long = 256L, shards: Int = 8)
      : Map[String, (SparkSession, Option[DataFrame]) => Option[DataFrame]] = Map(
    "read_documents_raw" -> ((s, _) => Some(readDocs(s))),
    "transform_dedup" -> ((_, in) => in.map(dedupStage)),
    "transform_quality_filter" -> ((_, in) => in.map(qualityStage(_, minQuality))),
    "transform_decontam" -> ((_, in) => in.map(decontamStage)),
    "transform_split" -> ((_, in) => in.map(splitStage(_, trainPct, valPct))),
    "transform_pack" -> ((_, in) => in.map(packStage(_, budget, shards))),
    "write_packed_corpus" -> ((_, in) => {
      in.foreach(_.write.mode("overwrite").parquet(s"$outDir/packed")); in
    }))

  /** Parse + bind + run the corpus DAG; returns the runner's task logs. */
  def run(spark: SparkSession, readDocs: SparkSession => DataFrame,
      outDir: String): Seq[Medallion.TaskLog] =
    PipelineConfig.runPipelines(spark, config, ops(readDocs, outDir))
}
