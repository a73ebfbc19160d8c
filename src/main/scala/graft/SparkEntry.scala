package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY.md §2
  * (or an LLM-data-pipeline extension) over the driver's testdata; the
  * paired [[oracleSql]] is the DuckDB-runnable equivalent used as the
  * correctness oracle.
  */
object SparkEntry {

  /** Cache-scope groups: packs in one group share managed caches (StarQ +
    * GoldQ share the silver fact cache; SimQ owns the normalized-corpus
    * cache), so Bench clears caches at GROUP boundaries — each group gets
    * its legitimate intra-group reuse, and no persisted blocks survive
    * into unrelated packs to raise GC/memory pressure for them (the
    * round-2 bench regression). */
  private val packGroups: Seq[Seq[QueryPack]] = Seq(
    Seq(Relational), Seq(Functions), Seq(CleaningQ), Seq(EventsQ),
    Seq(TextQ), Seq(CorpusQ), Seq(DedupQ), Seq(SimQ), Seq(MultimodalQ),
    Seq(StarQ, GoldQ), Seq(WindowQ), Seq(ReshapeQ), Seq(TpchQ), Seq(AsofQ),
    Seq(OlapQ), Seq(FlightsQ),
    // r7+ additions go in NEW trailing groups: round-over-round bench
    // rows for the established groups stay apples-to-apples.
    Seq(GraphQ), Seq(PrepQ), Seq(CurateQ), Seq(SketchQ), Seq(MonitorQ),
    Seq(SeqQ), Seq(MineQ),
    Seq(RetrievalQ), Seq(TimelineQ), Seq(OverlapQ), Seq(Corpus2Q),
    Seq(StatsQ), Seq(TokenizeQ), Seq(Prep2Q), Seq(EvalQ),
    Seq(RankQ), Seq(Curate2Q), Seq(QualityQ), Seq(Curate3Q),
    Seq(ClassifyQ), Seq(SegmentQ), Seq(Graph2Q), Seq(SpectralQ),
    Seq(Seq2Q), Seq(FingerprintQ), Seq(Mine2Q), Seq(Stats2Q), Seq(Sim2Q),
    Seq(Text2Q), Seq(Curate4Q), Seq(Sketch2Q), Seq(Asof2Q), Seq(Stats3Q),
    Seq(FeatureQ), Seq(RecQ), Seq(Stats4Q), Seq(LakeQ))

  /** Bench iteration order: group by group, queries name-sorted within
    * their group — fixed across rounds so per-query deltas are meaningful.
    * A group's cache-build warm steps (`*_build`) run FIRST, as their own
    * timed rows: the shared build cost gets a named row instead of being
    * billed to the alphabetically-first member (the r6 ep3_star_gold /
    * fd_airline_perf attribution artifact), and member rows measure
    * query cost against the warm cache. */
  def benchGroups: Seq[Seq[Q]] =
    packGroups.map(g =>
      g.flatMap(_.warms) ++ g.flatMap(_.queries).sortBy(_.name))

  /** All registered query packs. Order matters only for readability. */
  private val packs: Seq[QueryPack] = packGroups.flatten

  private lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    // Warm (bench-only) names participate in the uniqueness check too —
    // a warm shadowing a query name would corrupt Bench's per-name rows.
    val names = qs.map(_.name) ++ packs.flatMap(_.warms).map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    qs
  }

  /** Flagship on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full EP3 medallion path: cleanse → conformed star fact
    * (hash surrogate keys, 6 broadcast dim joins) → gold daily summary. */
  def entry(spark: SparkSession): DataFrame =
    queries("ep3_star_gold")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
