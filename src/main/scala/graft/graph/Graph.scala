package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph ranking — the companion to the dedup module's
  * connected components: CC answers "which nodes form a group", PageRank
  * answers "which nodes matter", and both run as the same per-round
  * join+aggregate shape over an edge list.
  *
  * Arithmetic is EXACT fixed-point integers, for the same reason as
  * [[graft.sim.KMeans]]: float PageRank sums per-neighbor contributions
  * in engine/partition-dependent order, so scores differ in the last ulp
  * across engines and rank ties flip. Here scores are BIGINTs scaled by
  * 10⁶, per-edge contributions are floor divisions (score div outdeg),
  * and the damping step is `150000 + (85 · Σcontrib) div 100` — integer
  * sums are associative, so the result is bit-identical on any engine
  * and replayable in SQL by unrolling the iterations.
  *
  * Scale shape (per iteration): one equi-join of the edge list with the
  * score table on src (shuffle bounded by |edges|) and one groupBy(dst)
  * sum with map-side partial aggregation — the textbook distributed
  * PageRank layout. Out-degrees are joined ONCE outside the loop;
  * `localCheckpoint` truncates lineage each round so the plan stays a
  * few nodes deep regardless of iteration count. Dangling nodes (no
  * out-edges) simply leak their mass, the common large-graph
  * simplification; callers wanting undirected semantics pass both edge
  * directions.
  */
object Graph {

  private val Scale = 1000000L

  /** `iters` rounds of damped PageRank (d = 0.85) over directed edges
    * (srcCol, dstCol). Returns (node, score): score is the fixed-point
    * BIGINT rank, initial value 10⁶ per node. */
  def pageRank(edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    // out-degree folded into the edge list once — each iteration then
    // only joins scores and aggregates, never recomputes degrees
    val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    var score = nodes.withColumn("score", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(score.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("score div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      score = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) +
            expr("(85 * coalesce(in_sum, CAST(0 AS BIGINT))) div 100"))
            .as("score"))
        .localCheckpoint()
    }
    score
  }
}
