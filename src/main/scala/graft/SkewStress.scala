package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planted-skew stress main (VERDICT r8 item 6): the sf1 replication
  * preserves sf0.1's key distributions, so this main PLANTS a power-law
  * key — ONE hot key carrying ≥ 10% of all rows (1-in-8 by orderkey
  * mod, ~12.5%) — and records whether the skew mitigations hold their
  * bench shape against it:
  *
  *  - `j10`-shaped supplier join, plain vs [[graft.etl.Skew.saltedJoin]]
  *    (salts = 8): the salted plan must spread the hot key across
  *    sub-keys (max (key, salt) group ≤ 2× hot/salts — asserted, not
  *    just printed) and keep max-task/median-task bounded;
  *  - the iterative graph pack (PageRank, label propagation, degree-
  *    ordered triangles) on an edge list with a planted hub node
  *    (~12.5% of all edges): per-round |edges| joins and the
  *    low-degree-endpoint wedge orientation are exactly the shapes
  *    that must NOT degenerate on a hub.
  *
  * Emits one JSON line per measurement (op, wall sec, rows, max/median
  * task ms over the heaviest stage) — the committed README record.
  * Run: `sbt "runMain graft.SkewStress [sfDir]"` (default /tmp/sf1,
  * built by tools/make_sf1.py). */
object SkewStress {
  private val Hot = 4242424242L

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = Sessions.local(appName = "graft-skew-stress")
    import spark.implicits._

    val taskMs = new scala.collection.mutable.HashMap[Int, scala.collection.mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskMs.synchronized {
          taskMs.getOrElseUpdate(t.stageId,
            scala.collection.mutable.ArrayBuffer.empty) += t.taskInfo.duration
        }
    })

    def measure(label: String)(action: => Long): Unit = {
      taskMs.synchronized(taskMs.clear())
      val t0 = System.nanoTime()
      val rows = action
      val secs = (System.nanoTime() - t0) / 1e9
      val heavy = taskMs.synchronized {
        taskMs.values.map(_.toSeq).toSeq.sortBy(-_.sum).headOption.getOrElse(Seq(0L))
      }.sorted
      val maxT = heavy.last
      val medT = heavy(heavy.size / 2)
      println(f"""{"op":"$label","sec":$secs%.1f,"rows":$rows,""" +
        f""""max_task_ms":$maxT,"med_task_ms":$medT,""" +
        f""""max_over_med":${maxT.toDouble / math.max(medT, 1L)}%.1f}""")
    }

    // ── planted-skew join: ~12.5% of 6 M lineitem rows on ONE suppkey ──
    val li = Tables.lineitem(spark, sfDir)
    val big = li.select(
        when(pmod(col("l_orderkey"), lit(8L)) === 0L, lit(Hot))
          .otherwise(col("l_suppkey")).as("suppkey"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .localCheckpoint() // measure the join, not the remap
    val small = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      .union(Seq((Hot, 99L)).toDF("suppkey", "s_nationkey"))
    val hotRows = big.filter(col("suppkey") === Hot).count()
    val totRows = big.count()
    require(hotRows * 10L >= totRows,
      s"planted key must carry >= 10% of rows, has $hotRows / $totRows")
    println(s"""{"op":"plant","hot_rows":$hotRows,"total_rows":$totRows}""")

    // the salted sub-key bound — the ScaleSpec law at sf1 volume
    val maxSub = graft.etl.Skew
      .saltedJoin(big, small, Seq("suppkey"), salts = 8,
        saltSource = Seq("l_orderkey", "l_linenumber"))
      .filter(col("suppkey") === Hot)
      .groupBy(graft.etl.Skew.saltFrom(8, col("l_orderkey"), col("l_linenumber")))
      .count().agg(max("count")).head().getLong(0)
    require(maxSub <= 2L * hotRows / 8L,
      s"salted hot-key sub-group $maxSub exceeds 2x fair share ${2L * hotRows / 8L}")
    println(s"""{"op":"salt_bound","max_subkey_rows":$maxSub,"fair_share":${hotRows / 8L}}""")

    def aggOf(j: DataFrame): Long =
      j.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"))
        .count()
    measure("join_plain_aqe")(aggOf(big.join(small, Seq("suppkey"))))
    measure("join_salted")(aggOf(graft.etl.Skew.saltedJoin(
      big, small, Seq("suppkey"), salts = 8,
      saltSource = Seq("l_orderkey", "l_linenumber"))))

    // ── graph pack with a planted hub: ~12.5% of 1 M event edges ──
    val ev = Tables.events(spark, sfDir)
    val edges = ev.select(
        col("user_id").as("src"),
        when(pmod(col("event_id"), lit(8L)) === 0L, lit(Hot))
          .otherwise(pmod(xxhash64(col("event_id")), lit(50000L))).as("dst"))
      .localCheckpoint()
    measure("gr_pagerank_hub")(
      graft.graph.Graph.pageRank(edges, iters = 3).count())
    measure("gr_labelprop_hub")(
      graft.graph.Graph.labelPropagate(edges, iters = 3).count())
    measure("gr_triangles_hub")(
      graft.graph.Graph.triangleCounts(edges).count())

    spark.stop()
  }
}
