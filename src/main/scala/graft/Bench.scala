package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}} for the driver's
  * BENCH_r{N}.json. Timing includes plan + execution (count() action).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-bench")
    // One warm-up action so JVM/codegen startup isn't billed to the first query.
    SparkEntry.entry(spark).count()
    // Returns (seconds, errorOrNull). A query that crashes must NOT be
    // reported as a normal fast timing — failures are surfaced under an
    // "errors" key and excluded from the total.
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, String) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); null }
        catch { case e: Throwable => s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}" }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Best-of-2 per query: a single local[32] box takes multi-second
    // scheduling/GC stalls; min-of-N is the standard way to report the
    // achievable latency rather than the noise.
    val runs = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t1, e1) = timeOnce(fn)
      val (t2, e2) = timeOnce(fn)
      val err = if (e1 != null) e1 else e2
      (name, math.min(t1, t2), err)
    }
    val ok = runs.filter(_._3 == null)
    val failed = runs.filter(_._3 != null)
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case c if c < ' ' => " "; case c => c.toString }
    val qs = ok.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = failed.map { case (k, _, e) => "\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
