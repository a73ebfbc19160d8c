package graft

/** Diagnostic main: print the formatted physical plan of named
  * registered queries (all of them with no names given) against a
  * testdata dir — the plan-audit loop's manual lens.
  *
  * Usage: sbt "runMain graft.Explain <sfDir> [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val spark = Sessions.local(appName = "graft-explain")
    names.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
