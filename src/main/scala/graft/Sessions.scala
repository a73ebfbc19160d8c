package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Centralizes the settings every entry point (Verify, Bench, tests, user
  * apps) needs so they cannot drift:
  *  - shuffle partitions sized to the local core count (the 100 TB deploy
  *    would size this to ~2-3× total executor cores, or rely on AQE
  *    coalescing — both paths are AQE-enabled here);
  *  - UTC session timezone so date extraction matches the oracle;
  *  - nanosAsLong so parquet TIMESTAMP(NANOS) columns (events.ts) are
  *    readable (Spark has no native nanos type).
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
