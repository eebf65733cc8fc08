package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended defaults.
  *
  * Local mode is for dev/test only; on a real cluster the same settings
  * arrive via spark-submit conf. AQE stays on everywhere: it gives runtime
  * join re-selection, skew-join splitting and partition coalescing, which
  * is our first line of defense at 100 TB (SURVEY.md §4).
  */
object GraftSession {
  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the corpus events table is parquet TIMESTAMP(NANOS), which Spark
      // otherwise refuses to read (see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // iterative-plan pipelines (connected-components loops) generate
      // >100 distinct codegen classes; the default 100-entry class cache
      // thrashes and re-pays janino compiles on every execution (static
      // conf: applies to the first session built in the JVM)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // native SQL functions + the null-guard pruning optimizer rule --
    // idempotent, so repeated getOrCreate callers are safe
    graft.plans.GraftExtensions.register(spark)
    spark
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(c => scala.util.Try(c.toInt).toOption)
      .getOrElse(Runtime.getRuntime.availableProcessors())
}
