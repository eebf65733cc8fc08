ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetcombinerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output defaults to sbt's logger, which prefixes every stdout
// line with "[info] " — that broke the driver's parse of Bench's one-line
// JSON in rounds 1-2 (BENCH_r0*.json "parsed": null). StdoutOutput pipes
// the child's stdout through verbatim so the JSON line starts at column 0.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Heap sizing for local[32] (32 executor threads in one JVM). 8g
  // thrashed GC on array-heavy queries (10-50 s variance + heartbeat RPC
  // timeouts); very large heaps were WORSE in a different way — lazy
  // first-touch of tens of GB mid-run stalled single queries for minutes
  // (page zeroing/THP work, invisible to GC+JIT counters; a measured q28
  // first run went 6.7 s -> 280 s under -Xms48g). 16g pre-touched at
  // startup keeps both failure modes off the timed path.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
  // 41 codegen-heavy queries in one JVM generate far more compiled code
  // than the 240m default code cache; overflow triggers flush/recompile
  // storms (bench diagnostics showed 20-40s of JIT wall time billed to
  // single queries late in a run)
  "-XX:ReservedCodeCacheSize=1g",
)
