ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "chapterhousedbspark"
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
// Suites share one TestSession.spark inside the forked JVM, and the
// ingest specs exercise DedupStream/AnnStream.processBatch, whose
// DOCUMENTED concurrency contract temporarily rewrites session-global
// shuffle-width confs per batch. Running suites in parallel lets a
// plan-shape assertion (PlanSpec) observe a batch's width override —
// a real race seen once in a full run. Serial suites apply the same
// contract to the tests; wall time barely moves (every suite already
// saturates the shared local[32] session).
Test / parallelExecution := false
// Forked run output normally routes through sbt's logger, which prefixes
// every line with "[info] " — that breaks the driver's JSON-line parse of
// Bench's output (rounds 1-4 all recorded "parsed": null). StdoutOutput
// passes the child's stdout through verbatim.
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
  // local[32] on a 128 GiB box: the single JVM is driver AND all 32
  // executor threads, so the heap must hold 32 concurrent task
  // partitions — 8g silently under-sized the "cluster" by 16x relative
  // to the documented environment and made x100 harness runs OOM on
  // partition-cache inflation unless SPARK_DRIVER_MEM was hand-set
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
