ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "beamspark"
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
// Pass the forked process's stdout straight through (no "[info] "
// prefix) so Bench's single JSON result line stays machine-parseable.
run / outputStrategy := Some(StdoutOutput)
// ...and suppress the trailing "[success] Total time: ..." epilogue so
// the JSON line is the LAST line of stdout (the bench driver parses the
// final line; r1-r4 all recorded parsed=null because of the epilogue).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 32g default: the bench session runs 60+ queries that cache/
  // localCheckpoint intermediates; at 8g the storage pool evicts into
  // GC thrash and the shuffle-join timings degrade 3-6x.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // r20 (VERDICT r19 item 9 — session-growth hygiene): the bench JVM
  // JIT-compiles generated code for 256 queries × 3 passes plus the
  // streaming suite; the JDK 17 default ReservedCodeCacheSize (240m)
  // forces method flushing late in the session, so later passes re-pay
  // compilation that earlier passes already did — one source of the
  // uniform ~10% drift on sub-second queries as the suite grows.
  "-XX:ReservedCodeCacheSize=512m",
)
// Stale XML reports from since-deleted specs inflate the visible suite
// count (round 9's ScratchDebugSpec). Wipe the report dir before each
// test run so target/test-reports always matches the live suites.
Test / testOptions += {
  val reports = target.value / "test-reports"
  Tests.Setup(() => IO.delete(reports))
}
