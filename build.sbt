ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dolphinbeatspark"
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
// The JUnit XML reports accumulate one file per suite ACROSS runs, so a
// deleted suite's stale report inflates artifact counts (round-10 hygiene
// finding). Wipe the dir before a full `test` run: report count == live
// suite count afterwards. `testOnly` keeps its incremental reports.
val cleanTestReports = taskKey[Unit]("delete stale JUnit XML test reports")
cleanTestReports := IO.delete(target.value / "test-reports")
Test / test := (Test / test).dependsOn(cleanTestReports).value
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
  // 32g, not 8g: the bench session runs ~190 queries sharing dozens of
  // persisted MEMORY_AND_DISK frames; at 8g the storage fraction evicts
  // and the heavy ANN/graph queries re-derive their cached inputs every
  // round (measured: s14 9.6s in the full 186-query session vs 4.5s in a
  // fresh one, s13 3.9 vs 2.3, m10 7.8 vs 3.9 — flat q01/q03 controls
  // rule out box noise). The box has 128 GiB; 32g restores the
  // warm-cache contract the bench method string promises.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
