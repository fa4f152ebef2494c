ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "firmablecompanydatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession and a few tests swap sessions / tweak
// session conf — parallel suite execution races on that shared state
Test / parallelExecution := false
run / fork := true
// Forked run output must reach stdout RAW (no sbt `[info] ` log prefix):
// the driver parses Bench's single JSON line from stdout, and a logger
// prefix breaks `json.loads` (BENCH_r01.json recorded `parsed: null`).
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
// 16g default heap (was 8g): the bench sweep accumulates memoized
// localCheckpoint blocks across 234 queries in ONE JVM — at 8g the
// tail of the sweep ran under visible GC pressure (r19's uniform
// 1.5-2x inflation of untouched late-sweep queries), on a 128 GiB
// box. SPARK_GRAFT_EXTRA_JAVA_OPTS is the experiment hook (GC logs,
// code-cache sizing) so diagnosing this never needs a build edit.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
