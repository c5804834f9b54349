ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "coronavirusdashboardpipelineetlspark"
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
// The driver parses Bench's stdout for a bare JSON line; sbt's default
// LoggedOutput strategy prefixes every forked-process line with "[info] "
// (which breaks any per-line json parse) and prints a "[success]" banner
// after it. Pass the forked JVM's streams through raw and drop the banner
// so the JSON summary is the last clean stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  // local[32] is one JVM doing the work of a whole executor pool: at sf0.1
  // the EAV pipelines hold ~15M wide rows across 32 threads, and an
  // undersized heap taxes every query with GC. The box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
) ++
  // A/B hook: extra -Dspark.* system properties for the forked JVM
  // (SparkConf loads spark.* system properties), so config experiments
  // (AQE coalescing, cleaner GC cadence, ...) run without code edits.
  // Unset in the driver's environment — the default session is unchanged.
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
