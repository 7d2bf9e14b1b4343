ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// The container's platform charset is ASCII (file.encoding =
// ANSI_X3.4-1968); without an explicit -encoding, scalac reads UTF-8
// sources through it and silently mangles every non-ASCII character
// to '?' at COMPILE time (caught by the IO degenerate pin via a
// mangled test literal). Sources are UTF-8; say so.
ThisBuild / scalacOptions ++= Seq("-encoding", "UTF-8")
name := "pdexplainspark"
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
// Pass the forked process's stdout through untouched: the bench driver
// json-parses Bench's output line, and sbt's default LoggedOutput
// strategy would prefix it with "[info] " (broke BENCH_r03 parsing).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop the trailing "[success] Total time" line so the JSON
// stays the last line of stdout.
showSuccess := false
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
  // the forked JVM inherits the container's ASCII platform charset;
  // text writers that consult the platform default (CSV/JSON) would
  // mangle non-ASCII data on write — pin UTF-8 (IO.scala also sets it
  // per-writer, so the library is correct even without this)
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // extra forked-JVM flags for bench experiments (e.g. a
  // -XX:G1HeapRegionSize sweep), space-separated
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+").filter(_.nonEmpty))
