ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wikipediaorgxmldumpimporterspark"
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
// The driver captures a bounded tail of sbt stdout and parses the
// bench/verify JSON lines from it. sbt's default output strategy routes
// the forked JVM's stdout through its logger, prefixing every line with
// "[info] " — which defeats strict JSON parsers (BENCH_r06 recorded
// parsed:null for exactly this reason). StdoutOutput inherits the
// parent's stdout instead, so the JSON lines land in the capture raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's "[success] Total time: ..." epilogue so the bench/verify
// JSON really is the TERMINAL stdout line in the driver's bounded-tail
// capture (BENCH_r10 parsed:null came from the epilogue landing after
// the JSON). BENCH.json on disk remains the artifact of record.
Global / showSuccess := false
Global / showTiming := false
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
  // 16g default on the 128 GiB bench host: the 32-thread local mode
  // runs hash joins / sort buffers for every core in one heap, and 8g
  // made the salted-join hash build spill (q92: 10.5 s -> ~3 s)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
