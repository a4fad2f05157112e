ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "roarspark"
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
// Forked `run` output goes straight to stdout instead of through sbt's
// logger: the bench/verify mains print one machine-parsed JSON line,
// and the logger's "[info] " prefix breaks the driver's JSON parse
// (BENCH_r01.json recorded "parsed": null for exactly this reason).
run / outputStrategy := Some(StdoutOutput)
// …and the trailing "[success] Total time: …" banner lands AFTER the
// JSON line, so a driver that parses the LAST stdout line still gets
// null. Suppress the banner: the metric JSON is the final line.
ThisBuild / showSuccess := false
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
  // 16g default: the bench session holds 60+ query plans, codegen
  // classes and cached/checkpointed intermediates; at 8g the old gen
  // fills and GC pauses inflate the per-query timings ~1.5× (measured
  // 41s → 28s at sf0.1 going 8g → 16g on the 128 GiB bench host).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
