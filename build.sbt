ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "frolykspark"
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
// Forked run output goes straight to this process's stdout/stderr instead
// of through sbt's logger — round 1/2 bench JSON lines came out prefixed
// with "[info] ", which the driver's parser rejected (BENCH_r0{1,2}.json
// "parsed": null).
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
  // Measured on the full 72-query bench: 8g beats 24g (78.7s vs 88-150s;
  // q_dedup_simhash 2.5s vs 11.5s) — with a 24g heap G1 defers collection
  // until giant mixed collections stall all 32 compute threads mid-query,
  // while at 8g collections stay small and frequent. Don't "fix" GC noise
  // by raising this again without re-measuring the full run.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // OOM forensics (VERDICT r18 #1b): the r18 driver bench died with
  // Spark's exit code 52 (SparkUncaughtExceptionHandler on an
  // OutOfMemoryError) and left nothing to attribute the spike to. A
  // heap dump at the moment of death names the allocation.
  "-XX:+HeapDumpOnOutOfMemoryError",
  "-XX:HeapDumpPath=/tmp",
)
