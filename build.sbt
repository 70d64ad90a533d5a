ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kektordbspark"
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
// Forked run output goes straight to this process's stdout/stderr instead of
// the sbt logger — the driver parses the bench JSON line from stdout and the
// default LoggedOutput "[info] " prefix broke that (BENCH_r01/r02 parsed:null).
outputStrategy := Some(StdoutOutput)
// ...and sbt's "[success] Total time" epilogue must not trail the JSON line
// (BENCH_r03 had clean JSON in stdout but the driver's parse still came up
// null — the success banner was the last line).
Global / showSuccess := false
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
  // 32g default (Xmx is a cap, not a reservation; the bench host has
  // 128 GiB): at 8g the 4096-query fusion plan-batch is GC-bound ~2x
  // slower while every small query looks normal — a masquerading "plan
  // regression" that cost an afternoon in r15. Override with
  // SPARK_DRIVER_MEM for constrained hosts.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
