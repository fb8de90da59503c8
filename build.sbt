ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "data_integration_systemspark"
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
// Keep a runMain's stdout clean for the driver's JSON parse: forked
// output goes straight through (no "[info] " log prefix) and the
// "[success] Total time" footer is suppressed so graft.Bench's JSON
// line is the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g default (was 16g): the r19 bench series measured the 16g forked
  // session at 2.3x the GC of a 24g sibling, and one of three 16g runs
  // ate a full-GC pause mid-build that pushed two 3-4s store builds to
  // 13.6/28.6s (a false rc=1). The box has 128 GiB; headroom is free.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A ~100-query bench session generates hundreds of whole-stage-codegen
  // classes; the JDK default 240 MB code cache fills mid-session, the
  // JIT stops compiling, and late heavy queries run 2-3x their isolated
  // steady state (r5: dd_jaccard 14.3 s in-session vs 5.4 s warm
  // standalone). Size the cache for the whole session instead.
  "-XX:ReservedCodeCacheSize=1g",
)
