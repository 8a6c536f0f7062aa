ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkstreamingpracticumspark"
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
  // the codegen class cache defaults to 100 entries — a 174-query
  // bench/verify JVM thrashes it and re-pays multi-second Janino
  // compiles of the biggest generated stages on every timed run
  "-Dspark.sql.codegen.cache.maxEntries=5000",
  // likewise the JIT code cache: hundreds of distinct generated stages
  // overflow the 240m default and disable the compiler mid-run
  "-XX:ReservedCodeCacheSize=512m",
  // 24g default: the bench/verify mains run 180+ query plans in one JVM
  // (thousands of codegen classes + per-query state); 8g drove the GC
  // hard enough late in a bench run to inflate the tail-query timings.
  // Sized for this 128 GiB contract box — on a smaller machine set
  // SPARK_DRIVER_MEM (the heap ceiling is allocated lazily, but a
  // 24g-deep GC cycle plus tmpfs bench scratch wants real headroom)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
