ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stream4flowspark"
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
// forward forked-run output verbatim (no "[info] " log prefix) so the
// bench/verify JSON lines stay machine-parseable on stdout
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
  // local[32] runs driver+executors in THIS forked JVM: at 8g the
  // heavy-tier queries run GC-bound and the bench tail inherits the
  // debt (measured: late-position queries 1.5-2x their isolated
  // walls). 48g keeps the suite out of GC; lazily committed, so small
  // runs cost nothing extra.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ~160 registered queries x whole-stage codegen x two warmup passes ≈
  // thousands of generated classes: 512m still saturated mid-suite and
  // the sweeper's deopt churn inflated late-position sub-second queries
  // by 0.3-0.5 s (measured: q_pattern_finder 1.43 s at 512m vs 1.04 s
  // at 1g in otherwise identical full runs; suite aggregate 0.32 -> 0.27
  // of the comparator)
  "-XX:ReservedCodeCacheSize=1g",
  // Spark's generated-class cache (STATIC conf) holds only 100 entries
  // by default — a suite of ~40 queries × several codegen units thrashes
  // it, so every pass re-Janino-compiles and re-JITs what the last pass
  // already compiled (measured: mid-suite walls 1.5-2× their isolated
  // walls with hot methods deopted by the churn). Any long-lived session
  // running many distinct queries wants this raised.
  "-Dspark.sql.codegen.cache.maxEntries=4096",
)
