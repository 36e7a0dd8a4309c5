ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nosqljoinstreamspark"
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
// The bench/verify contract is "ONE JSON line on stdout, last" — but sbt's
// default LoggedOutput re-logs forked output with an "[info] " prefix and
// appends its own "[success] Total time" line, so a driver tailing stdout
// never sees a line that parses as JSON. Pipe forked output straight
// through and suppress the success trailer.
outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // memory-pressure harness (r14 verdict #7): SPARK_GRAFT_MAX_RESULT=256m
  // caps spark.driver.maxResultSize so any hidden corpus-sized
  // materialization trips loudly instead of hiding in an 8g heap
  sys.env.get("SPARK_GRAFT_MAX_RESULT")
    .map(v => s"-Dspark.driver.maxResultSize=$v").toSeq ++
  // codegen-cache A/B dial (r14 verdict #8): the conditional-aggregate
  // fuzz gates read ~1.45x higher inside a 230-gate sweep than isolated;
  // spark.sql.codegen.cache.maxEntries is STATIC (default 100), so the
  // experiment needs a pre-session system property
  sys.env.get("SPARK_GRAFT_CODEGEN_CACHE")
    .map(v => s"-Dspark.sql.codegen.cache.maxEntries=$v").toSeq ++
  // the sibling hypothesis (r15 A/B): a 235-gate sweep compiles thousands
  // of generated classes — JVM code-cache flushing forces C2 re-JIT,
  // which Spark's own codegen cache cannot prevent
  sys.env.get("SPARK_GRAFT_CODE_CACHE")
    .map(v => s"-XX:ReservedCodeCacheSize=$v").toSeq
