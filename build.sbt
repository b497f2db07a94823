ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkatoparquetspark"
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
// The driver parses graft.Bench's single JSON stdout line; sbt's default
// forked-run output strategy wraps every line in "[info] ", which both
// breaks a strict per-line JSON parse and eats into the driver's bounded
// output-tail window. Pass the child's stdout through untouched.
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
  // Deliberately modest heap: Spark's ContextCleaner frees shuffle/
  // broadcast state only when GC runs, and with a huge heap GC never
  // triggers — measured 57-query runs degrade 57s → 338s at 48g while
  // staying stable at 8g (see BASELINE.md). periodicGC.interval in the
  // session configs backstops this.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK 17 ships GCLockerRetryAllocationCount=2: a task thread whose
  // allocation loses the race against JNI critical sections (parquet/
  // snappy readers) twice gets a spurious OOM-shaped failure, which in
  // local mode kills the executor thread and stops the SparkContext —
  // one such event aborted a whole sf10 rehearsal run (r19; the
  // "Retried waiting for GCLocker too often" warning precedes it). The
  // standard mitigation is raising the retry budget; GC behavior is
  // otherwise unchanged.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
