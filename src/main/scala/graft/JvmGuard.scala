package graft

/** Fail-fast check that the JVM was launched with the JDK-17+ module
  * options Spark needs (`spark-submit` injects them via
  * `org.apache.spark.launcher.JavaModuleOptions`; sbt forks get them from
  * build.sbt's `jdk17AddOpens`).
  *
  * Why this exists: a JVM missing the flags does NOT fail at startup — it
  * fails deep inside whichever query first touches a guarded path, and only
  * on data that exercises it. The r13 sf10 rehearsal lost a whole bench run
  * this way: `sink_roundtrip_avro_logical` died in
  * `SparkDateTimeUtils`' `sun.util.calendar.ZoneInfo` method-handle lookup
  * (reached only for pre-Gregorian-cutover rebase dates, so sf0.1 never saw
  * it) and `llm_heavy_hitters` died in Kryo field reflection over the
  * aggregation buffer — 150 other queries ran fine, leaving a silently
  * corrupt artifact. A loud startup error is strictly better.
  */
object JvmGuard {
  // The subset of JavaModuleOptions.defaultModuleOptions() packages graft
  // actually exercises (reflective encoders, Kryo buffers, nio channels,
  // the legacy-calendar rebase path).
  private val neededOpen = Seq(
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "sun.nio.ch", "sun.security.action", "sun.util.calendar")

  /** Standalone preflight: `java -cp <classes> graft.JvmGuard` exits 0 iff
    * this JVM could run Spark; otherwise the exception names the flags. */
  def main(args: Array[String]): Unit = {
    assertSparkModuleAccess()
    println("ok: Spark JDK-17 module options present")
  }

  /** Throws IllegalStateException naming every missing `--add-opens` flag. */
  def assertSparkModuleAccess(): Unit = {
    val javaBase = classOf[Object].getModule
    val caller = getClass.getModule // graft is always on the classpath → unnamed
    val missing = neededOpen.filterNot(p => javaBase.isOpen(p, caller))
    if (missing.nonEmpty) throw new IllegalStateException(
      "JVM launched without Spark's JDK-17 module options; Spark will fail " +
        "mid-query (not at startup) on paths that need reflective access. " +
        "Missing: " + missing.map(p => s"--add-opens=java.base/$p=ALL-UNNAMED")
          .mkString(" ") +
        ". Launch via spark-submit / sbt run (both inject them), or pass " +
        "org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().")
  }
}
