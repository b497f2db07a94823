package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the JvmGuard contract from both sides.
  *
  * Why the negative side needs a subprocess: the test JVM itself runs with
  * build.sbt's jdk17AddOpens (it must, or Spark wouldn't work), and module
  * opens cannot be retracted at runtime — so the only way to observe the
  * guard firing is a child JVM launched WITHOUT the flags. That child is
  * exactly the failure mode the guard exists for: the r13 sf10 bench ran in
  * such a JVM and produced a silently corrupt artifact (two queries died
  * mid-run on ZoneInfo/Kryo reflection, 151 ran fine).
  */
class JvmGuardSpec extends AnyFunSuite {

  test("positive: a correctly-launched JVM passes the guard") {
    JvmGuard.assertSparkModuleAccess() // must not throw — we ARE that JVM
  }

  test("negative: a flag-less JVM fails AT STARTUP naming the missing flags") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    // the guard's own main needs only the graft classes + scala-library on
    // the child's classpath — no Spark jars
    val sep = java.io.File.pathSeparator
    val scalaLib = sys.props("java.class.path").split(sep)
      .find(_.contains("scala-library")).getOrElse(
        fail("scala-library not on test classpath"))
    val pb = new ProcessBuilder(
      javaBin, "-cp", classes + sep + scalaLib, "graft.JvmGuard")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    assert(code != 0, s"flag-less child exited 0; output: $out")
    assert(out.contains("--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"),
      s"error must name the missing flags verbatim; got: $out")
    assert(out.contains("JavaModuleOptions"), s"got: $out")
  }
}
