package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native codegen expressions must agree exactly with the declarative
  * forms they replaced (same double fold order), in both the codegen and
  * interpreted eval paths.
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("DotProduct equals the higher-order-function fold bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.25f)),
      (Array(0.1f, 0.2f), Array(0.3f, 0.7f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val rows = df.select(
      DotProduct(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native $n != hof $h") }
  }

  test("DotProduct handles double arrays and mixed float/double inputs") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    val got = df.select(DotProduct(col("a"), col("b"))).as[Double].head()
    assert(got == 11.0)
  }

  test("DotProduct null array yields null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(DotProduct(col("a"), col("b"))).head().isNullAt(0))
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 9L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L)),
      (Array(-5L, 0L, 2L), Array(-5L, 0L, 2L))
    ).toDF("a", "b")
    val rows = df.select(
      SortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, b) => assert(n == b, s"native $n != builtin $b") }
  }

  test("native expressions agree between codegen and interpreted eval") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val expected = 32.0
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.select(DotProduct(col("a"), col("b"))).as[Double].head() == expected)
    }
    withSQLConf("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      assert(df.select(DotProduct(col("a"), col("b"))).as[Double].head() == expected)
    }
  }

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
         graft_sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 9L)) AS c""")
      .as[(Double, Long)].head()
    assert(row == ((11.0, 2L)))
  }

  test("graft_dot resolves from SQL text via the GraftExtensions config path") {
    // a fresh session has a fresh FunctionRegistry — nothing registered by
    // GraftFunctions.register here, so resolution can only come from the
    // spark.sql.extensions=GraftExtensions config the session was built with
    val fresh = spark.newSession()
    val d = fresh.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(d == 11.0)
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
