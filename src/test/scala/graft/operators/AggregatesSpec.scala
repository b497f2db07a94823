package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile tracks exact percentile within 5% per group") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("a90"),
        expr("percentile(l_extendedprice, 0.9)").as("e90"))
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, a50, e50, a90, e90) =>
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$flag p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"$flag p90: approx $a90 vs exact $e90")
    }
  }
}
