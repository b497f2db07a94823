package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the native expressions, so `spark.sql` text
  * queries can use them alongside the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
  }
}
