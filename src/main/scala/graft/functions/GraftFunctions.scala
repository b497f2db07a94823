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
      "graft_dot",
      GraftExtensions.binaryBuilder("graft_dot", DotProduct(_, _)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      GraftExtensions.binaryBuilder("graft_sorted_intersect_count",
        SortedIntersectCount(_, _)), "built-in")
  }
}
