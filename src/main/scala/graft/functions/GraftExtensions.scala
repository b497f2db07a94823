package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The cluster deployment path for the native expressions: register via
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * so every session on the cluster resolves `graft_dot` /
  * `graft_sorted_intersect_count` in SQL text without per-session setup —
  * the `SparkSessionExtensions.injectFunction` form of what
  * [[GraftFunctions.register]] does imperatively for an already-built
  * session. Both routes build the same codegen'd Catalyst expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
  }
}
