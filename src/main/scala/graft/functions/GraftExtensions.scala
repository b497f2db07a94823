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
    // Runs during SparkSession construction, which makes it the one hook
    // that also covers EMBEDDERS (users calling graft library code from
    // their own session, never passing through a graft main): a JVM
    // missing Spark's JDK-17 --add-opens set fails HERE at session build,
    // naming the flags, instead of mid-query on the first reflective path
    // (see JvmGuard's scaladoc for the measured incident).
    graft.JvmGuard.assertSparkModuleAccess()
    ext.injectOptimizerRule(_ => DotProductRewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      GraftExtensions.binaryBuilder("graft_dot", DotProduct(_, _))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      GraftExtensions.binaryBuilder("graft_sorted_intersect_count",
        SortedIntersectCount(_, _))))
  }
}

object GraftExtensions {
  /** Arity-checked builder: a wrong-arity SQL call gets a clean analysis
    * error naming the function, not an IndexOutOfBoundsException from
    * `exprs(1)`.
    */
  private[functions] def binaryBuilder(name: String,
      f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map("functionName" -> name, "expectedNum" -> "2",
            "actualNum" -> exprs.length.toString, "docroot" -> ""))
      f(exprs(0), exprs(1))
    }
}
