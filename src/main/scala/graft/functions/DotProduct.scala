package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `ArrayType(Float|Double)` columns.
  *
  * SURVEY §4.3(b): the higher-order-function formulation
  * (`aggregate(zip_with(...))`) showed up hot in BENCH — HOF lambdas are
  * interpreted per element and allocate an intermediate array per row-pair,
  * which dominates pairwise similarity joins. This expression is a single
  * codegen'd JVM loop over the two `ArrayData`s: no allocation, no
  * per-element virtual dispatch.
  *
  * Semantics match the HOF/oracle form exactly: elements promoted to
  * double, accumulated left-to-right, result double. Arrays of different
  * lengths dot over the common prefix; null elements contribute 0 (the
  * embedding corpus has neither).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val xf = elemType(left) == FloatType; val yf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val yGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += (double) $x.$xGet($i) * (double) $y.$yGet($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_product"
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftColumns.column(DotProduct(GraftColumns.expression(a), GraftColumns.expression(b)))
}
