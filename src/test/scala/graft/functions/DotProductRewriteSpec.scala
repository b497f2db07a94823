package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class DotProductRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(df: DataFrame, a: String, b: String): DataFrame =
    df.select(aggregate(
      zip_with(col(a), col(b), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))

  private def rewriteFired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: DotProduct => true
      case _ => false
    })

  test("HOF dot-product pattern rewrites to the codegen kernel, same result") {
    // range+map source: a LocalRelation would be constant-folded away
    // before the plan can be inspected
    val src = spark.range(2)
      .map(i => (Array((i + 1).toFloat, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
    val df = hofDot(src, "a", "b")
    assert(rewriteFired(df), df.queryExecution.optimizedPlan.toString)
    assert(df.as[Double].collect().sorted.toSeq == Seq(11.0, 14.0))
  }

  test("rewrite declines on nullable elements (HOF null semantics differ)") {
    // parquet-read arrays have containsNull=true — a null element makes
    // the HOF null, which DotProduct would silently treat as 0
    val df = hofDot(Tables.embeddings(spark, sfDir), "embedding", "embedding")
    assert(!rewriteFired(df), "must not rewrite when a null element could change the result")
  }

  test("rewrite declines a raw float multiply (no double cast): precision differs") {
    // (x, y) -> x * y over float arrays multiplies IN FLOAT; DotProduct
    // multiplies in double — low bits differ, so the rule must not fire
    val src = spark.range(1).map(_ => (Array(1.1f, 2.0f), Array(1.1f, 4.0f))).toDF("a", "b")
    val df = src.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!rewriteFired(df),
      "float-precision multiply must not be replaced by a double-precision kernel")
    // HOF float product of 1.1f*1.1f, then widened: NOT equal to double product
    val hof = df.as[Double].head()
    assert(hof == 1.1f * 1.1f + 8.0f, s"float-rounded product expected, got $hof")
  }

  test("unequal lengths yield null after rewrite, matching zip_with padding") {
    val src = spark.range(1).map(_ => (Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
    val df = hofDot(src, "a", "b")
    assert(rewriteFired(df))
    assert(df.head().isNullAt(0), "zip_with null-pads the short side → HOF null")
  }
}
