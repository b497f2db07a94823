package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("bucketed equi-join: sort-merge join with NO shuffle exchange, same results") {
    Bucketing.ensure(spark, sfDir)
    val o = spark.table(Bucketing.OrdersTable)
    val c = spark.table(Bucketing.CustomerTable)
    val joined = o.hint("merge").join(c, o("o_custkey") === c("c_custkey"))

    val plan = joined.queryExecution.sparkPlan
    assert(plan.collect { case s: SortMergeJoinExec => s }.nonEmpty,
      s"expected a sort-merge join:\n$plan")
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"bucketed join must not shuffle either side:\n$plan")

    val plain = Tables.orders(spark, sfDir).join(Tables.customer(spark, sfDir),
      col("o_custkey") === col("c_custkey"))
    assert(joined.count() == plain.count(),
      "bucketed layout must not change join results")
  }
}
