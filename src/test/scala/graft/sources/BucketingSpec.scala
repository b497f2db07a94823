package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("bucketed equi-join: sort-merge join with NO shuffle exchange, same results") {
    val s2 = Bucketing.bucketedSession(spark)
    Bucketing.ensure(s2, sfDir)
    val o = s2.table(Bucketing.OrdersTable)
    val c = s2.table(Bucketing.CustomerTable)
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

  test("bucket pruning: point lookup on the bucket column reads ONE bucket") {
    val df = graft.catalog.RelationalQueries.queries("scan_bucket_prune")(spark, sfDir)
    // executedPlan, NOT sparkPlan: the DisableUnnecessaryBucketedScan
    // preparation rule runs between them and (before bucketedSession
    // pinned autoBucketedScan off) silently discarded the bucketed scan —
    // and with it the pruning this test exists to pin.
    val prepared = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = prepared.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.nonEmpty, "no file scan in plan")
    assert(scan.head.bucketedScan,
      s"scan fell back to unbucketed: ${scan.head.metadata}")
    assert(scan.head.optionalBucketSet.exists(_.cardinality() == 1),
      s"point filter must prune to one bucket: ${scan.head.metadata}")
    // and the lookup returns the same rows as the unbucketed table
    val expect = Tables.orders(spark, sfDir).filter(col("o_custkey") === 37L).count()
    assert(df.count() == expect && expect > 0)
  }
}
