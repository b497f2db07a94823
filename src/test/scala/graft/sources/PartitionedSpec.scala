package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class PartitionedSpec extends SparkSpec {

  test("partition pruning: filter on the partition column prunes to ONE directory") {
    val df = graft.catalog.RelationalQueries.queries("scan_partition_prune")(spark, sfDir)
    val prepared = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = prepared.collect { case s: FileSourceScanExec => s }
    assert(scan.nonEmpty, "no file scan in plan")
    // the partition predicate must bind at plan time, not as a data filter
    assert(scan.head.partitionFilters.nonEmpty,
      s"filter on the partition column must become a PartitionFilter: ${scan.head.metadata}")
    val priorities = Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_orderpriority"))).head().getLong(0)
    assert(priorities > 1, "test data must have multiple priorities")
    assert(scan.head.selectedPartitions.partitionCount == 1,
      s"point filter must prune to one of $priorities directories, " +
        s"read ${scan.head.selectedPartitions.partitionCount}")
    // and the data filter list must NOT re-check the partition predicate
    assert(!scan.head.dataFilters.exists(_.references.exists(_.name == "o_orderpriority")),
      s"partition predicate leaked into dataFilters: ${scan.head.dataFilters}")
  }

  test("join_dpp: dim filter prunes fact partitions at RUNTIME via DPP") {
    val df = graft.catalog.RelationalQueries.queries("join_dpp")(spark, sfDir)
    // the dynamic pruning subquery is planned before execution — it lives
    // in the scan's partitionFilters as a DynamicPruningExpression.
    // AdaptiveSparkPlanExec exposes no children, so unwrap it first.
    val prepared = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = prepared.collectWithSubqueries {
      case s: FileSourceScanExec if s.partitionFilters.nonEmpty => s
    }
    val dpp = scans.flatMap(_.partitionFilters).exists {
      _.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])
    }
    assert(dpp, s"expected a DynamicPruningExpression on the fact scan:\n" +
      df.queryExecution.executedPlan)
    // and the pruned join returns exactly the plain-join rows
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1-URGENT", "2-HIGH"))
    val expect = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(rows.map(_.getLong(1)).sum == expect)
  }

  test("partitioned layout round-trips values with spaces and all rows") {
    val part = Partitioned.orders(spark, sfDir)
    val src = Tables.orders(spark, sfDir)
    assert(part.count() == src.count())
    // '4-NOT SPECIFIED' contains a space — directory escaping must round-trip
    val spaced = "4-NOT SPECIFIED"
    assert(part.filter(col("o_orderpriority") === spaced).count() ==
      src.filter(col("o_orderpriority") === spaced).count())
    // partition column comes back as string, not a type-inferred surprise
    assert(part.schema("o_orderpriority").dataType.typeName == "string")
  }
}
