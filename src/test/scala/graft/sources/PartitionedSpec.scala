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
