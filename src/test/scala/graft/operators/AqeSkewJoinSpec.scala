package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The runtime leg of the skew story: `join_salted` / `join_salted_hotkey`
  * are the explicit ahead-of-time forms; this spec pins the AQE form —
  * `OptimizeSkewedJoin` splitting an oversized shuffle partition into
  * parallel sub-reads at RUNTIME with no query rewrite. A 100 TB plan can
  * rely on this only if the join is a shuffle join and the skew factors
  * are configured; both are asserted here, as is result parity (the split
  * must be semantics-preserving).
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition at runtime; results match the plain join") {
    // Dedicated child session: petabyte-scale skew thresholds lowered to
    // test size, broadcast disabled so the join actually shuffles (the
    // 10-row right side would otherwise broadcast and there'd be no
    // skewed exchange to split).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.shuffle.partitions", "4")

    // ~83% of the left side lands on key 0 — one reducer partition far
    // beyond factor x median. The md5 payload keeps shuffle bytes
    // incompressible so the partition actually crosses the byte
    // threshold, and the consumer is a GLOBAL aggregate: a groupBy on the
    // join key would require hash distribution on the join output, and
    // OptimizeSkewedJoin refuses to split a partition whose partitioning
    // a parent still needs (that IS the contract this spec documents).
    val left = s2.range(0, 60000).select(
      when(col("id") < 50000, 0L).otherwise(col("id") % 10).as("k"),
      col("id").as("v"),
      md5(col("id").cast("string")).as("pay"))
    val right = s2.range(0, 10).select(col("id").as("k"),
      (col("id") * 100).as("w"))

    val joined = left.join(right, "k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("w")).as("sw"), count(col("pay")).as("np"))
    val row = joined.collect().head

    // Parity: counts and sums survive the split untouched.
    assert(row.getLong(0) == 60000L, "every left row matches exactly once")
    assert(row.getLong(1) == (0L until 60000L).sum)
    // sum(w): key 0 contributes 0; keys 1..9 carry 1000 rows x 100k each
    assert(row.getLong(2) == (1 to 9).map(k => 1000L * k * 100L).sum)
    assert(row.getLong(3) == 60000L)

    // The executed (post-AQE) plan must show the skew-split sort-merge
    // join — `skew=true` is how SortMergeJoinExec prints the flag.
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"OptimizeSkewedJoin did not engage; final plan:\n$plan")
  }
}
