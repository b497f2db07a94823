package graft.sources

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Bucketed-table layout: the co-located join path (SURVEY §2.B scale
  * posture — "pre-shuffle once, join many times").
  *
  * `orders` and `customer` are written `bucketBy(n, custkey)` +
  * `sortBy(custkey)`: both sides land pre-hash-partitioned on the join key,
  * so an equi-join on custkey plans as a sort-merge join with NO exchange
  * on either side (asserted by `BucketingSpec`). At 100 TB this is the
  * difference between re-shuffling the fact table on every join and paying
  * the shuffle once at ingest: any downstream join/aggregation keyed on
  * custkey reuses the layout for free.
  */
object Bucketing {
  val OrdersTable = "graft_orders_bkt"
  val CustomerTable = "graft_customer_bkt"

  /** A DEDICATED child session for bucketed-table reads, with
    * `autoBucketedScan` pinned off: the DisableUnnecessaryBucketedScan
    * preparation rule silently falls back to an UNBUCKETED scan when no
    * downstream operator needs the bucket distribution — which also
    * discards bucket PRUNING, turning the scan_bucket_prune point lookup
    * into a full-file sweep (caught by Explain: "Bucketed: false
    * (disabled by query planner)"). Session conf is planning-time state
    * (same rule as join_bloom_filtered's child session): flipping it on
    * the SHARED session would make every later bucketed-table plan depend
    * on whether a bucketed query ran first in the session. The child
    * shares the catalog (SharedState), so tables `ensure`d here are
    * visible everywhere.
    */
  def bucketedSession(s: SparkSession): SparkSession = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    s2.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    s2
  }

  private var bucketedFor: Option[(String, Int)] = None

  /** Idempotently materialize the bucketed twins of orders/customer for
    * `d` in the session catalog (external data in the scratch dir). One
    * write per (JVM, sf dir, bucket count); repeated query invocations
    * reuse the layout — which is the point of bucketing. A different
    * `buckets` forces a rebuild (a join co-partitioned at the wrong count
    * would silently reintroduce the exchange).
    */
  def ensure(s: SparkSession, d: String, buckets: Int = 8): Unit = synchronized {
    val fresh = !bucketedFor.contains((d, buckets)) ||
      !s.catalog.tableExists(OrdersTable) || !s.catalog.tableExists(CustomerTable)
    if (fresh) {
      val base = graft.util.Scratch.fresh(
        "bucketed_" + Integer.toHexString(d.hashCode))
      Tables.orders(s, d).write.mode("overwrite")
        .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders").saveAsTable(OrdersTable)
      Tables.customer(s, d).write.mode("overwrite")
        .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer").saveAsTable(CustomerTable)
      bucketedFor = Some((d, buckets))
    }
  }
}
