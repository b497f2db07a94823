package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Hive-style partitioned layout: the directory-pruning scan path
  * (SURVEY §2.B scale posture — "organize by the predicate you'll filter
  * on").
  *
  * `orders` is written `partitionBy("o_orderpriority")`: one directory per
  * priority value. A scan filtered on the partition column resolves the
  * matching directories at PLANNING time (`PartitionFilters` in the
  * FileSourceScanExec, asserted by `PartitionedSpec`) — the non-matching
  * directories are never listed into the scan, so at 100 TB a
  * single-priority query reads ~1/5 of the table's files with zero
  * runtime filtering cost. Complements [[Bucketing]]: partitioning prunes
  * on LOW-cardinality dimension values (one dir per value), bucketing on
  * HIGH-cardinality keys (hash-mod files); production tables use both.
  */
object Partitioned {
  private var builtFor: Option[String] = None
  private var path: String = _

  /** Idempotently materialize the partitioned twin of orders for `d` in
    * the scratch dir and return its root path. One write per (JVM, sf
    * dir); repeated query invocations reuse the layout — which is the
    * point of partitioning.
    */
  def ordersByPriority(s: SparkSession, d: String): String = synchronized {
    if (!builtFor.contains(d)) {
      val base = graft.util.Scratch.fresh(
        "partitioned_" + Integer.toHexString(d.hashCode))
      Tables.orders(s, d).write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(base)
      builtFor = Some(d)
      path = base
    }
    path
  }

  /** Read the partitioned layout back as a DataFrame (partition column
    * re-attached from the directory names).
    */
  def orders(s: SparkSession, d: String): DataFrame =
    s.read.parquet(ordersByPriority(s, d))

  /** The priority→tier dimension joined against the partitioned fact in
    * `join_dpp`. Single-sourced: the Spark dim parquet AND the oracle's
    * VALUES list are both built from this Seq, so the engines cannot
    * disagree on the mapping.
    */
  val PriorityTiers: Seq[(String, String)] = Seq(
    "1-URGENT" -> "hot", "2-HIGH" -> "hot",
    "3-MEDIUM" -> "cold", "4-NOT SPECIFIED" -> "cold", "5-LOW" -> "cold")

  /** DuckDB VALUES twin of [[PriorityTiers]]. */
  def priorityTiersSql: String =
    PriorityTiers.map { case (p, t) => s"('$p', '$t')" }
      .mkString("(VALUES ", ", ", ") dim(o_orderpriority, tier)")

  private var dimBuilt = false
  private var dimPath: String = _

  /** Materialize [[PriorityTiers]] as a parquet dim once per JVM. It must
    * be a FILE relation, not a LocalRelation: dynamic partition pruning
    * only plans a pruning subquery against a real scan — an in-memory
    * literal dim would constant-fold the join away entirely.
    */
  def priorityDim(s: SparkSession): DataFrame = synchronized {
    if (!dimBuilt) {
      import s.implicits._
      val p = graft.util.Scratch.fresh("priority_dim")
      PriorityTiers.toDF("o_orderpriority", "tier")
        .coalesce(1).write.mode("overwrite").parquet(p)
      dimPath = p
      dimBuilt = true
    }
    s.read.parquet(dimPath)
  }
}
