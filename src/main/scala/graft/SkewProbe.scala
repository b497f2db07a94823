package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Observe AQE's `OptimizeSkewedJoin` on the SKEWED rehearsal draw
  * (VERDICT r9 #2): join the skew-derived orders (20% of copy>0 rows
  * collapsed onto ONE hot custkey) against customer as a shuffle join and
  * report whether the runtime split fired (`skew=true` in the executed
  * SortMergeJoin). `AqeSkewJoinSpec` pins the mechanism on synthetic
  * data; this main pins it on the skewed DRAW the scale bench measures.
  *
  * The skew thresholds are tuned to rehearsal size the same way a 100 TB
  * cluster tunes them to executor memory — the DEFAULT 256 MB threshold
  * targets partitions that would spill an executor, which a local[32]
  * rehearsal at sf1 never reaches; the 512 KB skewed-partition threshold
  * with a 256 KB advisory size (the two configs below) makes "hot key ≈
  * 9× the median partition" the trigger here exactly as "hot key ≫ spill
  * size" is the trigger there. The consumer is a GLOBAL aggregate: a
  * groupBy on the join key would pin the join's output partitioning and
  * OptimizeSkewedJoin would (correctly) refuse to split.
  *
  * Usage: `runMain graft.SkewProbe /tmp/graft_sf1_skew`. Exits non-zero
  * when no split was observed, so the scale harness fails loudly instead
  * of recording a silently unexercised path.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    // carry fact payload columns through the shuffle (the realistic
    // fact-to-dim shape; a key-only projection compresses the hot
    // partition below any sane byte threshold)
    val joined = o.join(c, o("o_custkey") === c("c_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"),
        count(col("o_orderpriority")).as("np"), count(col("o_orderdate")).as("nd"))
    val row = joined.collect().head
    val plan = joined.queryExecution.executedPlan.toString
    val splits = "skew=true".r.findAllIn(plan).size
    // hot-key sanity: the skewed draw must actually be skewed
    val hot = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n")).head()
    println(s"[skewprobe] rows=${row.getLong(0)} skewSplits=$splits " +
      s"hotKey=${hot.get(0)} hotRows=${hot.getLong(1)}")
    spark.stop()
    if (splits == 0) {
      System.err.println("[skewprobe] NO skew split observed — check the " +
        "draw was built with --skew and thresholds fit the data size")
      sys.exit(1)
    }
  }
}
