package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-question probe: does
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` actually
  * govern the partition count of a large exchange in this Spark build,
  * or does the exchange stay at `spark.sql.shuffle.partitions`? Prints
  * the post-shuffle partition count of a corpus-sized window exchange
  * (the `llm_dedup_substring` shape) under the session's settings —
  * empirical ground truth for the r18 Bench partition-sizing decision.
  *
  * `runMain graft.AqeProbe <sfDir> [initialPartitionNum]`
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val initial = args.lift(1).getOrElse("256")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initial)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("adaptive.enabled=" +
      spark.conf.get("spark.sql.adaptive.enabled"))
    println("coalescePartitions.enabled=" +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"))
    println("initialPartitionNum=" +
      spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum"))

    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val grams = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("__h", xxhash64(col("tok")))
      .withColumn("__len", length(col("tok")))
    val w = Window.partitionBy(col("__h"), col("__len"))
    val out = grams.withColumn("mult", count(lit(1)).over(w))
      .filter(col("mult") > 1)
    val t0 = System.nanoTime()
    val parts = out.rdd.getNumPartitions
    println(f"post-window partitions=$parts " +
      f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
    spark.stop()
  }
}
