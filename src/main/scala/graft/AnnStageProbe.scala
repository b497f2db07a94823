package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution for `Similarity.annSimilarityJoin` at
  * rehearsal scale (VERDICT r17 item 1): the r17 sf100 re-measure
  * proved the seeding-pool cap alone moved nothing (484.7 → 484.1 s),
  * so the remaining wall must be NAMED per stage, not guessed. The
  * probe times, on the catalog key's own parameters (blk = label,
  * threshold 0.2, targetCellSize 2000):
  *
  *  1. `seed+assign` — `cellAssignments(iters = 0)` forced through the
  *     noop sink: the content-hash sample cut, the driver-side Gonzalez
  *     loop, and one O(n·k·dim) assignment pass, no Lloyd refinement;
  *  2. `lloyd x2` — `cellAssignments(iters = 2)` forced the same way,
  *     minus stage 1: two O(n·k·dim) Lloyd kernels;
  *  3. `pairs (unordered)` — the full join at iters = 2 without the
  *     catalog key's final global sort;
  *  4. `pairs + orderBy` — the catalog-identical form, so stage 4 − 3
  *     is the output sort's share.
  *
  * Also prints n, k, cell-count and max-cell-population (boundedness of
  * the within-cell pair work) and the output pair count (whether the
  * join is output-bound). One JSON line at the end for the artifact.
  *
  * `runMain graft.AnnStageProbe <sfDir> [targetCellSize] [threshold]`
  */
object AnnStageProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val target = args.lift(1).map(_.toLong).getOrElse(2000L)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      times(label) = dt
      println(f"[annstage] $label%-24s $dt%8.2fs  $r")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -2L
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("blk", col("label"))
    val n = emb.count()
    val k = math.max(1L, (n + target - 1) / target)
    println(s"[annstage] n=$n k=$k target=$target threshold=$threshold")

    timed("seed+assign (iters=0)") {
      operators.Similarity.cellAssignments(emb, "blk", target,
        mProbe = 2, iters = 0, maxCells = 4096).map(noop).getOrElse(-1L)
    }
    timed("seed+assign+lloyd2") {
      operators.Similarity.cellAssignments(emb, "blk", target,
        mProbe = 2, iters = 2, maxCells = 4096).map(noop).getOrElse(-1L)
    }
    val asg = operators.Similarity.cellAssignments(emb, "blk", target,
      mProbe = 2, iters = 2, maxCells = 4096)
    val (cells, maxCell) = asg match {
      case Some(a) =>
        val pop = a.groupBy(col("cid")).count()
          .agg(count(lit(1)), max(col("count"))).head()
        (pop.getLong(0), pop.getLong(1))
      case None => (0L, 0L)
    }
    println(s"[annstage] cells=$cells maxCellPop=$maxCell")
    // Pair count is a VALUE, not a stage (ADVICE r18): .count() replans
    // as Aggregate(count(1)) — the exact hazard the noop sink exists to
    // avoid — so its duration must not share the stages map with the
    // catalog-plan timings. Timed locally for the log line only.
    val tPairs0 = System.nanoTime()
    val pairs = operators.Similarity.annSimilarityJoin(emb, "blk", threshold,
      targetCellSize = target).count()
    println(f"[annstage] pair count (replanned, not a stage) " +
      f"${(System.nanoTime() - tPairs0) / 1e9}%8.2fs  $pairs")
    timed("pairs unordered (noop)") {
      noop(operators.Similarity.annSimilarityJoin(emb, "blk", threshold,
        targetCellSize = target))
    }
    timed("pairs + orderBy (noop)") {
      noop(operators.Similarity.annSimilarityJoin(emb, "blk", threshold,
        targetCellSize = target).orderBy(col("a_id"), col("b_id")))
    }
    def fmt(d: Double) = f"$d%.2f"
    println(s"""{"metric":"ann_stage","sf":"$dir","n":$n,"k":$k""" +
      s""","threshold":$threshold""" +
      s""","cells":$cells,"max_cell_pop":$maxCell,"pairs":$pairs""" +
      s""","stages":{${times.map { case (l, d) =>
        "\"" + l + "\":" + fmt(d) }.mkString(",")}}""" +
      s""","cpus":$cpus,"shuffle_partitions":$shuf}""")
    spark.stop()
  }
}
