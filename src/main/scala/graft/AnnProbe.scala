package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Cost probe for the two `annSimilarityJoin` quantizers past the flat
  * cap (VERDICT r11 item 3): on an identical planted-cluster corpus,
  * run the join once with the flat codebook UNCAPPED (maxCells = kTotal,
  * the O(n·k) assignment the former design would have needed to keep
  * cells bounded) and once with the cap forcing the PRODUCT quantizer
  * (O(√kTotal) per row). Prints one JSON line with wall times, pair
  * counts, pair-set overlap, and per-quantizer cell-population maxima —
  * the evidence that the product path buys its asymptotics without
  * giving up the clustered-recall contract.
  *
  * Usage: AnnProbe [nClusters] [perCluster] [targetCellSize] [threshold]
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val nClusters = args.headOption.map(_.toInt).getOrElse(1200)
    val perCluster = args.lift(1).map(_.toInt).getOrElse(50)
    val target = args.lift(2).map(_.toLong).getOrElse(50L)
    val threshold = args.lift(3).map(_.toDouble).getOrElse(0.8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 16
    def unit(seed: Long): Array[Float] = {
      val v = Array.tabulate(dim) { d =>
        var h = seed * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL
        h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
        h ^= (h >>> 27)
        ((h & 0xFFFF).toDouble / 0xFFFF.toDouble - 0.5).toFloat
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rows = for {
      c <- 0 until nClusters
      p <- 0 until perCluster
    } yield {
      val center = unit(c + 1L)
      val pert = unit(1000000L + c.toLong * perCluster + p)
      val v = center.zip(pert).map { case (a, b) => a + 0.25f * b }
      ((c.toLong * perCluster + p), 0, v)
    }
    val data = rows.toDF("vec_id", "label", "embedding")
      .withColumn("blk", col("label"))
      .repartition(cpus.toInt).cache()
    val n = data.count()
    val kTotal = ((n + target - 1) / target).toInt

    def pairs(maxCells: Int, mProbe: Int): (Double, Long, Set[(Long, Long)], Long) = {
      val t0 = System.nanoTime()
      val out = Similarity.annSimilarityJoin(data, "blk", threshold,
        targetCellSize = target, mProbe = mProbe, maxCells = maxCells)
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val asg = Similarity.cellAssignments(data, "blk", target, mProbe, 2, maxCells)
        .getOrElse(sys.error(
          s"degenerate probe: n=$n <= targetCellSize=$target builds no " +
            "index — raise nClusters*perCluster or lower targetCellSize"))
      val maxCell = asg.groupBy(col("cid")).count().agg(max(col("count")))
        .head().getLong(0)
      val cells = asg.select(col("cid")).distinct().count()
      (sec, cells, out, maxCell)
    }

    // product first (cheap; probes 2× the flat count — the documented
    // parity setting for the fragmented combo space), then flat-uncapped
    // (the expensive control at the standard probe count)
    val (pSec, pCells, pPairs, pMax) = pairs(maxCells = 64, mProbe = 4)
    val (fSec, fCells, fPairs, fMax) = pairs(maxCells = kTotal max 2, mProbe = 2)
    val inter = (pPairs & fPairs).size.toDouble
    val jac = if ((pPairs | fPairs).isEmpty) 1.0 else inter / (pPairs | fPairs).size
    // the contract metric: recall of WITHIN-cluster pairs (the planted
    // near-dups); cross-cluster chance pairs are the isotropic tail no
    // sub-quadratic method retains and both quantizers shed differently
    def intraRecall(ps: Set[(Long, Long)]): Double = {
      val intra = ps.count { case (a, b) => a / perCluster == b / perCluster }
      intra.toDouble / (nClusters.toLong * perCluster * (perCluster - 1) / 2)
    }
    println(
      s"""{"metric":"ann_product_probe","n":$n,"kTotal":$kTotal,"threshold":$threshold,""" +
      s""""product":{"sec":${math.round(pSec * 100) / 100.0},"cells":$pCells,"pairs":${pPairs.size},"maxCell":$pMax,"intra_recall":${math.round(intraRecall(pPairs) * 10000) / 10000.0}},""" +
      s""""flat_uncapped":{"sec":${math.round(fSec * 100) / 100.0},"cells":$fCells,"pairs":${fPairs.size},"maxCell":$fMax,"intra_recall":${math.round(intraRecall(fPairs) * 10000) / 10000.0}},""" +
      s""""pair_jaccard":${math.round(jac * 10000) / 10000.0},"speedup":${math.round(fSec / pSec * 100) / 100.0}}""")
    spark.stop()
  }
}
