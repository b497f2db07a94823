package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.{CorpusIngest, FuzzyIngest}

/** Stage-cost probe for `llm_dedup_fuzzy_incremental`'s late-r12 shape: the
  * persistent-index ingest (unchanged since r12) vs the exact-replay
  * ground truth added for the hash oracle. Prints one JSON line with
  * per-stage wall times so a regression in either half is attributable
  * instead of folded into one bench number.
  *
  * Usage: FuzzyReplayProbe [sfDir]
  */
object FuzzyReplayProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val base = graft.util.Scratch.fresh("fuzzy_probe")
    spark.conf.set(CorpusIngest.CapacityConf, (1L << 16).toString)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    def nearDup(src: org.apache.spark.sql.DataFrame, off: Long, pad: String) =
      src.select((col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(pad)).as("text"), col("lang"))
    val seed = docs.filter(col("doc_id") % 5 === 0)
    val b0 = nearDup(seed, 1000000L, " recrawl")
      .unionByName(docs.filter(col("doc_id") % 5 === 1))
    val b1 = nearDup(docs.filter(col("doc_id") % 5 === 1), 2000000L, " mirror")
      .unionByName(docs.filter(col("doc_id") % 5 === 2))

    val (_, tSeed) = timed { FuzzyIngest.ingestBatch(seed, -1L, s"$base/index") }
    val (_, tB0) = timed { FuzzyIngest.ingestBatch(b0, 0L, s"$base/index") }
    val (_, tB1) = timed { FuzzyIngest.ingestBatch(b1, 1L, s"$base/index") }
    val tIngest = tSeed + tB0 + tB1

    def uniqByText(df: org.apache.spark.sql.DataFrame) = {
      val w = Window
        .partitionBy(xxhash64(coalesce(col("text"), lit(""))),
          coalesce(length(col("text")), lit(-1)))
        .orderBy(col("doc_id"))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val seedU = uniqByText(seed)
    val b0u = uniqByText(b0); val b1u = uniqByText(b1)

    val pairs = Dedup.shingleJaccardPairsGlobal(
      seedU.select(col("doc_id"), col("text"))
        .unionByName(b0u.select(col("doc_id"), col("text")))
        .unionByName(b1u.select(col("doc_id"), col("text"))),
      n = 3, threshold = 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nPairs, tSsjoin) = timed { pairs.count() }

    val edges = pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionByName(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
    def survivors(batch: org.apache.spark.sql.DataFrame,
        histIds: org.apache.spark.sql.DataFrame) = {
      val sup = edges
        .join(histIds.select(col("doc_id").as("y")), Seq("y"), "left_semi")
        .select(col("x").as("doc_id")).distinct()
      batch.join(sup, Seq("doc_id"), "left_anti")
    }
    val ((nKept, tReplay)) = timed {
      val kept0 = survivors(b0u, seedU)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kept1 = survivors(b1u,
        seedU.select(col("doc_id")).unionByName(kept0.select(col("doc_id"))))
      kept0.unionByName(kept1).count()
    }

    val (nIdx, tIndexRead) = timed {
      FuzzyIngest.index(spark, s"$base/index")
        .filter(col("batch") >= 0).count()
    }
    val (nu, tCounts) = timed { b0u.count() + b1u.count() }

    println(s"""{"metric":"fuzzy_replay_probe","sf_dir":"$sfDir",""" +
      s""""t_ingest3":${f"$tIngest%.2f"},"t_seed":${f"$tSeed%.2f"},""" +
      s""""t_b0":${f"$tB0%.2f"},"t_b1":${f"$tB1%.2f"},""" +
      s""""t_ssjoin":${f"$tSsjoin%.2f"},""" +
      s""""t_replay_rest":${f"$tReplay%.2f"},"t_index_read":${f"$tIndexRead%.2f"},""" +
      s""""t_uniq_counts":${f"$tCounts%.2f"},"n_pairs":$nPairs,""" +
      s""""n_replay_kept":$nKept,"n_index_kept":$nIdx,"n_uniq":$nu}""")
    spark.stop()
  }
}
