package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EmbedIngest

/** Cost probe for the SEMANTIC index lifecycle verbs — the
  * [[LifecycleProbe]] twin over [[EmbedIngest]] (r14: the single
  * (batch, kind)-partitioned layout replaced the two-table layout, so
  * the verbs' O(touched partitions) claim needs fresh scale evidence).
  * Builds a batch-deep embed index from the embeddings table, then
  * measures compact / retract / expire / merge wall times. Claims under
  * test: expire on non-compacted history is a whole-partition drop;
  * retract rewrites only the partitions holding its ids (one insert per
  * batch now covers BOTH kinds); merge is one candidates join + one
  * consolidated write.
  *
  * Usage: EmbedLifecycleProbe [sfDir] [nBatches]
  */
object EmbedLifecycleProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(20)
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
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val base = graft.util.Scratch.fresh("embed_lifecycle_probe")
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))

    // nBatches deliveries, each a distinct vec_id slice with a per-batch
    // sign flip of one dimension is NOT needed — distinct id spaces keep
    // every row surviving (worst case for index size); embeddings are
    // organic (max cosine ~0.51), so no cross-batch suppression fires
    val (_, tIngest) = timed {
      (0 until nBatches).foreach { b =>
        EmbedIngest.ingestBatch(
          vecs.filter(pmod(col("vec_id"), lit(nBatches)) === b)
            .select((col("vec_id") + b.toLong * 10000000L).as("vec_id"),
              col("embedding"), col("label")),
          b.toLong, s"$base/e")
      }
    }
    val total = EmbedIngest.index(spark, s"$base/e").count()

    // expire the oldest 1/4 of history: pure partition drops
    val cut = nBatches / 4 - 1
    val (nExp, tExpire) = timed {
      EmbedIngest.expire(spark, s"$base/e", cut.toLong)
    }

    // retract 10 ids scattered over two mid-history batches
    val victims = EmbedIngest.index(spark, s"$base/e")
      .filter(col("batch").isin(nBatches / 2, nBatches / 2 + 1))
      .select(col("vec_id")).limit(10)
    val vFrame = victims.as[Long].collect().toSeq.toDF("vec_id")
    val (nRet, tRetract) = timed {
      EmbedIngest.retract(spark, s"$base/e", vFrame)
    }

    // consolidate everything below the newest batch
    val (_, tCompact) = timed {
      EmbedIngest.compact(spark, s"$base/e", (nBatches - 2).toLong)
    }

    // second index (1/5 of the vectors, ids shifted out of e's space —
    // merge requires disjoint id spaces across the family)
    EmbedIngest.ingestBatch(
      vecs.filter(pmod(col("vec_id"), lit(5)) === 0)
        .select((col("vec_id") + 900000000L).as("vec_id"),
          col("embedding"), col("label")),
      0L, s"$base/e2")
    val (nMerged, tMerge) = timed {
      EmbedIngest.merge(spark, s"$base/e", s"$base/e2", s"$base/dst")
    }

    println(s"""{"metric":"embed_lifecycle_probe","sf_dir":"$sfDir","n_batches":$nBatches,""" +
      s""""rows_total":$total,"t_ingest":${f"$tIngest%.2f"},""" +
      s""""expired_rows":$nExp,"t_expire":${f"$tExpire%.2f"},""" +
      s""""retracted_rows":$nRet,"t_retract":${f"$tRetract%.2f"},""" +
      s""""t_compact":${f"$tCompact%.2f"},""" +
      s""""merged_rows":$nMerged,"t_merge":${f"$tMerge%.2f"}}""")
    spark.stop()
  }
}
