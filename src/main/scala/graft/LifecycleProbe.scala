package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CorpusIngest

/** Cost probe for the manifest lifecycle verbs (late r12): build a
  * batch-deep manifest from the documents table, then measure
  * compact / retract / expire / merge wall times and the file counts
  * they touch. The claims under test: expire on non-compacted history
  * is a whole-partition drop (no rewrite — time independent of manifest
  * row count); retract rewrites ONLY the partitions holding its ids;
  * merge is one digest-keyed shuffle over the union.
  *
  * Usage: LifecycleProbe [sfDir] [nBatches]
  */
object LifecycleProbe {
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

    val base = graft.util.Scratch.fresh("lifecycle_probe")
    spark.conf.set(CorpusIngest.CapacityConf, (1L << 16).toString)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))

    // nBatches deliveries, each a distinct doc_id slice (texts made
    // unique per batch so every row survives — worst case for state size)
    val (_, tIngest) = timed {
      (0 until nBatches).foreach { b =>
        CorpusIngest.ingestBatch(
          docs.filter(col("doc_id") % nBatches === b)
            .select((col("doc_id") + b * 10000000L).as("doc_id"),
              concat(col("text"), lit(s" b$b")).as("text"), col("lang")),
          b.toLong, s"$base/m")
      }
    }
    val total = CorpusIngest.manifest(spark, s"$base/m").count()

    // expire the oldest 1/4 of history: pure partition drops
    val cut = nBatches / 4 - 1
    val (nExp, tExpire) = timed {
      CorpusIngest.expire(spark, s"$base/m", cut.toLong)
    }

    // retract 10 ids scattered over two mid-history batches
    val victims = CorpusIngest.manifest(spark, s"$base/m")
      .filter(col("batch").isin(nBatches / 2, nBatches / 2 + 1))
      .select(col("doc_id")).limit(10)
    val vFrame = victims.as[Long].collect().toSeq.toDF("doc_id")
    val (nRet, tRetract) = timed {
      CorpusIngest.retract(spark, s"$base/m", vFrame)
    }

    // consolidate everything below the newest batch
    val (_, tCompact) = timed {
      CorpusIngest.compact(spark, s"$base/m", (nBatches - 2).toLong)
    }

    // second manifest (1/5 of the docs, overlapping digests via the
    // same " b0" padding) then merge; ids shifted OUT of m's space —
    // merge requires disjoint id spaces across the family since r13
    CorpusIngest.ingestBatch(
      docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(col("text"), lit(" b0")).as("text"), col("lang")),
      0L, s"$base/m2")
    val (nMerged, tMerge) = timed {
      CorpusIngest.merge(spark, s"$base/m", s"$base/m2", s"$base/dst")
    }

    println(s"""{"metric":"lifecycle_probe","sf_dir":"$sfDir","n_batches":$nBatches,""" +
      s""""rows_total":$total,"t_ingest":${f"$tIngest%.2f"},""" +
      s""""expired_rows":$nExp,"t_expire":${f"$tExpire%.2f"},""" +
      s""""retracted_rows":$nRet,"t_retract":${f"$tRetract%.2f"},""" +
      s""""t_compact":${f"$tCompact%.2f"},""" +
      s""""merged_rows":$nMerged,"t_merge":${f"$tMerge%.2f"}}""")
    spark.stop()
  }
}
