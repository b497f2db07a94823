package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{CorpusIngest, EmbedIngest}

/** Stage-cost probe for `llm_dedup_embed_incremental` — the
  * [[FuzzyReplayProbe]] twin for the semantic-ingest rehearsal: the three
  * synchronous [[EmbedIngest.ingestBatch]] calls vs the sign-band replay
  * vs the verdict aggregate, as one JSON line, so a bench regression in
  * the 12-second query is attributable per stage.
  *
  * Usage: EmbedReplayProbe [sfDir]
  */
object EmbedReplayProbe {
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

    val base = graft.util.Scratch.fresh("embed_probe")
    spark.conf.set(CorpusIngest.CapacityConf, (1L << 16).toString)
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    def rescale(src: org.apache.spark.sql.DataFrame, off: Long, f: Double) =
      src.select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * f).cast("float")).as("embedding"),
        col("label"))
    val seed = vecs.filter(col("vec_id") % 5 === 0)
    val b0 = rescale(seed, 1000000L, 1.01)
      .unionByName(vecs.filter(col("vec_id") % 5 === 1))
    val b1 = rescale(vecs.filter(col("vec_id") % 5 === 1), 2000000L, 0.5)
      .unionByName(vecs.filter(col("vec_id") % 5 === 2))

    val (_, tSeed) = timed { EmbedIngest.ingestBatch(seed, -1L, s"$base/index") }
    val (_, tB0) = timed { EmbedIngest.ingestBatch(b0, 0L, s"$base/index") }
    val (_, tB1) = timed { EmbedIngest.ingestBatch(b1, 1L, s"$base/index") }

    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def uniq(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("fp"), col("embedding"))
        .orderBy(col("vec_id"))
      EmbedIngest.fingerprints(df)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val seedU = uniq(seed).persist(mad)
    val b0u = uniq(b0).persist(mad)
    val b1u = uniq(b1).persist(mad)
    import graft.functions.VectorFns.dot
    def survivors(batch: org.apache.spark.sql.DataFrame,
        hist: org.apache.spark.sql.DataFrame) = {
      val cand = EmbedIngest.bandsOf(batch)
        .join(EmbedIngest.bandsOf(hist.select(col("vec_id").as("h_id"),
          col("fp")), "h_id"), Seq("band", "bh"))
        .select(col("vec_id"), col("h_id")).distinct()
      val dup = cand
        .join(hist.select(col("vec_id").as("h_id"),
          col("embedding").as("h_emb"), col("nrm").as("h_nrm")), "h_id")
        .join(batch.select(col("vec_id"), col("embedding").as("b_emb"),
          col("nrm").as("b_nrm")), "vec_id")
        .filter(dot(col("b_emb"), col("h_emb")) /
          (col("b_nrm") * col("h_nrm")) >= 0.99)
        .select(col("vec_id")).distinct()
      batch.join(dup, Seq("vec_id"), "left_anti")
    }
    val (nKept, tReplay) = timed {
      val kept0 = survivors(b0u, seedU).persist(mad)
      val kept1 = survivors(b1u, seedU.unionByName(kept0))
      kept0.unionByName(kept1).count()
    }
    val (nIdx, tIndexRead) = timed {
      EmbedIngest.index(spark, s"$base/index")
        .filter(col("batch") >= 0).count()
    }
    val (nu, tCounts) = timed { b0u.count() + b1u.count() }

    println(s"""{"metric":"embed_replay_probe","sf_dir":"$sfDir",""" +
      s""""t_ingest3":${f"${tSeed + tB0 + tB1}%.2f"},"t_seed":${f"$tSeed%.2f"},""" +
      s""""t_b0":${f"$tB0%.2f"},"t_b1":${f"$tB1%.2f"},""" +
      s""""t_replay":${f"$tReplay%.2f"},"t_index_read":${f"$tIndexRead%.2f"},""" +
      s""""t_uniq_counts":${f"$tCounts%.2f"},""" +
      s""""n_replay_kept":$nKept,"n_index_kept":$nIdx,"n_uniq":$nu}""")
    spark.stop()
  }
}
