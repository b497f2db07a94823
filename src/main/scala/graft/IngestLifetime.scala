package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{CorpusIngest, FuzzyIngest, IngestEvents}

/** Lifetime-cost probe for the persistent ingest pipelines: drive MANY
  * micro-batches (far past the 2-4 the specs use) and measure what a
  * long-lived deployment actually pays — per-batch wall clock, state
  * partition count, and state file count — with and without a
  * [[CorpusIngest.compact]] cadence. This is the direct evidence for the
  * round's lifetime claims: per-batch cost must stay FLAT as history
  * accumulates (the bucketed-manifest design), and compaction must pin
  * partition/file count to a constant instead of O(batches).
  *
  * Workload shape: the documents table is sliced into `nBatches` equal
  * arrival groups; each batch also RE-delivers a slice of the previous
  * batch's docs (suppression work on every batch, like a re-crawl), so
  * the manifest grows while the anti-join path is exercised throughout.
  *
  * Usage: `runMain graft.IngestLifetime <sfDir> <corpus|fuzzy> <nBatches>
  * <compactEvery(0=never)> [fresh]`. `fresh` drops the re-delivery slice
  * — every batch is entirely new documents, the common daily case the
  * bloom pre-filters exist for (every probe misses ⇒ state joins are
  * skipped outright). Prints ONE JSON line with per-batch seconds and
  * state-size series.
  */
object IngestLifetime {

  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pipeline = args.lift(1).getOrElse("corpus")
    val nBatches = args.lift(2).map(_.toInt).getOrElse(24)
    val compactEvery = args.lift(3).map(_.toInt).getOrElse(0)
    val freshOnly = args.lift(4).contains("fresh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val state = graft.util.Scratch.fresh(s"lifetime_${pipeline}_$compactEvery")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
      .withColumn("__slice", pmod(col("doc_id"), lit(nBatches)).cast("int"))
      .persist()
    docs.count()

    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stateStats(): (Int, Int) = {
      val roots = pipeline match {
        case "corpus" => Seq(new Path(state))
        case _ => Seq(new Path(s"$state/idx"))
      }
      val existing = roots.filter(fs.exists(_))
      val parts = existing.map(r => fs.listStatus(r)
        .count(st => st.isDirectory && st.getPath.getName.startsWith("batch="))).sum
      val files = existing.map { r =>
        var n = 0
        val it = fs.listFiles(r, true)
        while (it.hasNext) { if (it.next().getPath.getName.startsWith("part-")) n += 1 }
        n
      }.sum
      (parts, files)
    }

    val rows = (0 until nBatches).map { b =>
      // fresh slice + re-delivery of ~half the previous slice
      val fresh = docs.filter(col("__slice") === b)
      val redelivered =
        if (b == 0 || freshOnly) fresh.limit(0)
        else docs.filter(col("__slice") === (b - 1) && pmod(col("doc_id"), lit(2)) === 0)
      val batch = fresh.unionByName(redelivered)
        .select(col("doc_id"), col("text"), col("lang"))
      val t0 = System.nanoTime()
      pipeline match {
        case "corpus" => CorpusIngest.ingestBatch(batch, b.toLong, state)
        case _ => FuzzyIngest.ingestBatch(batch, b.toLong, state)
      }
      val ingestSec = (System.nanoTime() - t0) / 1e9
      val tC = System.nanoTime()
      // the SHIPPED cadence: exactly what dedupIngest/fuzzyIngest's
      // foreachBatch hook runs when compactEvery is set (r11 — the probe
      // previously drove compact() by hand)
      val compacted = compactEvery > 0 && b > 0 && b % compactEvery == 0
      pipeline match {
        case "corpus" =>
          CorpusIngest.maybeAutoCompact(spark, state, b.toLong, compactEvery)
        case _ =>
          FuzzyIngest.maybeAutoCompact(spark, state, b.toLong, compactEvery)
      }
      val compactSec = (System.nanoTime() - tC) / 1e9
      val (parts, files) = stateStats()
      (b, ingestSec, if (compacted) compactSec else 0.0, parts, files)
    }

    val ev = IngestEvents.recent(Some(state))
    val appended = ev.map(_.appended).sum
    val suppressed = ev.map(_.suppressed).sum
    def arr(f: ((Int, Double, Double, Int, Int)) => String) =
      rows.map(f).mkString("[", ",", "]")
    println(
      s"""{"metric":"ingest_lifetime_$pipeline","sf_dir":"$sfDir",""" +
        s""""n_batches":$nBatches,"compact_every":$compactEvery,""" +
        s""""fresh_only":$freshOnly,""" +
        s""""bloom_skips":${ev.count(_.bloomProbable == 0)},""" +
        s""""ingest_sec":${arr(r => f"${r._2}%.3f")},""" +
        s""""compact_sec":${arr(r => f"${r._3}%.3f")},""" +
        s""""partitions":${arr(_._4.toString)},""" +
        s""""data_files":${arr(_._5.toString)},""" +
        s""""appended":$appended,"suppressed":$suppressed}""")
    spark.stop()
  }
}
