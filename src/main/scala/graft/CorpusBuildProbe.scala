package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Times the composed batch corpus build in both stage-boundary forms
  * (VERDICT r15 item 3): executor-cached (`CorpusBuild.build`) vs
  * parquet-materialized (`CorpusBuild.buildMaterialized`) — the cached
  * form is the single-job library default, the materialized form is the
  * production contract (auditable, restartable stage TABLES). Prints one
  * JSON line per form with the wall time and the identical row count.
  *
  * `runMain graft.CorpusBuildProbe <sfDir> [runs]`
  */
object CorpusBuildProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the catalog key's threshold chain (same fold as llm_corpus_build)
    val thr = catalog.LlmQueries.mixtureThresholdChain

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm FS/footers so form order doesn't bias run 1

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    var cachedRows = -1L; var matRows = -1L
    val cached = (1 to runs).map { _ =>
      val (t, n) = time {
        val c = operators.CorpusBuild.build(docs, thr).count()
        spark.catalog.clearCache(); c
      }
      cachedRows = n; t
    }
    val stage = java.nio.file.Files.createTempDirectory("graft_cbp_")
    val mat = (1 to runs).map { _ =>
      val (t, n) = time(operators.CorpusBuild
        .buildMaterialized(docs, thr, stage.toString).count())
      matRows = n; t
    }
    require(cachedRows == matRows,
      s"form outputs diverge: cached=$cachedRows materialized=$matRows")
    println(s"""{"metric":"corpus_build_forms","sf":"$dir","runs":$runs,""" +
      s""""rows":$cachedRows,"cached_sec":${med(cached)},""" +
      s""""materialized_sec":${med(mat)}}""")
    spark.stop()
  }
}
