package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level attribution for the exact prefix-filter SSJoin
  * (`Dedup.shingleJaccardPairsGlobal`) across the sf1→sf10 decade —
  * r13 VERDICT item 4 follow-up. The whole-surface decade measured
  * `llm_dedup_fuzzy` at exponent ~1.4 (sf1 6.95 s → sf10 158.9 s at
  * 256 shuffle partitions) while every stage of the SSJoin is
  * copy-local by `ScaleUp`'s disjoint-vocabulary construction and
  * should scale ~linearly. This probe re-runs the same pipeline
  * stage-by-stage (same expressions as `Dedup.prefixCandidates`, which
  * is private) and prints per-stage row counts AND wall times, so the
  * superlinear term can be NAMED (candidate blow-up vs posting shuffle
  * vs verify join vs persist pressure) instead of guessed.
  *
  * `runMain graft.SsjProbe <sfDir> [n] [threshold]`
  */
object SsjProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_r13")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ssj] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $r")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("docs.count")(docs.count())

    val g = operators.Dedup.slimGramSets(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("gramSets materialize")(g.count())

    // --- mirrors Dedup.prefixCandidates(g, Seq.empty, threshold) ---
    val posts = g.select(col("doc_id"), size(col("grams")).as("sz"),
      explode(col("grams")).as("gram"))
    timed("posts (exploded grams)")(posts.count())
    val dfreq = posts.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    timed("dfreq distinct grams")(dfreq.count())
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))
    val wDoc = Window.partitionBy(col("doc_id"))
    // mirrors Dedup.rankedPostings (r16): df=1-pruned ranks, canonical
    // positions for the PPJoin positional filter, prefix marks
    val ranked = posts.join(dfreq.filter(col("df") >= 2), "gram")
      .withColumn("rk", row_number().over(w))
      .withColumn("n2", count(lit(1)).over(wDoc))
      .withColumn("pos", col("sz") - col("n2") + col("rk"))
      .withColumn("in_prefix", col("rk") <=
        col("n2") - greatest(lit(1),
          ceil(col("sz") * lit(threshold) - lit(1e-9)).cast("int")) + 1)
      .select(col("doc_id"), col("sz"), col("gram"), col("pos"),
        col("in_prefix"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("ranked df>=2 postings")(ranked.count())
    timed("probe (prefix postings)")(ranked.filter(col("in_prefix")).count())
    val x = ranked.filter(col("in_prefix")).drop("in_prefix").as("x")
    val y = ranked.drop("in_prefix").as("y")
    // mirrors the AllPairs length + PPJoin positional filters in
    // Dedup.prefixCandidates
    val oReq = ceil((col("x.sz") + col("y.sz")).cast("double") *
      lit(threshold / (1.0 + threshold)) - lit(1e-9))
    val cand = x.join(y, col("x.gram") === col("y.gram") &&
        col("y.sz").cast("double") * lit(threshold) <=
          col("x.sz").cast("double") + lit(1e-9) &&
        (lit(1) + least(col("x.sz") - col("x.pos"),
          col("y.sz") - col("y.pos"))).cast("long") >= oReq &&
        (col("x.sz") < col("y.sz") ||
          (col("x.sz") === col("y.sz") && col("x.doc_id") =!= col("y.doc_id"))))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
    timed("cand pre-distinct")(cand.count())
    val candD = cand.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("cand distinct")(candD.count())

    val common = graft.functions.SortedIntersectCount(col("a.grams"), col("b.grams"))
    val pairs = candD
      .join(g.as("a"), col("a_id") === col("a.doc_id"))
      .join(g.as("b"), col("b_id") === col("b.doc_id"))
      .withColumn("common", common)
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("a.grams")) + size(col("b.grams")) - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
    timed("verify -> true pairs")(pairs.count())

    timed("end-to-end fresh")(operators.Dedup
      .shingleJaccardPairsGlobal(docs, n, threshold).count())

    // optional pair dump for driver-side inspection (cross-copy analysis)
    args.lift(3).foreach { out =>
      pairs.select(col("a_id"), col("b_id"), col("jaccard"))
        .write.mode("overwrite").parquet(out)
      println(s"[ssj] pairs written to $out")
    }
    spark.stop()
  }
}
