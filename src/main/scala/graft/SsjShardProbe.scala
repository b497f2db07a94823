package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution for the SHARDED exact SSJoin
  * (`Dedup.shingleJaccardPairsGlobal` past its posting threshold) — the
  * r16 sibling of `SsjProbe`. The sharded form trades one unbounded
  * shuffle for K disk-bounded passes with parquet stage boundaries;
  * this probe times each boundary (posts2 write, probe passes,
  * candidate passes, verify) so the constant factor vs the lazy form is
  * NAMED per stage, not guessed.
  *
  * `runMain graft.SsjShardProbe <sfDir> [candPostsPerPass] [n] [threshold]
  * [pairsPerVerifyPass]` — the 5th arg sweeps the verify-pass knob
  * (default `Dedup.defaultSsjPairsPerPass`) so a rehearsal's kVer
  * matches an operator run that passes `pairsPerVerifyPass` explicitly.
  */
object SsjShardProbe {
  def main(args: Array[String]): Unit = {
    JvmGuard.assertSparkModuleAccess()
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val perPass = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val threshold = args.lift(3).map(_.toDouble).getOrElse(0.5)
    val perVerifyPass = args.lift(4).map(_.toLong)
      .getOrElse(operators.Dedup.defaultSsjPairsPerPass)
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

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ssjshard] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $r")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val g = operators.Dedup.slimGramSets(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = timed("gram frame + posting count")(
      g.agg(sum(size(col("grams")))).head().getLong(0))
    val (kProbe, kCand) = operators.Dedup.ssjShardCounts(total, perPass)
    println(s"[ssjshard] postings=$total kProbe=$kProbe kCand=$kCand")

    val stage = java.nio.file.Files.createTempDirectory("graft_ssjp_")
    val posts = g.select(col("doc_id"),
      size(col("grams")).as("sz"), explode(col("grams")).as("gram"))
    timed("A: posts2 (df>=2) write") {
      val dfreq = posts.groupBy(col("gram")).agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2)
      posts.join(dfreq, "gram")
        .write.mode("overwrite").parquet(s"$stage/posts2")
    }
    timed("A: gc")(System.gc())
    val posts2 = spark.read.parquet(s"$stage/posts2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    for (i <- 0 until kProbe) {
      timed(s"B[$i/$kProbe]: ranked write") {
        posts2.filter(pmod(xxhash64(col("doc_id")), lit(kProbe)) === i)
          .withColumn("rk", row_number().over(w))
          .withColumn("n2", count(lit(1)).over(wDoc))
          .withColumn("pos", col("sz") - col("n2") + col("rk"))
          .withColumn("in_prefix", col("rk") <=
            col("n2") - greatest(lit(1),
              ceil(col("sz") * lit(threshold) - lit(1e-9)).cast("int")) + 1)
          .select(col("doc_id"), col("sz"), col("gram"), col("pos"),
            col("in_prefix"))
          .write.mode(if (i == 0) "overwrite" else "append")
          .parquet(s"$stage/ranked")
      }
      timed("B: gc")(System.gc())
    }
    val rankedAll = spark.read.parquet(s"$stage/ranked")
    for (j <- 0 until kCand) {
      timed(s"C[$j/$kCand]: cand write") {
        val shard = rankedAll
          .filter(pmod(xxhash64(col("gram")), lit(kCand)) === j)
        val x = shard.filter(col("in_prefix")).drop("in_prefix").as("x")
        val y = shard.drop("in_prefix").as("y")
        val oReq = ceil((col("x.sz") + col("y.sz")).cast("double") *
          lit(threshold / (1.0 + threshold)) - lit(1e-9))
        x.join(y, col("x.gram") === col("y.gram") &&
            col("y.sz").cast("double") * lit(threshold) <=
              col("x.sz").cast("double") + lit(1e-9) &&
            (lit(1) + least(col("x.sz") - col("x.pos"),
              col("y.sz") - col("y.pos"))).cast("long") >= oReq &&
            (col("x.sz") < col("y.sz") ||
              (col("x.sz") === col("y.sz") && col("x.doc_id") =!= col("y.doc_id"))))
          .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
            greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
          .distinct()
          .write.mode(if (j == 0) "overwrite" else "append")
          .parquet(s"$stage/cand")
      }
      timed("C: gc")(System.gc())
    }
    // Verify mirrors the operator's r16 pass-sharded form: materialized
    // distinct pair table + parquet gram table, kVer pair-hash passes
    // (the single-join verify was the sf100 ENOSPC stage: 125M pairs x
    // ~700 B of gram arrays in one two-join shuffle).
    timed("D: candd write") {
      spark.read.parquet(s"$stage/cand").distinct()
        .write.mode("overwrite").parquet(s"$stage/candd")
    }
    timed("D: gc")(System.gc())
    val candD = spark.read.parquet(s"$stage/candd")
    timed("D: grams write") {
      g.select(col("doc_id"), col("grams"))
        .write.mode("overwrite").parquet(s"$stage/grams")
    }
    val gp = spark.read.parquet(s"$stage/grams")
    val nCand = timed("D: cand count")(candD.count())
    val kVer = operators.Dedup.ssjVerifyPasses(nCand, perVerifyPass)
    println(s"[ssjshard] candidates=$nCand kVer=$kVer")
    var truePairs = 0L
    for (v <- 0 until kVer) {
      timed(s"E[$v/$kVer]: verify pass") {
        val common = graft.functions.SortedIntersectCount(col("a.grams"), col("b.grams"))
        truePairs += candD
          .filter(pmod(xxhash64(col("a_id"), col("b_id")), lit(kVer)) === v)
          .join(gp.as("a"), col("a_id") === col("a.doc_id"))
          .join(gp.as("b"), col("b_id") === col("b.doc_id"))
          .withColumn("common", common)
          .withColumn("jaccard", col("common").cast("double") /
            (size(col("a.grams")) + size(col("b.grams")) - col("common")).cast("double"))
          .filter(col("jaccard") >= threshold)
          .count()
      }
      timed("E: gc")(System.gc())
    }
    println(s"[ssjshard] true pairs=$truePairs")
    timed("end-to-end operator")(operators.Dedup
      .shingleJaccardPairsGlobal(docs, n, threshold, perPass,
        pairsPerVerifyPass = perVerifyPass).count())
    spark.stop()
  }
}
