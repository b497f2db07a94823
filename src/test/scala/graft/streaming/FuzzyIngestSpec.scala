package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental fuzzy-dedup index semantics: cross-batch NEAR-dup
  * suppression (the case the exact manifest cannot see), unrelated docs
  * passing through, idempotent replay, and the bucket-local probe plan.
  */
class FuzzyIngestSpec extends SparkSpec {
  import spark.implicits._

  // long texts so a one-token edit stays far above the 0.5 agreement bar
  private val baseA = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val baseB = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val baseC = (1 to 40).map(i => s"gamma$i").mkString(" ")

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("near-dups of earlier batches are suppressed; new docs survive") {
    val dir = graft.util.Scratch.fresh("fuzzy_ingest_spec")
    FuzzyIngest.ingestBatch(docs(
      (1L, baseA, "en"), (2L, baseB, "en")), 0L, dir)
    // batch 1: an EXACT dup of A, a NEAR dup of B (one token changed),
    // and a genuinely new doc
    FuzzyIngest.ingestBatch(docs(
      (10L, baseA, "de"),
      (11L, baseB.replace("beta7", "edited"), "en"),
      (12L, baseC, "fr")), 1L, dir)
    // batch 2: a near dup of batch-1's SURVIVOR C (tail token appended)
    FuzzyIngest.ingestBatch(docs(
      (20L, baseC + " tail", "en"), (21L, "tiny unrelated text here", "es")),
      2L, dir)

    val idx = FuzzyIngest.index(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(idx === Set((0L, 1L), (0L, 2L), (1L, 12L), (2L, 21L)),
      s"fuzzy index mismatch: $idx")
  }

  test("streaming leg: fuzzyIngest drains a file stream through the index") {
    val dir = graft.util.Scratch.fresh("fuzzy_stream_spec")
    FuzzyIngest.ingestBatch(docs((1L, baseA, "en")), -1L, s"$dir/index")
    // one delivery file: a near-dup of the seed + a new doc
    val delivery = docs((10L, baseA + " tail", "de"), (11L, baseB, "en"))
    delivery.coalesce(1).write.parquet(s"$dir/in")
    val q = FuzzyIngest.fuzzyIngest(
      spark.readStream.schema(delivery.schema).parquet(s"$dir/in"),
      s"$dir/index", s"$dir/chk")
    q.awaitTermination()
    val idx = FuzzyIngest.index(spark, s"$dir/index")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(idx === Set(1L, 11L), s"streaming ingest mismatch: $idx")
  }

  test("replaying a batch is idempotent and not self-suppressing") {
    val dir = graft.util.Scratch.fresh("fuzzy_replay_spec")
    FuzzyIngest.ingestBatch(docs((1L, baseA, "en")), 0L, dir)
    FuzzyIngest.ingestBatch(docs((10L, baseB, "en")), 1L, dir)
    FuzzyIngest.ingestBatch(docs((10L, baseB, "en")), 1L, dir) // replay
    val idx = FuzzyIngest.index(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(idx === Seq((0L, 1L), (1L, 10L)),
      s"replay must reproduce the same index: $idx")
  }

  test("LSH probe is bucket-local: NO exchange on the band-index side") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    def docs2(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "text", "lang")
    val dir = graft.util.Scratch.fresh("fuzzy_plan_spec")
    FuzzyIngest.ingestBatch(docs2((1L, baseA, "en"), (2L, baseB, "en")), 0L, dir)
    FuzzyIngest.ingestBatch(docs2((10L, baseC, "en")), 1L, dir)

    val probe = graft.operators.Dedup
      .minhashSignatures(docs2((30L, baseA + " x", "en")), "text", "doc_id")
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bh")))
    val cand = FuzzyIngest.bandCandidates(probe, 2L, FuzzyIngest.bandTable(dir))

    val plan = cand.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a sort-merge probe join:\n$plan")
    val idxSide = joins.head.right
    assert(idxSide.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"band index must not re-shuffle per batch:\n$plan")
    val scans = idxSide.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.bucketedScan,
      s"band-index scan fell back to unbucketed:\n${scans.headOption.map(_.metadata)}")
    // and the near-dup of A is a candidate against A
    assert(cand.select(col("old_id")).as[Long].collect().toSet === Set(1L))
  }
}
