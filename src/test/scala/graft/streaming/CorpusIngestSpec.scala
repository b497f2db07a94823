package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental-dedup manifest semantics: cross-batch suppression,
  * within-batch dedup, idempotent replay, null-digest handling.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("manifest suppresses re-ingested digests across batches") {
    val dir = graft.util.Scratch.fresh("ingest_spec")
    // batch 0: two distinct texts + one within-batch duplicate
    CorpusIngest.ingestBatch(docs(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "alpha", "es")), 0L, dir)
    // batch 1: one already-seen text, one new, plus a null text
    CorpusIngest.ingestBatch(docs(
      (10L, "alpha", "de"), (11L, "gamma", "en"), (12L, null, "fr")), 1L, dir)
    // batch 2: null text again — must be suppressed by batch 1's null digest
    CorpusIngest.ingestBatch(docs(
      (20L, null, "en"), (21L, "delta", "en")), 2L, dir)

    val m = CorpusIngest.manifest(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(m === Set(
      (0L, 1L), (0L, 2L),       // alpha keeps min doc_id, beta new
      (1L, 11L), (1L, 12L),     // alpha suppressed; gamma + first null new
      (2L, 21L)))               // later null suppressed; delta new
  }

  test("replaying a batch is idempotent and not self-suppressing") {
    val dir = graft.util.Scratch.fresh("ingest_replay_spec")
    CorpusIngest.ingestBatch(docs((1L, "alpha", "en")), 0L, dir)
    CorpusIngest.ingestBatch(docs((10L, "beta", "en")), 1L, dir)
    // crash/replay of batch 1: its own previous output must NOT
    // anti-join it away, and the overwrite must not duplicate rows
    CorpusIngest.ingestBatch(docs((10L, "beta", "en")), 1L, dir)
    val m = CorpusIngest.manifest(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(m === Seq((0L, 1L), (1L, 10L)),
      s"replay must reproduce the same manifest: $m")
  }

  test("manifest anti-join is bucket-local: NO exchange on the manifest side") {
    // a child session with broadcast off: at test row counts Catalyst
    // would broadcast the tiny manifest, hiding the partitioning this
    // test exists to pin (at scale the manifest side is the huge one)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s2.implicits._
    def docs2(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "text", "lang")

    val dir = graft.util.Scratch.fresh("ingest_plan_spec")
    // ≥3 replayed batches (VERDICT r10 #1): the layout must hold as the
    // manifest accumulates partitions, not just for the first append
    CorpusIngest.ingestBatch(docs2((1L, "alpha", "en"), (2L, "beta", "en")), 0L, dir)
    CorpusIngest.ingestBatch(docs2((10L, "gamma", "en"), (11L, "alpha", "de")), 1L, dir)
    CorpusIngest.ingestBatch(docs2((20L, "delta", "en"), (21L, "beta", "fr")), 2L, dir)

    val probe = docs2((30L, "alpha", "en"), (31L, "epsilon", "en"))
      .withColumn("__h", xxhash64(coalesce(col("text"), lit(""))))
      .withColumn("__len", coalesce(length(col("text")), lit(-1)))
      .select(col("doc_id"), col("lang"), col("__h"), col("__len"))
    val joined = CorpusIngest.manifestAntiJoin(probe, 3L, CorpusIngest.tableName(dir))

    val plan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a sort-merge anti-join:\n$plan")
    // the manifest is the RIGHT (build) side of the left_anti join: its
    // subtree must contain a bucketed scan and no shuffle — only the
    // small probe side is allowed to move
    val manifestSide = joins.head.right
    val manifestShuffles = manifestSide.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(manifestShuffles.isEmpty,
      s"manifest side must not be re-shuffled per batch:\n$plan")
    val scans = manifestSide.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.bucketedScan,
      s"manifest scan fell back to unbucketed:\n${scans.headOption.map(_.metadata)}")

    // and the join is semantically right: alpha suppressed, epsilon new
    assert(joined.select(col("doc_id")).as[Long].collect().toSet === Set(31L))

    // end-to-end through ingestBatch on the same session (bloom split +
    // bucket-wise join), manifest stays consistent
    CorpusIngest.ingestBatch(docs2((30L, "alpha", "en"), (31L, "epsilon", "en")), 3L, dir)
    val m = CorpusIngest.manifest(s2, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(m === Set((0L, 1L), (0L, 2L), (1L, 10L), (2L, 20L), (3L, 31L)))
  }

  test("a manifest whose bloom sidecar is lost still dedups (fallback join)") {
    // pre-upgrade manifests / a deleted sidecar: loadBloom returns None
    // and ingestBatch must fall back to the plain bucket-wise anti-join
    val dir = graft.util.Scratch.fresh("ingest_nobloom_spec")
    CorpusIngest.ingestBatch(docs((1L, "alpha", "en"), (2L, "beta", "en")), 0L, dir)
    graft.util.Scratch.delete(s"${dir}_bloom")
    CorpusIngest.ingestBatch(docs((10L, "alpha", "de"), (11L, "gamma", "en")), 1L, dir)
    val m = CorpusIngest.manifest(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(m === Set((0L, 1L), (0L, 2L), (1L, 11L)),
      "alpha must be suppressed by the fallback anti-join without a sidecar")
  }

  test("bloom-ahead sidecar is FP-only: a sketch entry without manifest rows never suppresses") {
    // the crash-ordering contract: bloom is written BEFORE the manifest
    // rows, so a crash in between leaves a sketch that knows a digest the
    // manifest does not hold — that doc must be routed to the anti-join
    // (a false "probable duplicate") and SURVIVE, never be dropped as a
    // false "definitely seen"
    val dir = graft.util.Scratch.fresh("ingest_fponly_spec")
    CorpusIngest.ingestBatch(docs((1L, "alpha", "en")), 0L, dir)
    // simulate the crashed batch 1: its bloom landed, its rows did not
    val crashed = docs((10L, "beta", "en"))
    CorpusIngest.ingestBatch(crashed, 1L, dir)
    graft.util.Scratch.delete(s"$dir/batch=1") // rows gone, bloom stays
    spark.catalog.refreshTable(CorpusIngest.tableName(dir))
    // batch 2 re-delivers beta: the stale bloom flags it probable, the
    // join finds no manifest row — beta must survive
    CorpusIngest.ingestBatch(docs((20L, "beta", "fr"), (21L, "gamma", "en")), 2L, dir)
    val m = CorpusIngest.manifest(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(m === Set((0L, 1L), (2L, 20L), (2L, 21L)),
      s"stale bloom entry must not suppress an unwritten digest: $m")
  }

  test("bloom sidecar: a batch of fresh digests skips the manifest scan") {
    val dir = graft.util.Scratch.fresh("ingest_bloom_spec")
    CorpusIngest.ingestBatch(docs((1L, "alpha", "en"), (2L, "beta", "en")), 0L, dir)
    // all-new batch: correctness (everything survives) — the scan-skip
    // itself is exercised by ingestBatch's probable.isEmpty branch
    CorpusIngest.ingestBatch(docs((10L, "gamma", "en"), (11L, "delta", "de")), 1L, dir)
    // mixed batch: bloom routes only the probable duplicate to the join
    CorpusIngest.ingestBatch(docs((20L, "alpha", "fr"), (21L, "epsilon", "en")), 2L, dir)
    val m = CorpusIngest.manifest(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(m === Set((0L, 1L), (0L, 2L), (1L, 10L), (1L, 11L), (2L, 21L)))
  }
}
