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
}
