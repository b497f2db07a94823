package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed gate→manifest pipeline ([[CurationPipeline]]): keepers
  * enter the manifest's first-wins protocol, gated-out and unscorable
  * rows never touch it, the seed stays ungated, and the composition
  * replays idempotently (VERDICT r13 item 5 — the interaction the two
  * standalone keys cannot see).
  *
  * The fixture texts' gate signs are hand-derived from the classifier's
  * md5 weight rule (score_milli in comments); TextAnalysisSpec pins the
  * rule itself against an independent reimplementation.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  private def manifestSet(dir: String): Set[(Long, Long)] =
    CorpusIngest.manifest(spark, dir)
      .select(col("batch").cast("long"), col("doc_id"))
      .as[(Long, Long)].collect().toSet

  test("keepers dedup against seed and earlier keepers; gated-out rows never enter") {
    val dir = graft.util.Scratch.fresh("curation_compose")
    // seed (ungated): "spark parquet kafka" scores +734800 but that is
    // irrelevant — it enters directly
    CorpusIngest.ingestBatch(
      docs((1L, "en", "spark parquet kafka")), -1L, s"$dir/m")
    // batch 0: keeper dup of the seed text (suppressed), a new keeper
    // ("fine doc row" +405000), a gated-out row ("good text here"
    // -28200), and an unscorable null-text row
    CurationPipeline.gatedIngestBatch(docs(
      (10L, "en", "spark parquet kafka"),
      (11L, "en", "fine doc row"),
      (12L, "en", "good text here"),
      (13L, "en", null)), 0L, s"$dir/m")
    // batch 1: keeper dup of batch-0's keeper (suppressed) + a new keeper
    // ("clean data set" +15200)
    CurationPipeline.gatedIngestBatch(docs(
      (20L, "en", "fine doc row"),
      (21L, "en", "clean data set")), 1L, s"$dir/m")
    assert(manifestSet(s"$dir/m") ===
      Set((-1L, 1L), (0L, 11L), (1L, 21L)),
      s"composition mismatch: ${manifestSet(s"$dir/m")}")
  }

  test("the seed is ungated: a below-gate seed text still holds its digest") {
    val dir = graft.util.Scratch.fresh("curation_seed")
    // "keep me now" scores -12600: a DELIVERY of it would be gated out,
    // but yesterday's corpus enters as-is
    CorpusIngest.ingestBatch(docs((1L, "en", "keep me now")), -1L, s"$dir/m")
    CurationPipeline.gatedIngestBatch(
      docs((10L, "en", "solid gold row")), 0L, s"$dir/m") // +344000, keeper
    assert(manifestSet(s"$dir/m") === Set((-1L, 1L), (0L, 10L)),
      s"seed must persist ungated: ${manifestSet(s"$dir/m")}")
  }

  test("replaying a gated batch is idempotent") {
    val dir = graft.util.Scratch.fresh("curation_replay")
    CorpusIngest.ingestBatch(
      docs((1L, "en", "spark parquet kafka")), -1L, s"$dir/m")
    val b0 = docs((10L, "en", "fine doc row"), (11L, "en", "good text here"))
    CurationPipeline.gatedIngestBatch(b0, 0L, s"$dir/m")
    val first = manifestSet(s"$dir/m")
    // the at-least-once contract: same rows, same batch id, verbatim
    CurationPipeline.gatedIngestBatch(b0, 0L, s"$dir/m")
    assert(manifestSet(s"$dir/m") === first,
      s"replay must be a no-op: ${manifestSet(s"$dir/m")} vs $first")
    assert(first === Set((-1L, 1L), (0L, 10L)))
  }

  test("streaming leg: gatedIngest drains a file stream through the manifest") {
    val dir = graft.util.Scratch.fresh("curation_stream")
    CorpusIngest.ingestBatch(
      docs((1L, "en", "spark parquet kafka")), -1L, s"$dir/m")
    val delivery = docs(
      (10L, "en", "warm sunny day"),   // +105400, keeper
      (11L, "en", "good text here"))   // -28200, gated out
    delivery.coalesce(1).write.parquet(s"$dir/in")
    val q = CurationPipeline.gatedIngest(
      spark.readStream.schema(delivery.schema).parquet(s"$dir/in"),
      s"$dir/m", s"$dir/chk")
    q.awaitTermination()
    assert(manifestSet(s"$dir/m") === Set((-1L, 1L), (0L, 10L)),
      s"streaming curation mismatch: ${manifestSet(s"$dir/m")}")
  }
}
