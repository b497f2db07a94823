package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Retention semantics for both persistent indexes
  * ([[CorpusIngest.expire]] / [[FuzzyIngest.expire]]): docs first seen
  * at or before the cutoff batch disappear — whole-partition drops for
  * per-batch partitions, a `first_batch` filter inside the consolidated
  * partition — the newest batch is refused, and expired content may
  * re-enter as a fresh delivery.
  */
class ExpireSpec extends SparkSpec {
  import spark.implicits._

  private val baseA = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val baseB = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val baseC = (1 to 40).map(i => s"gamma$i").mkString(" ")

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("manifest expire: per-batch partitions drop whole, compacted rows filter on first_batch") {
    val dir = graft.util.Scratch.fresh("expire_manifest")
    CorpusIngest.ingestBatch(docs((1L, baseA, "en")), 0L, dir)
    CorpusIngest.ingestBatch(docs((2L, baseB, "en")), 1L, dir)
    CorpusIngest.ingestBatch(docs((3L, baseC, "fr")), 2L, dir)
    // consolidate batches 0-1: their rows now live in the compacted
    // partition with first_batch 0 and 1
    CorpusIngest.compact(spark, dir, upToBatch = 1L)

    val removed = CorpusIngest.expire(spark, dir, olderThanBatch = 0L)
    assert(removed == 1L, s"expected 1 expired row, got $removed")
    val ids = CorpusIngest.manifest(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ids == Set(2L, 3L), s"after expire: $ids")

    // newest batch is protected
    val e = intercept[IllegalArgumentException] {
      CorpusIngest.expire(spark, dir, olderThanBatch = 2L)
    }
    assert(e.getMessage.contains("newest batch"), e.getMessage)

    // the expired text may legitimately re-enter as a fresh delivery
    CorpusIngest.ingestBatch(docs(
      (10L, baseA, "de"), (11L, baseB, "de")), 3L, dir)
    val after = CorpusIngest.manifest(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(after == Set(2L, 3L, 10L), s"after re-delivery: $after")
  }

  test("manifest expire without compaction drops the whole old partition") {
    val dir = graft.util.Scratch.fresh("expire_plain")
    CorpusIngest.ingestBatch(docs(
      (1L, baseA, "en"), (2L, baseB, "en")), 0L, dir)
    CorpusIngest.ingestBatch(docs((3L, baseC, "fr")), 1L, dir)
    assert(CorpusIngest.expire(spark, dir, 0L) == 2L)
    val ids = CorpusIngest.manifest(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ids == Set(3L), s"after expire: $ids")
    // idempotent re-run
    assert(CorpusIngest.expire(spark, dir, 0L) == 0L)
  }

  test("fuzzy expire: sigs and band postings age out, near-dup of expired doc re-accepted") {
    val dir = graft.util.Scratch.fresh("expire_fuzzy")
    FuzzyIngest.ingestBatch(docs((1L, baseA, "en")), 0L, dir)
    FuzzyIngest.ingestBatch(docs((2L, baseB, "en")), 1L, dir)
    FuzzyIngest.ingestBatch(docs((3L, baseC, "fr")), 2L, dir)
    FuzzyIngest.compact(spark, dir, upToBatch = 1L)

    val removed = FuzzyIngest.expire(spark, dir, olderThanBatch = 0L)
    assert(removed == 1L, s"expected 1 expired sig, got $removed")
    val ids = FuzzyIngest.index(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ids == Set(2L, 3L), s"after expire: $ids")
    val bandDocs = FuzzyIngest.bands(spark, dir)
      .select(col("doc_id")).distinct().as[Long].collect().toSet
    assert(bandDocs == Set(2L, 3L), s"band postings after expire: $bandDocs")

    // a near-dup of the EXPIRED doc is accepted (aged out of memory);
    // near-dup of a SURVIVOR still suppressed
    FuzzyIngest.ingestBatch(docs(
      (10L, baseA + " tail", "de"), (11L, baseB + " tail", "de")), 3L, dir)
    val after = FuzzyIngest.index(spark, dir)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(after == Set(2L, 3L, 10L), s"after re-delivery: $after")
  }
}
