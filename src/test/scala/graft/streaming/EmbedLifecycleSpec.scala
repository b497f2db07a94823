package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The lifecycle verbs ported to the semantic index
  * ([[EmbedIngest.compact]]/[[EmbedIngest.retract]]/
  * [[EmbedIngest.expire]]/[[EmbedIngest.merge]]): consolidation keeps
  * suppressing, takedown forgets, retention ages out, merge collapses
  * cross-index near-dups toward the senior side — the same contracts
  * the exact and fuzzy twins pin.
  */
class EmbedLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def unit(i: Int): Array[Float] = {
    val v = Array.fill(8)(0.0f); v(i) = 1.0f; v
  }
  private def vecs(rows: (Long, Array[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")
  private def idsOf(xs: Long*) = xs.toDF("vec_id")

  test("compact consolidates both tables and the probe still suppresses") {
    val dir = graft.util.Scratch.fresh("embed_compact")
    EmbedIngest.ingestBatch(vecs((1L, unit(0), 0)), 0L, dir)
    EmbedIngest.ingestBatch(vecs((2L, unit(1), 1)), 1L, dir)
    EmbedIngest.ingestBatch(vecs((3L, unit(2), 2)), 2L, dir)
    EmbedIngest.compact(spark, dir, upToBatch = 1L)
    // physical layout: batches 0-1 consolidated, batch 2 intact
    val parts = EmbedIngest.vecs(spark, dir)
      .select(col("batch").cast("long")).distinct().as[Long].collect().toSet
    assert(parts == Set(CorpusIngest.CompactedBatch, 2L), s"partitions: $parts")
    // provenance survives; suppression against CONSOLIDATED history works
    EmbedIngest.ingestBatch(vecs(
      (10L, unit(0).map(_ * 2f), 0), (11L, unit(5), 5)), 3L, dir)
    val idx = EmbedIngest.index(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(idx == Set(1L, 2L, 3L, 11L), s"post-compact ingest: $idx")
    // newest-batch guard
    val e = intercept[IllegalArgumentException] {
      EmbedIngest.compact(spark, dir, upToBatch = 3L)
    }
    assert(e.getMessage.contains("newest batch"), e.getMessage)
  }

  test("retract forgets: near-dup of retracted vector re-accepted, of survivor suppressed") {
    val dir = graft.util.Scratch.fresh("embed_retract")
    EmbedIngest.ingestBatch(vecs(
      (1L, unit(0), 0), (2L, unit(1), 1)), 0L, dir)
    EmbedIngest.ingestBatch(vecs((3L, unit(2), 2)), 1L, dir)
    assert(EmbedIngest.retract(spark, dir, idsOf(1L, 999L)) == 1L)
    val bandDocs = EmbedIngest.bands(spark, dir)
      .select(col("vec_id")).distinct().as[Long].collect().toSet
    assert(bandDocs == Set(2L, 3L), s"band postings after retract: $bandDocs")
    EmbedIngest.ingestBatch(vecs(
      (10L, unit(0).map(_ * 1.5f), 0), (11L, unit(1).map(_ * 2f), 1)), 2L, dir)
    val idx = EmbedIngest.index(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(idx == Set(2L, 3L, 10L), s"after re-delivery: $idx")
  }

  test("expire ages out by first-seen batch across compacted and plain partitions") {
    val dir = graft.util.Scratch.fresh("embed_expire")
    EmbedIngest.ingestBatch(vecs((1L, unit(0), 0)), 0L, dir)
    EmbedIngest.ingestBatch(vecs((2L, unit(1), 1)), 1L, dir)
    EmbedIngest.ingestBatch(vecs((3L, unit(2), 2)), 2L, dir)
    EmbedIngest.compact(spark, dir, upToBatch = 1L)
    assert(EmbedIngest.expire(spark, dir, olderThanBatch = 0L) == 1L)
    val idx = EmbedIngest.index(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(idx == Set(2L, 3L), s"after expire: $idx")
    // the aged-out vector may re-enter
    EmbedIngest.ingestBatch(vecs((10L, unit(0).map(_ * 3f), 0)), 3L, dir)
    val after = EmbedIngest.index(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(after == Set(2L, 3L, 10L), s"re-entry after expire: $after")
  }

  test("merge collapses cross-index cosine dups toward the senior index; dst ingests on") {
    val base = graft.util.Scratch.fresh("embed_merge")
    EmbedIngest.ingestBatch(vecs((1L, unit(0), 0)), 0L, s"$base/a")
    EmbedIngest.ingestBatch(vecs(
      (10L, unit(0).map(_ * 2f), 0),   // rescale of a's vec -> suppressed
      (11L, unit(1), 1)), 0L, s"$base/b")
    assert(EmbedIngest.merge(spark, s"$base/a", s"$base/b", s"$base/dst") == 2L)
    val ids = EmbedIngest.index(spark, s"$base/dst")
      .select(col("vec_id")).as[Long].collect().toSet
    assert(ids == Set(1L, 11L), s"merged index: $ids")
    // destination is a normal index: both sources' content suppresses,
    // and it is fully retractable (consolidated-only, no replayable batch)
    EmbedIngest.ingestBatch(vecs(
      (20L, unit(0).map(_ * 0.5f), 0), (21L, unit(1).map(_ * 4f), 1),
      (22L, unit(6), 6)), 5L, s"$base/dst")
    val after = EmbedIngest.index(spark, s"$base/dst")
      .select(col("vec_id")).as[Long].collect().toSet
    assert(after == Set(1L, 11L, 22L), s"post-merge ingest: $after")
    // id-overlap guard
    val e = intercept[IllegalArgumentException] {
      EmbedIngest.merge(spark, s"$base/a", s"$base/a" , s"$base/dst2")
    }
    assert(e.getMessage.contains("overlap"), e.getMessage)
  }
}
