package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merging two independently built indexes
  * ([[CorpusIngest.merge]] / [[FuzzyIngest.merge]]): digest/near-dup
  * collapse across sources with `a` senior, the destination a NORMAL
  * index that further ingest continues from, fail-fast on an existing
  * destination and (fuzzy) on overlapping doc_id spaces.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val baseA = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val baseB = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val baseC = (1 to 40).map(i => s"gamma$i").mkString(" ")

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("manifest merge: digest dedup across sources, earlier first_batch wins, dst ingests on") {
    val base = graft.util.Scratch.fresh("merge_manifest")
    CorpusIngest.ingestBatch(docs(
      (1L, baseA, "en"), (2L, baseB, "en")), 0L, s"$base/a")
    // b holds an exact (digest) dup of baseA under a different id and a
    // genuinely new doc
    CorpusIngest.ingestBatch(docs(
      (10L, baseA, "de"), (11L, baseC, "fr")), 0L, s"$base/b")

    val n = CorpusIngest.merge(spark, s"$base/a", s"$base/b", s"$base/dst")
    assert(n == 3L, s"expected 3 merged rows, got $n")
    val ids = CorpusIngest.manifest(spark, s"$base/dst")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 11L), s"merged manifest: $ids")

    // the destination is a normal manifest: a later batch is deduped
    // against the MERGED digest set (both sources' content suppresses)
    CorpusIngest.ingestBatch(docs(
      (20L, baseA, "es"), (21L, baseC, "es"),
      (22L, "genuinely new words here", "es")), 5L, s"$base/dst")
    val after = CorpusIngest.manifest(spark, s"$base/dst")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(after == Set(1L, 2L, 11L, 22L), s"post-merge ingest: $after")

    // fail-fast on an existing destination
    val e = intercept[IllegalArgumentException] {
      CorpusIngest.merge(spark, s"$base/a", s"$base/b", s"$base/dst")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }

  test("fuzzy merge: cross-index near-dups collapse toward the senior index, dst ingests on") {
    val base = graft.util.Scratch.fresh("merge_fuzzy")
    FuzzyIngest.ingestBatch(docs((1L, baseA, "en")), 0L, s"$base/a")
    // b: a NEAR-dup of a's doc (suppressed at merge - a is senior) and a
    // genuinely new doc
    FuzzyIngest.ingestBatch(docs(
      (10L, baseA + " tail", "de"), (11L, baseB, "fr")), 0L, s"$base/b")

    val n = FuzzyIngest.merge(spark, s"$base/a", s"$base/b", s"$base/dst")
    assert(n == 2L, s"expected 2 merged sigs, got $n")
    val ids = FuzzyIngest.index(spark, s"$base/dst")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(ids == Set(1L, 11L), s"merged index: $ids")
    val bandDocs = FuzzyIngest.bands(spark, s"$base/dst")
      .select(col("doc_id")).distinct().as[Long].collect().toSet
    assert(bandDocs == Set(1L, 11L), s"merged band postings: $bandDocs")

    // near-dups of BOTH sources' surviving content stay suppressed in
    // the merged index; new content passes. (Tail-append near-dups: the
    // one-token-edit shape this suite uses elsewhere — a mid-doc edit at
    // this length can deterministically miss all 8 bands, which is the
    // LSH recall trade, not a merge property.)
    FuzzyIngest.ingestBatch(docs(
      (20L, baseA + " tail", "es"),
      (21L, baseB + " tail", "es"),
      (22L, baseC, "es")), 5L, s"$base/dst")
    val after = FuzzyIngest.index(spark, s"$base/dst")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(after == Set(1L, 11L, 22L), s"post-merge ingest: $after")
  }

  test("manifest merge refuses overlapping doc_id spaces") {
    // ADVICE r12: dedup is digest-keyed, so the same id under two
    // DIFFERENT digests would land in the destination twice and a later
    // retract of that id would remove both — the family's disjointness
    // contract must hold for the exact manifest too
    val base = graft.util.Scratch.fresh("merge_manifest_ids")
    CorpusIngest.ingestBatch(docs((1L, baseA, "en")), 0L, s"$base/a")
    CorpusIngest.ingestBatch(docs((1L, baseB, "en")), 0L, s"$base/b")
    val e = intercept[IllegalArgumentException] {
      CorpusIngest.merge(spark, s"$base/a", s"$base/b", s"$base/dst")
    }
    assert(e.getMessage.contains("overlap"), e.getMessage)
  }

  test("fuzzy merge refuses overlapping doc_id spaces") {
    val base = graft.util.Scratch.fresh("merge_fuzzy_ids")
    FuzzyIngest.ingestBatch(docs((1L, baseA, "en")), 0L, s"$base/a")
    FuzzyIngest.ingestBatch(docs((1L, baseB, "en")), 0L, s"$base/b")
    val e = intercept[IllegalArgumentException] {
      FuzzyIngest.merge(spark, s"$base/a", s"$base/b", s"$base/dst")
    }
    assert(e.getMessage.contains("overlap"), e.getMessage)
  }
}
