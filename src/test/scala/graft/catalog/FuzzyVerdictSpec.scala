package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.Dedup
import graft.streaming.FuzzyIngest

/** The late-r12 verdict-pattern contracts for the MinHash family (the last
  * three formerly rows-only keys): the hashed surface is the EXACT
  * corpus-global 3-shingle-Jaccard ground truth, and the LSH machinery
  * running in the same plan is pinned by a verdict column. These tests
  * keep both halves honest in the suite: the verdicts hold on the real
  * tables (the same condition the driver's hash pins), and each verdict
  * is FALSIFIABLE — a deliberately broken LSH configuration fails the
  * identical bound, so the columns are measurements, not tautologies.
  */
class FuzzyVerdictSpec extends SparkSpec {

  test("the three MinHash-family queries report verdict=1 on every row (late-r12 hashed verdicts)") {
    Seq(("llm_dedup_fuzzy", "lsh_recall_ok"),
        ("llm_dedup_fuzzy_keep", "lsh_pipeline_ok"),
        ("llm_dedup_fuzzy_incremental", "fuzzy_agree_ok"),
        ("llm_dedup_embed_incremental", "embed_agree_ok")).foreach { case (q, v) =>
      val out = graft.SparkEntry.queries(q)(spark, sfDir)
      assert(out.filter(col(v) =!= 1L).count() == 0L,
        s"$q: verdict column $v has non-1 rows")
      assert(out.count() > 0, s"$q: empty output")
      spark.catalog.clearCache()
    }
    // non-vacuity: the exact ground truth actually has near-dup pairs at
    // sf0.001, so recall/agreement were measured against something
    val profile = graft.SparkEntry.queries("llm_dedup_fuzzy")(spark, sfDir)
    assert(profile.filter(col("n_near_dups") > 0).count() > 0,
      "no docs with exact near-dup partners — the verdicts would be vacuous")
    spark.catalog.clearCache()
  }

  test("lsh_recall_ok is FALSIFIABLE: single-band LSH fails the same 0.9 bound") {
    // sf0.001's exact pairs all sit at shingle-J in [0.88, 0.99) — one
    // 32-row band catches a J pair with probability J^32 (0.03..0.52
    // across that range), so collapsing the 8x4 banding to 1x32 must
    // push recall under the bound the query's verdict enforces. A
    // banding/signature regression of the same severity reddens the
    // driver row instead of passing silently.
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.shingleJaccardPairsGlobal(
      docs.select(col("doc_id"), col("text")), n = 3, threshold = 0.5)
      .select(col("a_id"), col("b_id"))
    val broken = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
      numHashes = 32, numBands = 1)
    val n = exact.count()
    val caught = exact.join(broken, Seq("a_id", "b_id"), "left_semi").count()
    assert(n > 0, "vacuous: no exact pairs at sf0.001")
    assert(caught.toDouble / n < 0.9,
      s"single-band recall $caught/$n unexpectedly clears the 0.9 bound")
    spark.catalog.clearCache()
  }

  test("embed_agree_ok is FALSIFIABLE: a never-suppressing embed index breaks the symdiff band") {
    // same shape as the fuzzy falsification: delivery 0 of the embed
    // scenario ingested with simThreshold = 2.0 (cosine can never reach
    // it), so every planted rescale survives into the index while the
    // exact replay suppresses them all — the symmetric difference must
    // blow past the query's max(2, 2%) band.
    import graft.streaming.EmbedIngest
    import graft.functions.VectorFns.dot
    val base = graft.util.Scratch.fresh("embed_falsify")
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val seed = vecs.filter(col("vec_id") % 5 === 0)
    val b0 = seed.select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") * 1.01).cast("float")).as("embedding"),
        col("label"))
      .unionByName(vecs.filter(col("vec_id") % 5 === 1))
    EmbedIngest.ingestBatch(seed, -1L, s"$base/index")
    EmbedIngest.ingestBatch(b0, 0L, s"$base/index", simThreshold = 2.0)
    val indexKept = EmbedIngest.index(spark, s"$base/index")
      .filter(col("batch") >= 0).select(col("vec_id"))
    val seedF = EmbedIngest.fingerprints(seed)
    val b0F = EmbedIngest.fingerprints(b0)
    val h = broadcast(seedF.select(col("embedding").as("h_emb"),
      col("nrm").as("h_nrm")))
    val replayKept = b0F.join(h,
        dot(col("embedding"), col("h_emb")) /
          (col("nrm") * col("h_nrm")) >= 0.99, "left_anti")
      .select(col("vec_id"))
    val symDiff =
      indexKept.join(replayKept, Seq("vec_id"), "left_anti").count() +
        replayKept.join(indexKept, Seq("vec_id"), "left_anti").count()
    val band = math.max(2L, math.ceil(0.02 * b0F.count()).toLong)
    assert(symDiff > band,
      s"never-suppressing embed index symdiff $symDiff inside the $band " +
        "band — the agree verdict would not catch a dead probe")
    spark.catalog.clearCache()
  }

  test("fuzzy_agree_ok is FALSIFIABLE: a never-suppressing index breaks the symdiff band") {
    // same construction as llm_dedup_fuzzy_incremental's first delivery,
    // but the index is ingested with simThreshold = 2.0 — an agreement
    // fraction can never reach it, so every recrawl survives into the
    // index while the exact replay suppresses them all; the symmetric
    // difference must then blow past the query's max(2, 2%) band.
    val base = graft.util.Scratch.fresh("fuzzy_falsify")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val seed = docs.filter(col("doc_id") % 5 === 0)
    val b0 = seed.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" recrawl")).as("text"), col("lang"))
      .unionByName(docs.filter(col("doc_id") % 5 === 1))
    FuzzyIngest.ingestBatch(seed, -1L, s"$base/index")
    FuzzyIngest.ingestBatch(b0, 0L, s"$base/index", simThreshold = 2.0)
    val indexKept = FuzzyIngest.index(spark, s"$base/index")
      .filter(col("batch") >= 0).select(col("doc_id"))
    // exact replay of delivery 0 (the query's ground truth)
    val pairs = Dedup.shingleJaccardPairsGlobal(
      b0.select(col("doc_id"), col("text"))
        .unionByName(seed.select(col("doc_id"), col("text"))),
      n = 3, threshold = 0.5)
    val sup = pairs.select(col("a_id").as("x"), col("b_id").as("y"))
      .unionByName(pairs.select(col("b_id").as("x"), col("a_id").as("y")))
      .join(seed.select(col("doc_id").as("y")), Seq("y"), "left_semi")
      .select(col("x").as("doc_id")).distinct()
    val replayKept = b0.join(sup, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    val symDiff =
      indexKept.join(replayKept, Seq("doc_id"), "left_anti").count() +
        replayKept.join(indexKept, Seq("doc_id"), "left_anti").count()
    val band = math.max(2L, math.ceil(0.02 * b0.count()).toLong)
    assert(symDiff > band,
      s"never-suppressing index symdiff $symDiff inside the $band band — " +
        "the agree verdict would not catch a dead probe")
    spark.catalog.clearCache()
  }
}
