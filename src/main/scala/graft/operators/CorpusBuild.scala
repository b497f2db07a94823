package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The BATCH end-to-end corpus build (VERDICT r14 #4): the DAG a curation
  * run actually ships — model gate → normalize → exact dedup on the
  * NORMALIZED text → mixture resample of the survivor set → sequence
  * packing — composed from the operators the standalone catalog keys
  * already exercise, pinning the cross-stage interactions none of them
  * can see alone:
  *
  *  1. normalization changes digests BEFORE dedup: case/punctuation
  *     variants collide into one survivor (a raw-text dedup keeps both);
  *  2. the gate runs BEFORE dedup, so a gated-out document can neither
  *     survive NOR suppress a keeper that shares its normalized text;
  *  3. mixture membership is content-addressed on the SURVIVORS'
  *     normalized text — weights act on the deduped set, and a re-crawl
  *     differing only in punctuation samples identically;
  *  4. packing consumes exactly the sampled survivors, in doc_id order.
  *
  * Scale shape (the 100 TB read): scoring+normalization are ONE pass
  * (compiled kernel + codegen projection, no shuffle); dedup shuffles
  * 16-byte (xxhash64, length) keys, never document bodies ([[Dedup.exact]]
  * with its md5 collision guard); the survivor join is id-keyed (narrow);
  * mixture membership is a pure filter (zero shuffle — no RNG state to
  * coordinate); packing is [[Windows.partitionedPrefixSum]], the two-pass
  * form that never puts a whole language on one task. No stage re-reads
  * the corpus from storage.
  */
object CorpusBuild {

  /** Fixed context-window token budget for the packing stage. */
  val PackBudget = 512

  /** The canonical pre-dedup normalization (same expression as the
    * `llm_text_normalize` key): lowercase, strip non-alphanumerics,
    * collapse whitespace, trim.
    */
  def normText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Stage 1+2 — gate on the model score (raw text; the model sees what
    * was crawled), then normalize keepers. Null-text docs were dropped by
    * the scorer (unscorable); null-ID docs drop HERE, at the dedup door:
    * a survivor must have a publishable id, and letting null ids into
    * min(doc_id)/first-wins would hinge on engine null-order defaults.
    * Both conventions are mirrored verbatim in the DuckDB twin.
    */
  def gatedNormalized(docs: DataFrame): DataFrame =
    TextAnalysis.scoredDocs(docs)
      .filter(col("score_milli") >= 0 && col("doc_id").isNotNull)
      .withColumn("norm_text", normText(col("text")))

  /** Stage 3 — first-wins exact dedup on the NORMALIZED text: survivors =
    * min doc_id per norm_text ([[Dedup.exact]] body-free shuffle), joined
    * back id-keyed for their lang/source/norm_text. Docs whose text
    * normalizes to "" (all punctuation) are REAL members of one shared
    * group — they collapse to a single survivor, not zero.
    */
  def survivors(gated: DataFrame): DataFrame =
    gated.withColumnRenamed("doc_id", "keep_id")
      .join(Dedup.exact(gated, "norm_text", "doc_id").select("keep_id"),
        Seq("keep_id"))

  /** Stage 4 — deterministic mixture resample of the survivor set:
    * membership = substr(md5(norm_text), 1, 8) < per-source threshold
    * (the `llm_mixture_sample` rule, applied post-dedup). `thr` is the
    * caller's per-source threshold when-chain so the weights stay
    * single-sourced with the catalog twin. Unknown/null sources fall to
    * the chain's "00000000" floor → kept nowhere, in both engines.
    */
  def mixtureSampled(surv: DataFrame, thr: Column): DataFrame =
    surv.filter(substring(md5(col("norm_text").cast("binary")), 1, 8) < thr)

  /** Stage 5 — pack sampled survivors into [[PackBudget]]-token bins per
    * language, doc_id order (a doc crossing a boundary belongs to the bin
    * where it starts), rolled up per (lang, bin). Token counts are over
    * the NORMALIZED text — that is what ships.
    */
  def packed(sampled: DataFrame): DataFrame = {
    val withTokens = sampled
      .withColumn("n_tokens", size(split(col("norm_text"), " ")).cast("long"))
    Windows.partitionedPrefixSum(withTokens, col("n_tokens"),
        Seq("lang"), floor(col("keep_id") / 100).cast("long"),
        Seq(col("keep_id")), "cum_before")
      .withColumn("bin", floor(col("cum_before") / (PackBudget * 1.0)))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        min(col("keep_id")).as("first_doc"))
      .orderBy(col("lang"), col("bin"))
  }

  /** The whole build: gate → normalize → dedup → mixture → pack.
    *
    * Stage materialization: Catalyst recomputes LINEAGE on both sides of
    * the dedup self-join and again inside the prefix-sum's offsets
    * branch — the unpersisted DAG re-ran the scoring kernel and re-read
    * the corpus FOUR times (r15 plan audit, EXPLAINS.md). A production
    * corpus build persists between stages (that is the pipeline
    * contract — each stage's output is the next stage's input, computed
    * once); here the two stage boundaries cache exactly what downstream
    * consumes (narrow projections — raw text and the score are dropped
    * before caching). Bench/Verify clear the cache per query, keeping
    * cache lifetimes deterministic (the ADVICE r9 rule).
    */
  def build(docs: DataFrame, thr: Column): DataFrame = {
    val gated = gatedNormalized(docs)
      .select(col("doc_id"), col("lang"), col("source"), col("norm_text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sampled = mixtureSampled(survivors(gated), thr)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    packed(sampled)
  }

  /** [[build]] with parquet stage boundaries instead of executor caches —
    * the production materialization (VERDICT r15 item 3). At 100 TB a
    * stage boundary is a checkpointed TABLE: an executor cache evicts
    * under memory pressure (silently re-running the lineage upstream of
    * it — the exact 4x-rescan hazard the persists exist to prevent),
    * dies with the executor, and cannot be inspected, resumed from, or
    * shared across jobs. Writing each stage to `stageDir` truncates the
    * lineage hard (downstream plans start from a parquet scan), makes
    * the intermediate sets auditable (the gated set and the sampled
    * survivor set ARE deliverables of a curation run), and turns a
    * failed later stage into a restart from the last table instead of
    * from the crawl. Same narrow projections as the cached form — the
    * stages write exactly what downstream consumes.
    *
    * Output-identical to [[build]] by construction (same expressions,
    * one roundtrip through parquet per boundary) — spec-pinned in
    * `CorpusBuildSpec` on fixtures and real testdata.
    */
  def buildMaterialized(docs: DataFrame, thr: Column,
      stageDir: String): DataFrame = {
    val spark = docs.sparkSession
    gatedNormalized(docs)
      .select(col("doc_id"), col("lang"), col("source"), col("norm_text"))
      .write.mode("overwrite").parquet(s"$stageDir/gated")
    val gated = spark.read.parquet(s"$stageDir/gated")
    mixtureSampled(survivors(gated), thr)
      .write.mode("overwrite").parquet(s"$stageDir/sampled")
    packed(spark.read.parquet(s"$stageDir/sampled"))
  }
}
