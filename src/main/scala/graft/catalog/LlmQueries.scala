package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns
import graft.operators.{CorpusBuild, Dedup, HeavyHitters, Multimodal, Sampling, Similarity, TextAnalysis, Windows}

/** SURVEY §2.B LLM-data-pipeline block (BASELINE.json north-star):
  * deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
  * search (brute-force / blocked join / IVF), text analysis (lang-id,
  * quality, tokens, fingerprints) and multimodal-column plumbing.
  *
  * Determinism contract (SURVEY §2.B): total ORDER BY on every query,
  * doubles rounded, counts BIGINT. Queries without a portable SQL twin
  * (hash-function-dependent or approximate) are declared without an oracle
  * → driver records a rows-only check; their real correctness lives in the
  * unit suites.
  */
object LlmQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** Bit width of the embed-dedup sign bucket and the cosine near-dup
    * threshold, shared by llm_dedup_{embed,clusters,keep} on BOTH engines
    * (the oracle SQL is built from the same two values below, so the twins
    * cannot diverge). 0.35 is the semantic near-dup line; 2 bits keeps the
    * sf0.01 result set non-trivial (9 pairs) at that threshold. Block-size
    * math at scale: a hot label's expected block is |label|/2^bits rows, so
    * per-block pair work shrinks 4^bits-fold — at 100 TB you raise `bits`
    * (accepting recall loss from sign flips near zero) or add rotated
    * bucket sets, rather than loosening the threshold.
    */
  private val DedupBits = 2
  private val DedupThreshold = 0.35
  /** 8-bit twin for llm_similarity_lsh (~1/256 block cap). */
  private val LshBits = 8
  /** Rounds of llm_bpe_merges, shared with its generated oracle. */
  private val BpeMergeRounds = 5

  /** The composite `(label, sign-bucket)` block key over an embeddings
    * frame, shared by the embed-dedup family and `llm_similarity_lsh`.
    * Label-only blocking is quadratic on a hot label at 100 TB; composing
    * the sign-LSH bucket caps every block at ~1/2^bits of its label's rows
    * while near-identical vectors (which agree on signs) still collide.
    * Cross-engine parity contract, pinned by `SimilaritySpec`:
    *  - null label coalesces to `∅` on BOTH engines (Spark's concat_ws
    *    skips nulls while DuckDB's concat keeps the separator, so without
    *    the coalesce a null label builds different keys per engine);
    *  - a dimension past the array's end reads null on both engines
    *    (`element_at` / list index out of range) and buckets as '0'.
    */
  private[graft] def compositeBlockKey(bits: Int): org.apache.spark.sql.Column =
    concat_ws("|", coalesce(col("label").cast("string"), lit("∅")),
      VectorFns.signBucket(col("embedding"), bits))

  /** Embeddings with the composite block key the embed-dedup family joins on. */
  private def dedupBlocked(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).withColumn("blk", compositeBlockKey(DedupBits))

  /** The embed-dedup family's pair source (r11): the SHIPPED ANN
    * candidate path over the composite block — a fixed (label, sign)
    * block key alone leaves block size ∝ corpus under a hot label, which
    * the r11 skewed decade measured quadratic (llm_cluster_stats 7.1 s →
    * 253 s sf1→sf10 skew, exponent ~1.55); data-sized IVF cells bound
    * every compared block. targetCellSize=4000 keeps the join EXACT (one
    * cell ⇒ identical to `blockedSimilarityJoin`) at every oracle scale
    * — sf0.001/0.01 embeddings are 20/200 rows, with 20× regen headroom
    * — so the family's full hash oracles pin real output; pruning only
    * activates at decade scales the SQL gate never runs.
    */
  private def dedupPairs(s: SparkSession, d: String): DataFrame =
    Similarity.annSimilarityJoin(dedupBlocked(s, d), "blk", DedupThreshold,
      targetCellSize = 4000)

  /** DuckDB block-key expression twinned with [[dedupBlocked]] — same bits,
    * same null-label coalescing.
    */
  private val dedupBlkSql: String =
    s"concat(coalesce(CAST(label AS VARCHAR), '∅'), '|', " +
      s"${VectorFns.signBucketSql("embedding", DedupBits)})"

  private val lshBlkSql: String =
    s"concat(coalesce(CAST(label AS VARCHAR), '∅'), '|', " +
      s"${VectorFns.signBucketSql("embedding", LshBits)})"

  /** Quality-gate thresholds shared by `llm_quality_filter`'s Spark side
    * and its SQL twin: composite score floor, token-count band. 0.5 splits
    * the corpus near its quality median (121/500 docs survive all three
    * gates at sf0.01) so the filter is non-trivial in both directions.
    */
  private val QualityMin = 0.5
  private val QualityTokMin = 10
  private val QualityTokMax = 1000

  /** Mixture resampling weights for `llm_mixture_sample`: target keep
    * fraction per source (src0..src19 cycle 1.0/0.5/0.25/0.1). Membership
    * is content-addressed — `substr(md5(text),1,8) < thresholdHex(w)` —
    * so it is layout-independent (survives repartition/re-ingest) and
    * identical in both engines via plain ASCII comparison of equal-length
    * lowercase hex (lexicographic == numeric). The SQL CASE twin is built
    * from this SAME Seq so the engines cannot diverge.
    */
  private val MixtureWeights: Seq[(String, Double)] =
    (0 until 20).map(i => s"src$i" -> Seq(1.0, 0.5, 0.25, 0.1)(i % 4))

  /** 8-hex-digit membership threshold for weight w: the first 8 md5 hex
    * chars are uniform on [0, 16^8), so `hex < threshold(w)` keeps a w
    * fraction. w >= 1 returns "g", which is > every hex string (ASCII
    * 'g' > 'f') — keep-all without a 9-digit carry breaking the
    * equal-length compare.
    */
  private[graft] def mixtureThresholdHex(w: Double): String =
    if (w >= 1.0) "g" else f"${(w * 4294967296L).toLong}%08x"

  /** The per-source threshold when-chain over [[MixtureWeights]] —
    * single-sourced for the two mixture keys and `CorpusBuildProbe`.
    */
  private[graft] def mixtureThresholdChain: org.apache.spark.sql.Column =
    MixtureWeights.foldLeft(lit("00000000")) {
      case (acc, (src, w)) =>
        when(col("source") === src, lit(mixtureThresholdHex(w))).otherwise(acc)
    }

  /** DuckDB CASE twin of the per-source threshold when-chain. */
  private val mixtureThrSql: String =
    MixtureWeights.map { case (src, w) =>
      s"WHEN source = '$src' THEN '${mixtureThresholdHex(w)}'"
    }.mkString("CASE ", " ", " ELSE '00000000' END")

  /** Per-doc unigram-LM score below this ⇒ counted "low quality"
    * (llm_ngram_lm); sf0.01 scores span −3.70..−3.38, median −3.40, so
    * −3.45 gates a real minority tail in both directions.
    */
  private val NgramLmLow = -3.45

  /** Columns profiled by `llm_data_profile` — the SQL twin is generated
    * from this same Seq, so the engines profile identical columns.
    */
  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** Per-doc unigram-LM mean log-probability (the CCNet scoring kernel),
    * shared by llm_ngram_lm and llm_ccnet_buckets so the two queries (and
    * their SQL twins, which duplicate this chain verbatim) cannot diverge.
    * Per-token ln(tf/total) is fixed to integer 1e-6 units BEFORE the
    * per-doc sum, so the fold is exact bigint addition — order-independent
    * across partitions and engines. The token→tf join: tf is vocab-sized
    * (≪ corpus — Heaps' law), so Catalyst/AQE broadcasts it at any
    * realistic scale. Output: (doc_id, lang, score), score 4dp-rounded.
    */
  private def unigramDocScores(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
    val tf = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val tot = toks.agg(count(lit(1)).as("total"))
    toks.join(tf, "token").crossJoin(broadcast(tot))
      .withColumn("lp", floor(
        log(col("tf").cast("double") / col("total").cast("double"))
          * 1000000.0 + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("lp")).as("units"), count(lit(1)).as("n"))
      .select(col("doc_id"), col("lang"),
        graft.functions.Rounding.roundTo(
          col("units").cast("double") / 1000000.0 / col("n").cast("double"), 4)
          .as("score"))
  }

  /** DuckDB stop-word-hit count, built from the SAME Scala list the Spark
    * expressions use (TextAnalysis.Stop*) — single-sourced across engines.
    */
  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN " +
      words.mkString("('", "','", "')") + "))"

  /** DuckDB twin of TextAnalysis.langId's argmax (ties: en > es > de). */
  private def predictedLangSql: String = {
    val en = hitsSql(TextAnalysis.StopEn)
    val es = hitsSql(TextAnalysis.StopEs)
    val de = hitsSql(TextAnalysis.StopDe)
    s"""CASE
          WHEN $en = 0 AND $es = 0 AND $de = 0 THEN 'unknown'
          WHEN $en >= $es AND $en >= $de THEN 'en'
          WHEN $es >= $de THEN 'es'
          ELSE 'de'
        END"""
  }

  /** DuckDB twin of TextAnalysis's composite quality score (floor-rounded
    * to 4 dp, the portable form).
    */
  private def qualitySql: String =
    s"""floor((least(len(string_split(text, ' '))::DOUBLE / 50.0, 1.0) * 0.5 +
          (${hitsSql(TextAnalysis.StopEn)}::DOUBLE /
           len(string_split(text, ' '))::DOUBLE) * 0.5) * 10000.0 + 0.5) / 10000.0"""

  val queries: Map[String, QFn] = Map(
    // ---- deduplication -------------------------------------------------
    "llm_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "text", "doc_id")
        .orderBy(col("keep_id"))),

    // Per-doc fuzzy near-dup profile. Hash-oracled late in r12 (the IVF
    // verdict pattern): the hashed surface is EXACT — per-doc partner
    // count and max Jaccard over the corpus-global 3-shingle Jaccard
    // >= 0.5 pair set (Dedup.shingleJaccardPairsGlobal; DuckDB twin =
    // brute-force list_intersect Jaccard at oracle scale) — while the
    // MinHash-LSH banding still runs in the same query:
    // `lsh_recall_ok` pins the BAND-candidate recall against that exact
    // pair set at >= 0.9. The data's true pairs sit at shingle-J >= 0.8
    // where the 8-band/4-row catch probability is >= 0.96/pair, so the
    // verdict holds with margin; a broken signature or banding kernel
    // flips it and reddens the driver row (falsifiability spec-pinned).
    // The two .count() actions are driver-side scalars (the allowed
    // collect class); the exact pair set is cached so the recall probe
    // and the returned frame share one SSJoin.
    "llm_dedup_fuzzy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // cache(), NOT an eager localCheckpoint (measured r19): this
      // query's plan is small enough that lineage truncation buys no
      // planning time, while eager materialization SERIALIZES the
      // SSJoin in front of the fused recall job below — with cache()
      // that job computes the SSJoin and LSH subtrees concurrently
      // (min-of-3: 2.62 s cached vs 3.17 s checkpointed).
      val exact = Dedup.shingleJaccardPairsGlobal(
        docs.select(col("doc_id"), col("text")), n = 3, threshold = 0.5).cache()
      val cand = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      // ONE action for both recall counts (r19, guide §1.2 "don't pay
      // two passes for one decision"): cand is distinct by construction
      // (minhashCandidatePairs ends in .distinct()), so a left join
      // preserves exact's row multiplicity and count(__c) equals the
      // former left_semi count — while the fused job also lets the SSJoin
      // and LSH subtrees execute concurrently instead of as two
      // sequential driver actions.
      val rc = exact.join(cand.withColumn("__c", lit(1)),
          Seq("a_id", "b_id"), "left")
        .agg(count(lit(1)).as("n"), count(col("__c")).as("caught")).head()
      val nExact = rc.getLong(0)
      val caught = rc.getLong(1)
      val recallOk = if (nExact == 0L || caught.toDouble / nExact >= 0.9) 1L else 0L
      val deg = exact.select(col("a_id").as("doc_id"), col("jaccard"))
        .unionByName(exact.select(col("b_id").as("doc_id"), col("jaccard")))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_near_dups"), max(col("jaccard")).as("max_jaccard"))
      docs.select(col("doc_id")).join(deg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
          coalesce(col("max_jaccard"), lit(0.0)).as("max_jaccard"),
          lit(recallOk).as("lsh_recall_ok"))
        .orderBy(col("doc_id"))
    }),

    // 64-bit SimHash fingerprints. md5-derived bits (= DuckDB
    // md5_number_upper) since r10, so this is hash-oracled like the rest
    // of the dedup family.
    "llm_dedup_simhash" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d), "text", "doc_id")
        .orderBy(col("doc_id"))),

    // Blocked n-gram Jaccard near-dup pairs — exact set algebra, SQL twin
    // built from DuckDB list functions. Within-block candidates come from
    // the exact prefix-filter index (same generator as containment; the
    // (lang, source, len_bkt) block stays part of the semantics) — see
    // Dedup.ngramJaccardPairsIndexed.
    "llm_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairsIndexed(Tables.documents(s, d), n = 3,
        charBucket = 100, threshold = 0.2)
        .orderBy(col("a_id"), col("b_id"))),

    // Containment near-dup pairs (|A∩B| / min(|A|,|B|) over word
    // 2-grams): the asymmetric measure that catches a doc (nearly)
    // embedded in a larger one — Jaccard structurally misses those, and
    // the length-bucket blocking of llm_dedup_ngram would veto exactly
    // these pairs. Candidate generation is the EXACT-recall prefix-filter
    // inverted index (rarest-gram prefix postings ⋈ full postings, shared
    // with llm_dedup_ngram — candidates ⊇ results by the SSJoin prefix
    // theorem; never an all-pairs corpus self-join within a (lang,
    // source) block), verified with the codegen'd sorted-merge intersect
    // — see Dedup.containmentPairsIndexed, and DedupSpec for the
    // equivalence pin against the all-pairs twin. The sampled
    // winnowing-fingerprint candidate path with the MOSS ≥5-token-run
    // recall contract lives in Dedup.containmentPairsWinnow (kept as the
    // cheaper approximate alternative; rejected for THIS oracled query
    // because its recall is span-conditional, not exact).
    "llm_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairsIndexed(Tables.documents(s, d), n = 2,
          threshold = 0.2)
        .orderBy(col("a_id"), col("b_id"))),

    // C4-style chunk-level dedup stats: per-doc duplicated-chunk fraction
    // over consecutive 10-token chunks; multiplicity via ONE window
    // shuffle on (xxhash64, length) — see Dedup.chunkDupStats.
    "llm_dedup_lines" -> ((s, d) =>
      Dedup.chunkDupStats(Tables.documents(s, d), chunkTokens = 10)
        .orderBy(col("doc_id"))),

    // Duplicated-substring coverage (Lee et al. span-level dedup signal
    // at 5-gram granularity): fraction of each doc's token positions
    // covered by a 5-token run occurring elsewhere in the corpus — sees
    // the duplicated SPANS that doc-level signatures cannot. k=5 keeps
    // sf0.01 non-trivial in both directions (71/500 docs partially
    // covered, 24 fully). See Dedup.substringDupCoverage.
    "llm_dedup_substring" -> ((s, d) =>
      Dedup.substringDupCoverage(Tables.documents(s, d), k = 5)
        .orderBy(col("doc_id"))),

    // Benchmark decontamination: corpus docs sharing any 4-token gram with
    // the probe set (doc_id < 5); probe grams broadcast, corpus side never
    // shuffles for the membership test — see Dedup.contaminationHits.
    // 4-gram keeps the hit set non-trivial both ways at sf0.01 (11 of 500
    // docs contaminated) and sf0.001 (9 of 500).
    "llm_contamination" -> ((s, d) =>
      Dedup.contaminationHits(Tables.documents(s, d), probeMaxId = 5L,
        gramLen = 4)
        .orderBy(col("doc_id"))),

    // Embedding-cosine near-dup: a doc is dropped when a same-block doc
    // with a smaller id is cosine-similar above threshold; keep = best
    // partner (highest sim, then lowest id). The pair source is the
    // blocked similarity join over the composite (label, sign-bucket)
    // key — label alone is quadratic in a hot label at 100 TB; the sign
    // bucket caps every block at ~1/2^DedupBits of its label while
    // keeping sign-agreeing near-dups together. Threshold stays at the
    // semantic 0.35 near-dup line; DedupBits=2 keeps the sf0.01 pair set
    // non-trivial there (9 pairs vs 26 under label-only blocking).
    "llm_dedup_embed" -> ((s, d) => {
      val pairs = dedupPairs(s, d)
      val w = Window.partitionBy(col("b_id")).orderBy(desc("sim"), col("a_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("b_id").as("drop_id"), col("a_id").as("keep_id"), col("sim"))
        .orderBy(col("drop_id"))
    }),

    // Transitive near-dup clusters from the embedding pair graph: each
    // clustered doc labeled with its cluster's min id (connected
    // components via large-star/small-star contraction). Same composite
    // blocking as llm_dedup_embed.
    "llm_dedup_clusters" -> ((s, d) => {
      val pairs = dedupPairs(s, d)
      Dedup.connectedComponents(pairs)
        .orderBy(col("id"))
    }),

    // The dedup REPORT a curation run publishes before committing: the
    // cluster-size histogram — clusters per size, docs affected, docs
    // droppable ((size-1) per cluster) — including the size-1 row for
    // singletons (corpus minus clustered; a 1-row × 1-row scalar cross,
    // the degenerate-broadcast form PlanSweepSpec whitelists). All
    // aggregates run over the tiny CC output, never the corpus.
    "llm_cluster_stats" -> ((s, d) => {
      val pairs = dedupPairs(s, d)
      val cc = Dedup.connectedComponents(pairs)
      val bySize = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
      val singles = Tables.embeddings(s, d).agg(count(lit(1)).as("n_total"))
        .crossJoin(cc.agg(count(lit(1)).as("n_clustered")))
        .select(lit(1L).as("cluster_size"),
          (col("n_total") - col("n_clustered")).as("n_clusters"))
      bySize.unionByName(singles)
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"),
          ((col("cluster_size") - 1) * col("n_clusters")).as("n_dropped"))
        .orderBy(col("cluster_size"))
    }),

    // The materialized dedup output: documents surviving cluster dedup
    // (drop every clustered doc except its cluster's min id) — the
    // training-set-side composition of pairs → clusters → keep set.
    "llm_dedup_keep" -> ((s, d) => {
      val pairs = dedupPairs(s, d)
      val dropped = Dedup.connectedComponents(pairs)
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      Tables.documents(s, d)
        .join(dropped, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
        .orderBy(col("lang"))
    }),

    // The COMPLETE fuzzy-dedup pipeline in one query: near-dup pairs →
    // star-contraction connected components → drop non-min cluster
    // members → per-lang survivor stats. Hash-oracled late in r12 (the
    // IVF verdict pattern): the pair set feeding CC is now the EXACT
    // corpus-global 3-shingle Jaccard >= 0.5 set (deterministic, DuckDB
    // twin = brute-force Jaccard + recursive-CTE CC — the
    // llm_dedup_keep oracle shape), while the full MinHash-LSH pipeline
    // (band candidates ∧ token-Jaccard >= 0.5 verify) still runs in the
    // same query: `lsh_pipeline_ok` pins the verified-LSH-pair recall
    // against the exact pairs that clear the same token gate at >= 0.9.
    // A broken band, signature, or verify stage flips the verdict and
    // reddens the driver row (falsifiability spec-pinned).
    "llm_dedup_fuzzy_keep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // cache(), not an eager checkpoint — the llm_dedup_fuzzy
      // measured rationale (r19): keep the recall job's subtrees
      // concurrent
      val exact = Dedup.shingleJaccardPairsGlobal(
        docs.select(col("doc_id"), col("text")), n = 3, threshold = 0.5)
        .select(col("a_id"), col("b_id")).cache()
      // exact pairs through the SAME token-set gate minhashPairs verifies
      // with — the denominator of the full-pipeline recall. Token sets as
      // sorted FNV hashes + the compiled sorted-merge intersect (same
      // `split(" ", -1)` tokenization as the SQL-split verify path;
      // identical J modulo the declared 64-bit gram-collision bound) —
      // interpreted array_intersect/union HOFs would become the hot path
      // before the SSJoin does if the true pair count ever grows
      val tokenSets = Dedup.slimGramSets(
        docs.select(col("doc_id"), col("text")), n = 1)
      val common = graft.functions.SortedIntersectCount(col("ga"), col("gb"))
      val gated = exact
        .join(tokenSets.withColumnRenamed("doc_id", "a_id")
          .withColumnRenamed("grams", "ga"), "a_id")
        .join(tokenSets.withColumnRenamed("doc_id", "b_id")
          .withColumnRenamed("grams", "gb"), "b_id")
        .withColumn("__c", common)
        .filter(col("__c").cast("double") /
          (size(col("ga")) + size(col("gb")) - col("__c")).cast("double") >= 0.5)
        .select(col("a_id"), col("b_id"))
      // .distinct() so the one-action left-join fold below cannot
      // overcount vs the former left_semi under duplicate verified
      // pairs (cheap: the pair set is result-sized)
      val lsh = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5)
        .select(col("a_id"), col("b_id")).distinct()
      // ONE action for both recall counts — the llm_dedup_fuzzy fold
      // (r19): fuses two sequential jobs and runs the exact-gate and
      // LSH-pipeline subtrees concurrently inside it
      val rc = gated.join(lsh.withColumn("__c", lit(1)),
          Seq("a_id", "b_id"), "left")
        .agg(count(lit(1)).as("n"), count(col("__c")).as("caught")).head()
      val nGated = rc.getLong(0)
      val caught = rc.getLong(1)
      val pipeOk = if (nGated == 0L || caught.toDouble / nGated >= 0.9) 1L else 0L
      val dropped = Dedup.connectedComponents(exact)
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      docs.join(dropped, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
        .withColumn("lsh_pipeline_ok", lit(pipeOk))
        .orderBy(col("lang"))
    }),

    // ---- similarity search ---------------------------------------------
    "llm_similarity_topk" -> ((s, d) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, d), queryId = 1L, k = 10)),

    "llm_similarity_join" -> ((s, d) =>
      Similarity.blockedSimilarityJoin(
        Tables.embeddings(s, d).withColumn("blk", col("label")), "blk", 0.2)
        .orderBy(col("a_id"), col("b_id"))),

    // Sign-LSH composite blocking: block key = (label, 8-bit sign bucket).
    // The label-only block is quadratic in a hot label; composing the LSH
    // bucket caps every block at ~1/256 of the label's rows while keeping
    // near-identical vectors (which agree on signs) together — the 100 TB
    // candidate-generation path. Exact SQL twin, so fully oracle-checked.
    // (label coalesced on BOTH sides: Spark concat_ws skips nulls while
    // DuckDB concat keeps the separator — a null label would silently
    // build different block keys per engine)
    "llm_similarity_lsh" -> ((s, d) =>
      Similarity.blockedSimilarityJoin(
        Tables.embeddings(s, d).withColumn("blk", compositeBlockKey(LshBits)),
        "blk", 0.2)
        .orderBy(col("a_id"), col("b_id"))),

    // IVF ANN: approximate by construction → rows-only; recall asserted
    // vs brute force in the unit suite. Runs against the materialized
    // partitionBy(cid) index — the probe scan prunes to nProbe partitions.
    // Oracled since r12 (verdict pattern): the IVF answer is approximate
    // (probes prune to nProbe/nCentroids of the corpus — the point), so
    // the hashed surface is the EXACT brute-force top-k plus `recall_ok`,
    // computed from the IVF run's overlap with it (the suite's "usable"
    // bound, ≥ 4 of 10). The index build, materialization, and pruned
    // probe all still execute — a broken index flips the verdict and
    // reddens the driver row. Both frames are k=10 rows (TakeOrdered
    // class), so the driver-side overlap count is O(k).
    "llm_similarity_ivf" -> ((s, d) => {
      import s.implicits._
      val ivfIds = Similarity
        .ivfTopK(s, Tables.embeddings(s, d), queryId = 1L, k = 10)
        .select(col("vec_id")).as[Long].collect().toSet
      // cached: the recall collect and the returned frame's
      // materialization would otherwise each pay the full scan+top-k
      // (r12 review); Verify clears the cache after every query
      val exact = Similarity
        .bruteForceTopK(Tables.embeddings(s, d), queryId = 1L, k = 10)
        .cache()
      val exactIds = exact.select(col("vec_id")).as[Long].collect().toSet
      val recall = if (exactIds.isEmpty) 1.0
        else exactIds.count(ivfIds).toDouble / exactIds.size
      exact.withColumn("recall_ok", lit(if (recall >= 0.4) 1L else 0L))
    }),

    // The SHIPPED scale path for the similarity-join contract (clears the
    // r10 weak): same (a_id, b_id, sim ≥ threshold) output as
    // llm_similarity_join but candidates come from data-sized IVF cells
    // (k grows with the corpus → per-cell pair cost bounded), verified
    // with the exact DotProduct expression. At gate scales the index
    // degenerates to one cell — output identical to the all-pairs twin
    // (recall 1.0); pruning recall ≥ 0.95 is asserted on planted
    // clusters in SimilaritySpec → declared rows-only.
    // Oracled since r12: at the correctness-gate scale (n ≤
    // targetCellSize) the index degenerates and this IS the exact
    // all-pairs join — so the oracle both hash-checks the output AND
    // pins the unit-scale recall contract in the driver (an index that
    // wrongly engaged and dropped pairs at small n reddens the row).
    // At bench/production scales the pruned path is approximate by
    // declared design (recall specs in SimilaritySpec).
    "llm_similarity_ann_join" -> ((s, d) =>
      Similarity.annSimilarityJoin(
        Tables.embeddings(s, d).withColumn("blk", col("label")), "blk", 0.2)
        .orderBy(col("a_id"), col("b_id"))),

    // ---- text analysis -------------------------------------------------
    "llm_text_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      val perLang = toks.groupBy(col("lang")).agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("vocab"))
      val chars = docs.groupBy(col("lang"))
        .agg(graft.functions.Rounding.roundTo(avg(col("n_chars")), 2).as("avg_chars"))
      perLang.join(chars, "lang")
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("vocab"), col("avg_chars"))
        .orderBy(col("lang"))
    }),

    "llm_text_langid" -> ((s, d) =>
      TextAnalysis.langId(Tables.documents(s, d)).orderBy(col("doc_id"))),

    "llm_text_quality" -> ((s, d) =>
      TextAnalysis.qualityScore(Tables.documents(s, d)).orderBy(col("doc_id"))),

    "llm_text_tokens" -> ((s, d) =>
      TextAnalysis.tokenCounts(Tables.documents(s, d)).orderBy(col("doc_id"))),

    "llm_text_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(Tables.documents(s, d)).orderBy(col("doc_id"))),

    // Canonical text normalization (the usual pre-dedup pass: lowercase,
    // strip non-alphanumerics, collapse whitespace) — normalize-then-dedup
    // catches near-dups that differ only in casing/punctuation.
    "llm_text_normalize" -> ((s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), norm.as("norm_text"),
          length(norm).as("n_norm_chars"))
        .orderBy(col("doc_id"))
    }),

    // Repetition scoring (Gopher-style quality signal): fraction of
    // duplicated word 2-grams per document. Kernel-backed — the HOF gram
    // build was the slowest query in BENCH (see TextAnalysis.repetitionRatio).
    "llm_text_repetition" -> ((s, d) => {
      val out = TextAnalysis.repetitionRatio(Tables.documents(s, d))
      out.select(col("doc_id"), col("n_grams").cast("int").as("n_grams"),
          col("rep_ratio"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF top terms per language: scores ROUNDED BEFORE ranking so the
    // cross-engine ordering never hinges on a libm ulp; ties broken by
    // token. Corpus-level idf needs one tiny broadcast aggregate.
    "llm_text_topterms" -> ((s, d) => {
      // lang-scoped TF-IDF is defined over docs WITH a language: a token
      // seen only in null-lang docs has df = 0, and nl/df is then a
      // divide-by-zero (ANSI throw) vs DuckDB's inf — excluded identically
      // in the twin
      val docs = Tables.documents(s, d).filter(col("lang").isNotNull)
      val toks = docs.select(col("lang"), explode(split(col("text"), " ")).as("token"))
      val tf = toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("tf"))
      val dfreq = toks.groupBy(col("token"))
        .agg(countDistinct(col("lang")).as("df"))
      val nLangs = docs.agg(countDistinct(col("lang")).as("nl"))
      val scored = tf.join(dfreq, "token")
        .crossJoin(broadcast(nLangs))
        .withColumn("score", graft.functions.Rounding.roundTo(
          col("tf") * log(col("nl").cast("double") / col("df").cast("double")), 4))
      val w = Window.partitionBy(col("lang")).orderBy(desc("score"), col("token"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("lang"), col("rnk"), col("token"), col("score"))
        .orderBy(col("lang"), col("rnk"))
    }),

    // Gopher-style per-rule drop-rate diagnostic: every rule's pass flag
    // computed in one projection, then ONE aggregate + stack() unpivot to
    // a (rule, n_pass, n_fail) report — the table a curation run reads
    // before committing to a filter. One scan, one 1-row shuffle.
    "llm_gopher_rules" -> ((s, d) => {
      val f = TextAnalysis.gopherFlags(Tables.documents(s, d))
      def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L))
      f.agg(count(lit(1)).as("n"),
          cnt("ok_word_count").as("wc"),
          cnt("ok_mean_word_len").as("mwl"),
          cnt("ok_stop_hits").as("stop"),
          sum(when(col("ok_word_count") && col("ok_mean_word_len") &&
            col("ok_stop_hits"), 1L).otherwise(0L)).as("all_ok"))
        .select(expr(
          """stack(4,
               'word_count', wc, n - wc,
               'mean_word_len', mwl, n - mwl,
               'stop_hits', stop, n - stop,
               'all_rules', all_ok, n - all_ok) AS (rule, n_pass, n_fail)"""))
        .orderBy(col("rule"))
    }),

    // PII scrub audit: per lang, docs touched + per-class redaction
    // counts + total characters removed. The real corpus is PII-free by
    // construction, so the adversarial fixture generator plants
    // emails/IPs/phones (tools/adversarial_fixtures.py) — the sweep is
    // where the regex parity actually bites; planted-fixture units in
    // TextAnalysisSpec pin the redaction itself.
    "llm_pii_scrub" -> ((s, d) => {
      TextAnalysis.piiScrub(Tables.documents(s, d))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_emails") + col("n_ips") + col("n_phones") > 0, 1L)
            .otherwise(0L)).as("n_docs_with_pii"),
          sum(col("n_emails")).cast("bigint").as("emails"),
          sum(col("n_ips")).cast("bigint").as("ips"),
          sum(col("n_phones")).cast("bigint").as("phones"),
          sum(col("chars_removed")).cast("bigint").as("chars_removed"))
        .orderBy(col("lang"))
    }),

    // Overlapping token-window chunking (len 32, stride 24 → 8-token
    // overlap): per lang, chunk volume + full-vs-tail split + avg chunk
    // size. Fan-out is ceil(n/stride) rows/doc — bounded; one aggregate
    // shuffle on lang.
    "llm_chunk_stride" -> ((s, d) => {
      val c = TextAnalysis.chunkWindows(Tables.documents(s, d),
        chunkLen = 32, stride = 24)
      c.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("chunk_tokens") === 32, 1L).otherwise(0L))
            .as("n_full"),
          sum(col("chunk_tokens").cast("long")).as("sum_tokens"),
          graft.functions.Rounding.roundTo(
            sum(col("chunk_tokens").cast("long")).cast("double") /
              count(lit(1)).cast("double"), 2).as("avg_tokens"))
        .orderBy(col("lang"))
    }),

    // Per-doc unigram entropy (the information-density quality signal —
    // word-soup spam scores low, natural text ~log(vocab)): for each
    // distinct token, (c/n)·ln(n/c), fixed to 1e-6-unit bigints per term
    // (the llm_ngram_lm convention) and folded SEQUENTIALLY inside the
    // row's HOF — term order is array order in both engines and the fold
    // never crosses rows, so the result is partitioning-independent.
    // O(distinct × n) compares per doc, pure map; only per-lang bigint
    // partials shuffle.
    "llm_token_entropy" -> ((s, d) => {
      val ent = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .withColumn("__t", split(col("text"), " "))
        .withColumn("ent_units", expr(
          """aggregate(
               transform(array_distinct(__t),
                 t -> CAST(floor(
                   CAST(size(filter(__t, x -> x = t)) AS DOUBLE) / size(__t)
                   * ln(CAST(size(__t) AS DOUBLE)
                        / size(filter(__t, x -> x = t)))
                   * 1000000.0 + 0.5) AS BIGINT)),
               0L, (a, x) -> a + x)"""))
      ent.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ent_units")).as("sum_units"),
          graft.functions.Rounding.roundTo(
            sum(col("ent_units")).cast("double") /
              count(lit(1)).cast("double") / 1000000.0, 4).as("avg_entropy"))
        .orderBy(col("lang"))
    }),

    // Zipf rank-frequency fit over the top-100 vocabulary: regr_slope of
    // ln(tf) on ln(rank) — natural language sits near slope −1; word
    // soup is flatter (the corpus-level twin of the per-doc entropy
    // signal). The vocab cut is TakeOrderedAndProject (distributed
    // heap-select); the row_number window then runs over ≤100 rows —
    // bounded by construction, not by data size.
    "llm_zipf_fit" -> ((s, d) => {
      val c = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("tf"))
        .orderBy(desc("tf"), col("token")).limit(100)
      val ranked = c.withColumn("rnk",
        row_number().over(Window.orderBy(desc("tf"), col("token"))))
      def r4(x: org.apache.spark.sql.Column) =
        graft.functions.Rounding.roundTo(x, 4)
      ranked.agg(count(lit(1)).as("n"),
        r4(regr_slope(log(col("tf").cast("double")),
          log(col("rnk").cast("double")))).as("slope"),
        r4(regr_intercept(log(col("tf").cast("double")),
          log(col("rnk").cast("double")))).as("icept"),
        r4(regr_r2(log(col("tf").cast("double")),
          log(col("rnk").cast("double")))).as("r2"))
    }),

    // Winnowing fingerprints (the MOSS scheme): token-3-gram md5 digests,
    // a sliding window of 4 over the gram stream keeps each window's MIN
    // digest, per-doc distinct mins are the doc's fingerprints. The
    // guarantee: any shared run of >= 6 tokens yields a shared
    // fingerprint, with fingerprint density ~2/(w+1) instead of
    // every-gram — the sub-linear near-dup index you can afford to build
    // at 100 TB. md5 hex (not xxhash64) because BOTH engines order the
    // same strings identically — min selection stays cross-engine exact.
    // Pure map per doc (no shuffle until the per-lang rollup).
    "llm_winnow_fingerprint" -> ((s, d) => {
      // size >= 6 gates semantics (grams need n-2 >= 4 for one window),
      // but the expressions must ALSO be total on shorter rows:
      // InferFiltersFromGenerate copies the whole chain into the
      // pushed-down Filter as `size(fps) > 0`, and codegen's common-
      // subexpression elimination evaluates that chain EAGERLY on
      // unfiltered rows — an element_at there throws on a 1-token doc
      // before the size conjunct can short-circuit. Hence slice-based
      // grams (never out of bounds) and greatest()-clamped sequence
      // ends (never descending); short-doc garbage values are cheap and
      // discarded by the explicit filter.
      val docs = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .withColumn("__t", split(col("text"), " "))
        .filter(size(col("__t")) >= 6)
        .withColumn("__g", expr(
          """transform(sequence(1, greatest(size(__t) - 2, 1)),
               i -> md5(concat_ws(' ', slice(__t, i, 3))))"""))
        .withColumn("fps", array_distinct(expr(
          """transform(sequence(1, greatest(size(__g) - 3, 1)),
               j -> array_min(slice(__g, j, 4)))""")))
      // explode_OUTER, then drop the null rows it fabricates: a plain
      // explode makes InferFiltersFromGenerate push `size(fps) > 0` down,
      // INLINING the whole gram chain into the scan filter — where HOFs
      // run interpreted (CodegenFallback) and nested lambdas re-evaluate
      // their inlined inputs per element: O(n^2) md5 calls per row,
      // measured 98 s for this query alone at sf0.1. outer + post-filter
      // keeps the chain evaluated ONCE per row (0.5 s).
      docs.select(col("lang"), explode_outer(col("fps")).as("fp"))
        .filter(col("fp").isNotNull)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_fp"),
          countDistinct(col("fp")).as("n_distinct_fp"))
        .orderBy(col("lang"))
    }),

    // First BPE merge step over the corpus: count adjacent whitespace-token
    // pairs and rank the merge candidates (the tokenizer-training
    // primitive). Pair build is a pure map (transform over an index
    // sequence) + explode; the only shuffles are the map-side-combinable
    // pair-count aggregate and the global top-20, which compiles to
    // TakeOrderedAndProject (distributed heap-select, no full sort).
    // size >= 2 guard: sequence(0, n-2) on a 1-token doc would DESCEND
    // (Spark infers step -1 when start > stop) and fabricate pairs.
    "llm_bpe_pairs" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .withColumn("__t", split(col("text"), " "))
        .filter(size(col("__t")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(__t) - 2),
               i -> concat(element_at(__t, i + 1), ' ', element_at(__t, i + 2)))"""))
          .as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("pair")).limit(20)
    }),

    // Iterative BPE merges (VERDICT r9 #7): k rounds of count-pairs →
    // pick the best merge (count DESC, pair ASC, t1 ASC — fully
    // deterministic) → greedily rewrite every doc's token sequence
    // left-to-right — the actual tokenizer-training loop, where
    // llm_bpe_pairs stops at round 1's candidate ranking. Per round:
    // ONE map-side-combinable pair-count aggregate + ONE pure-map fold
    // rewrite (bounded scans per round; the chosen pair is a driver
    // SCALAR, never a collected distribution). The fold is greedy-safe
    // without a flag: a merge product "A B" is strictly longer than A,
    // so it can never be re-consumed as the left element within the same
    // round. Output = the k (round, chosen pair, pre-merge count) rows;
    // the DuckDB twin unrolls the same k rounds as CTEs, selecting
    // greedy matches as the even offsets within each run of consecutive
    // match positions (provably the left-to-right greedy set).
    "llm_bpe_merges" -> ((s, d) => {
      import s.implicits._
      bpeMergeLoop(s, d, BpeMergeRounds)._2
        .toDF("round", "pair", "n").orderBy(col("round"))
    }),

    // Tokenizer APPLICATION — the other half of the training loop: encode
    // every (≥2-token, non-null) doc with the k merges llm_bpe_merges
    // learns, and report the per-doc compression (tokens after vs
    // before). Same per-round cost shape as the training loop; the final
    // per-doc count is one map + aggregate over the last round's frame.
    // The DuckDB twin extends the unrolled-CTE chain with a group-by over
    // the final token table.
    "llm_bpe_encode" -> ((s, d) => {
      val toks = bpeMergeLoop(s, d, BpeMergeRounds)._1
      toks.select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          (size(expr("filter(toks, t -> instr(t, ' ') > 0)")))
            .as("n_merged_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Two-pass EXACT heavy hitters with bounded aggregation state — the
    // scale path for top-k when the key space is NOT Heaps-bounded
    // (llm_bpe_pairs' full groupBy shuffles every distinct key; fine for
    // word vocab, corpus-sized for URLs/hashes/high-order n-grams at
    // 100 TB). Pass 1: a mergeable Misra-Gries summary (k=2048 counters
    // per partial buffer — the shuffle moves ≤ k pairs per map partition
    // regardless of key cardinality) guarantees every gram with true
    // frequency > N/2048 survives as a candidate. Pass 2: exact recount
    // of the ≤ 2048 candidates via broadcast semi-join + top-40. Output
    // is provably EXACT (hash-oracle-able) while the 40th count exceeds
    // N/2048 — measured margin 40 vs 13 at sf0.01, 324 vs 130 at sf0.1,
    // asserted in HeavyHittersSpec so data drift fails a test, not the
    // oracle. Same gram kernel as llm_bpe_pairs (guards incl. the
    // size>=2 descent trap documented there).
    "llm_heavy_hitters" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .withColumn("__t", split(col("text"), " "))
        .filter(size(col("__t")) >= 2)
        .select(explode(expr(
          """transform(sequence(0, size(__t) - 2),
               i -> concat(element_at(__t, i + 1), ' ', element_at(__t, i + 2)))"""))
          .as("gram"))
      val cands = grams
        .agg(HeavyHitters.misraGries(2048)(col("gram")).as("cs"))
        .select(explode(col("cs")).as("gram"))
      grams.join(broadcast(cands), "gram")
        .groupBy(col("gram")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("gram")).limit(40)
    }),

    // The shipped curation gate: quality score + language agreement +
    // token band computed in ONE pass over the corpus (no join of
    // per-signal scans), survivors counted per (lang, source). min/max of
    // the per-row quality stand in for avg — they are order-independent
    // doubles, so the hash compare never hinges on float accumulation
    // order across partitions.
    "llm_quality_filter" -> ((s, d) =>
      TextAnalysis.qualityFilter(Tables.documents(s, d),
          QualityMin, QualityTokMin, QualityTokMax)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_kept"),
          min(col("quality")).as("min_q"), max(col("quality")).as("max_q"))
        .orderBy(col("lang"), col("source"))),

    // Model-based quality filtering, the fastText-shaped stage (r13): a
    // linear scorer over hashed unigram+bigram features with
    // deterministic md5-derived weights, so the WHOLE model — features,
    // weights, score, keep decision — is engine-reproducible and
    // hash-oracled instead of rows-only. Per-lang keep counts + the
    // integer-exact score sum; see TextAnalysis.qualityClassifier for
    // the kernel and the cross-engine hash contract.
    "llm_quality_classifier" -> ((s, d) =>
      TextAnalysis.qualityClassifier(Tables.documents(s, d))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score_milli") >= 0, lit(1L)).otherwise(lit(0L)))
            .as("n_keep"),
          sum(col("score_milli")).as("sum_score_milli"))
        .orderBy(col("lang"))),

    // Deterministic per-source downsample: top-3 docs per source in
    // md5(text) order — a content-hash shuffle that is reproducible,
    // layout-independent, and portable (both engines compute the same md5
    // hex), unlike rand()-based sampling. The data-mixing primitive: "take
    // N docs per source" with no RNG state to carry. Scale path: the
    // window is partitioned by source, so each source's rows sort locally
    // — no global sort, no driver involvement.
    "llm_sample_per_source" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("text").cast("binary")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("source"), col("rk"), col("doc_id"), col("lang"))
        .orderBy(col("source"), col("rk"))
    }),

    // Sequence packing (training-batch assembly): docs are packed into
    // fixed 512-token context windows in deterministic doc_id order per
    // language — bin = floor(tokens-before-this-doc / 512), the
    // fixed-order streaming-pack semantics (a doc that crosses a boundary
    // belongs to the bin where it starts). The per-lang cumulative token
    // count is Windows.partitionedPrefixSum — a naive
    // Window.partitionBy(lang) puts a whole language on ONE task, and a
    // 100 TB corpus has ~5 of those; the two-pass form stays distributed
    // at any scope size (bucket = 100-doc id ranges here; a production
    // caller sizes buckets to one task's rows).
    "llm_pack_sequences" -> ((s, d) => {
      val budget = 512
      val docs = Tables.documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      Windows.partitionedPrefixSum(docs, col("n_tokens"),
          Seq("lang"), floor(col("doc_id") / 100).cast("long"),
          Seq(col("doc_id")), "cum_before")
        .withColumn("bin", floor(col("cum_before") / (budget * 1.0)))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("sum_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("bin"))
    }),

    // Content-addressed corpus sharding (training-shard writer planning):
    // shard = first hex digit of md5(text) — 16 deterministic,
    // layout-independent shards whose membership survives repartitioning
    // and re-ingestion (identical md5 hex in both engines — see
    // llm_sample_per_source). Per-shard balance stats are what a shard
    // writer needs before committing a layout; the write itself would be
    // partitionBy(shard). One map-side-combinable groupBy.
    "llm_doc_shard" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(substring(md5(col("text").cast("binary")), 1, 1).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("sum_tokens"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))),

    // The dedup MANIFEST (what a 100 TB exact-dedup run publishes): one
    // row per surviving document with its content digest, multiplicity,
    // and byte size — downstream consumers verify membership against the
    // digest without rereading corpora. Digests are computed on the
    // SURVIVOR side after the join (once per distinct text, not per
    // copy); the survivors frame carries only (keep_id, n_copies), so the
    // join back to documents is an id-keyed equi-join Catalyst can
    // broadcast or shuffle as sizes dictate.
    "llm_dedup_manifest" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.exact(docs, "text", "doc_id")
        .join(docs.withColumnRenamed("doc_id", "keep_id"), Seq("keep_id"))
        .select(col("keep_id"),
          sha2(col("text").cast("binary"), 256).as("sha256_hex"),
          col("n_copies"), length(col("text")).cast("long").as("text_chars"),
          col("lang"), col("source"))
        .orderBy(col("keep_id"))
    }),

    // Vocabulary coverage (tokenizer planning): build the deterministic
    // top-500 corpus vocabulary (tf desc, token asc tie-break) and
    // measure per-doc out-of-vocabulary rate, rolled up per lang. The
    // vocab cut is orderBy(...).limit(500) → TakeOrderedAndProject
    // (distributed heap-select, NOT a single-partition global window);
    // the membership join broadcasts the 500-row vocab. OOV ratio is
    // exact integer counts divided once per doc, floor-rounded 4 dp.
    "llm_vocab_coverage" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("token"))
      val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
        .orderBy(desc("tf"), col("token")).limit(500)
        .select(col("token"), lit(1).as("in_vocab"))
      val perDoc = toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov", graft.functions.Rounding.roundTo(
          col("n_oov").cast("double") / col("n_toks").cast("double"), 4))
      perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("oov")).as("min_oov"), max(col("oov")).as("max_oov"),
          sum(when(col("oov") > 0.5, 1L).otherwise(0L)).as("n_high_oov"))
        .orderBy(col("lang"))
    }),

    // Data-health profiling (the first query a pipeline runs on a new
    // corpus drop): per-column row/null/distinct counts in ONE pass —
    // a single aggregate computes every column's stats (Catalyst expands
    // the multi-countDistinct into one Expand+aggregate pipeline, still
    // one scan), then a stack() generator unpivots the 1-row result to
    // one row per column. Exact distincts keep the oracle exact; the
    // 100 TB path swaps approx_count_distinct per column.
    "llm_data_profile" -> ((s, d) => {
      val aggs = count(lit(1)).as("n_rows") +:
        ProfileCols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c")))
      val one = Tables.documents(s, d).agg(aggs.head, aggs.tail: _*)
      val stackExpr = s"stack(${ProfileCols.size}, " +
        ProfileCols.map(c => s"'$c', n_rows - nn_$c, nd_$c").mkString(", ") +
        ") as (col_name, n_null, n_distinct)"
      one.selectExpr("n_rows", stackExpr)
        .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
        .orderBy(col("col_name"))
    }),

    // Mixture-weight resampling (training-mixture assembly): each source
    // is down-sampled to its target weight via content-addressed
    // membership — substr(md5(text),1,8) < per-source threshold (see
    // MixtureWeights). Zero shuffle for the membership decision (pure
    // filter); only the tiny per-source rollup shuffles. At 100 TB this is
    // THE mixture-reweighting pass: deterministic (no RNG state to
    // coordinate across executors), layout-independent, and re-runnable —
    // re-ingesting the corpus reproduces the same sample.
    "llm_mixture_sample" -> ((s, d) => {
      val thr = mixtureThresholdChain
      Tables.documents(s, d)
        .filter(substring(md5(col("text").cast("binary")), 1, 8) < thr)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(size(split(col("text"), " "))).cast("long").as("sum_tokens"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("source"))
    }),

    // The composed BATCH corpus build (VERDICT r14 #4): gate → normalize
    // → exact dedup on NORMALIZED text → mixture resample of the
    // survivor set → sequence packing, in one DAG — the run a curation
    // pipeline actually ships. Pins the cross-stage interactions no
    // standalone key sees (normalization changes digests BEFORE dedup;
    // gated-out docs neither survive nor suppress; weights act on the
    // deduped set). Stage semantics and order are spec-pinned in
    // CorpusBuildSpec; the threshold chain folds over the SAME
    // MixtureWeights Seq as llm_mixture_sample and the twin. See
    // operators/CorpusBuild.scala for the 100 TB shape per stage.
    "llm_corpus_build" -> ((s, d) =>
      CorpusBuild.build(Tables.documents(s, d), mixtureThresholdChain)),

    // Unigram-LM quality scoring (the CCNet-style filter): per-doc mean
    // log-probability (unigramDocScores — the exact-integer-unit kernel)
    // → per-lang score summary with a low-quality count; min/max stand in
    // for cross-doc averages (order-independent doubles).
    "llm_ngram_lm" -> ((s, d) =>
      unigramDocScores(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("score")).as("min_lp"), max(col("score")).as("max_lp"),
          sum(when(col("score") < NgramLmLow, 1L).otherwise(0L)).as("n_low"))
        .orderBy(col("lang"))),

    // CCNet-style head/middle/tail split: per-lang perplexity tertiles of
    // the unigram-LM doc score. The per-lang rank is NOT an ntile window
    // (Window.partitionBy(lang) puts a 100 TB mostly-`en` corpus on one
    // task) — it is Windows.partitionedPrefixSum counting strictly-better
    // (score desc, doc_id) predecessors, bucketed by the 0.1-wide score
    // decade so every stage stays distributed; the tertile is then the
    // closed form floor(rank*3/n), which equals SQL NTILE(3) exactly
    // (for k=3: n=3m+r gives bucket sizes (m+1,m+1,m) / (m+1,m,m) /
    // (m,m,m) for r=2/1/0 on both formulations — the identity the DuckDB
    // NTILE twin leans on; pinned in WindowsSpec against Spark's ntile).
    // At production scale CCNet itself buckets by FIXED cutoffs learned
    // from a sample (map-only); this query is the exact-rank form.
    "llm_ccnet_buckets" -> ((s, d) => {
      // persisted for the same reason as Dedup.persistGrams: the score
      // frame feeds THREE independent subtrees (prefix-sum offsets, the
      // intra-bucket window leg, the per-lang count) whose exchanges all
      // differ — without it the explode+tf-join kernel re-scans the
      // corpus per reference (plan-verified: two BNLJ kernel copies)
      val pd = unigramDocScores(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ranked = Windows.partitionedPrefixSum(
        pd, lit(1L), Seq("lang"),
        floor(-col("score") * 10).cast("long"),
        Seq(col("score").desc, col("doc_id")), "rn0")
      val nLang = pd.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
      // null-safe lang join: a null lang is its own NTILE partition in
      // the oracle; a plain equi-join would silently drop those docs
      ranked.alias("r")
        .join(broadcast(nLang).alias("n"), col("r.lang") <=> col("n.lang"))
        .select(col("r.*"), col("n.__n"))
        .withColumn("__t", (col("rn0") * 3 / col("__n")).cast("long"))
        .withColumn("bucket", when(col("__t") === 0, "head")
          .when(col("__t") === 1, "middle").otherwise("tail"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"),
          sum(floor(col("score") * 10000.0 + lit(0.5)).cast("long"))
            .as("sum_score_4dp"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // DSIR-style importance weights (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): per-doc mean
    // log-likelihood ratio of hashed-unigram features between a TARGET
    // distribution (here the `en` slice) and the RAW corpus — the weight
    // that biases sampling toward target-looking documents. Feature =
    // first 2 hex chars of md5(token) → 256 buckets: the hashed-feature
    // trick that bounds state at 100 TB (vocab-sized tf would not),
    // expressed as a STRING key so both engines bucket identically (no
    // cross-engine integer-hash parity to defend). Laplace +1 smoothing
    // keeps empty buckets finite; per-token ln-ratios are fixed to 1e-6
    // integer units BEFORE the per-doc sum (exact bigint fold — the
    // llm_ngram_lm convention). Plan shape: explode → 256-row bucket
    // distribution (map-side combinable, broadcast back) → per-doc sum
    // (one doc_id shuffle) → (lang, source) rollup. Totals come from an
    // unpartitioned window OVER THE 256-ROW AGGREGATE (fixed-size at any
    // corpus scale, so the single-partition window is safe) — a
    // dist.agg() scalar cross instead would make Catalyst recompute the
    // whole explode+agg lineage for the 1-row frame: a third corpus scan
    // (plan-verified before this form was chosen).
    "llm_dsir_weights" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(split(col("text"), " ")).as("token"))
        .withColumn("bkt", substring(md5(col("token")), 1, 2))
      val dist = toks.groupBy(col("bkt"))
        .agg(count(lit(1)).as("raw_n"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tgt_n"))
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val lr = dist
        .withColumn("raw_tot", sum(col("raw_n")).over(wAll))
        .withColumn("tgt_tot", sum(col("tgt_n")).over(wAll))
        .withColumn("lr_units", floor(
          log(((col("tgt_n") + 1).cast("double") /
               (col("tgt_tot") + 256).cast("double")) /
              ((col("raw_n") + 1).cast("double") /
               (col("raw_tot") + 256).cast("double")))
            * 1000000.0 + lit(0.5)).cast("long"))
        .select(col("bkt"), col("lr_units"))
      toks.join(broadcast(lr), "bkt")
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(sum(col("lr_units")).as("units"), count(lit(1)).as("n"))
        .select(col("lang"), col("source"),
          graft.functions.Rounding.roundTo(
            col("units").cast("double") / 1000000.0 / col("n").cast("double"), 4)
            .as("w"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(floor(col("w") * 10000.0 + lit(0.5)).cast("long"))
            .as("sum_w_4dp"),
          min(col("w")).as("min_w"), max(col("w")).as("max_w"))
        .orderBy(col("lang"), col("source"))
    }),

    // Content-hash stratified sample (layout-independent membership).
    // The MEMBERSHIP is xxhash64-specific (no SQL twin), so the hashed
    // surface is the r12 verdict pattern (VERDICT r11 item 2): exact
    // per-stratum population + `tol_ok` — the realized sample rate must
    // sit within 4σ of its target (σ = √(f(1−f)/n), +1/n slack for the
    // lattice; a fraction-1.0 stratum must sample EXACTLY n). A biased
    // or non-reproducible sampler flips tol_ok → red driver row;
    // reproducibility itself stays unit-asserted in SamplingSpec.
    "llm_sample_stratified" -> ((s, d) => {
      val fr = Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.25, "fr" -> 1.0)
      val docs = Tables.documents(s, d)
      val fCol = fr.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
        when(col("lang") === k, lit(v)).otherwise(acc)
      }
      val sampled = Sampling.stratifiedById(docs, "lang", "doc_id", fr)
        .groupBy(col("lang")).agg(count(lit(1)).as("__ns"))
      // the 1/n lattice slack applies only to FRACTIONAL strata: at
      // f = 1.0 (and f = 0.0) σ is 0 and the membership predicate is
      // deterministic, so the verdict demands EXACTness — a sampler that
      // drops one of n rows at f=1.0 must flip tol_ok (r12 review; the
      // earlier unconditional +1/n let an off-by-one pass)
      val slack = when(fCol > 0.0 && fCol < 1.0,
        lit(4.0) * sqrt(fCol * (lit(1.0) - fCol) / col("n_pop"))
          + lit(1.0) / col("n_pop")).otherwise(lit(0.0))
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_pop"))
        .join(sampled, Seq("lang"), "left")
        .select(col("lang"), col("n_pop"),
          (abs(coalesce(col("__ns"), lit(0L)).cast("double") / col("n_pop")
              - fCol) <= slack)
            .cast("long").as("tol_ok"))
        .orderBy(col("lang"))
    }),

    // Per-label centroids (the k-means/IVF building block, here oracled);
    // map-side-combining + exact integer micro-unit sums — see
    // Similarity.labelCentroids.
    "llm_embed_centroid" -> ((s, d) =>
      Similarity.labelCentroids(Tables.embeddings(s, d), "label")
        .orderBy(col("label"), col("dim"))),

    // int8 quantization error audit per label (float32 → int8 storage
    // planning); exact 1e-12-unit bigint error sums — see
    // Similarity.quantizeError.
    "llm_embed_quantize" -> ((s, d) =>
      Similarity.quantizeError(Tables.embeddings(s, d))
        .orderBy(col("label"))),

    // ---- multimodal ----------------------------------------------------
    // text + vector + metadata in one row (the lakehouse multimodal layout)
    "llm_multimodal_schema" -> ((s, d) =>
      Tables.documents(s, d)
        .join(Tables.embeddings(s, d),
          col("doc_id") === col("vec_id"), "inner")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(col("embedding")).as("dim"),
          graft.functions.Rounding.roundTo(VectorFns.norm(col("embedding")), 4).as("vnorm"))
        .orderBy(col("doc_id"))),

    // binary-column decode via mapPartitions (decoder stub, real plumbing);
    // checksum is a plain byte fold so DuckDB can twin it.
    "llm_multimodal_meta" -> ((s, d) => {
      import s.implicits._
      val m = Multimodal.withMediaColumn(Tables.documents(s, d))
        .select(col("doc_id"), col("media")).as[Multimodal.MediaRow]
      Multimodal.decodeMeta(s, m).toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels"), col("checksum"))
        .orderBy(col("doc_id"))
    }),

    "llm_multimodal_frames" -> ((s, d) =>
      Multimodal.sampleFrames(
        Multimodal.withMediaColumn(Tables.documents(s, d)), 4)
        .select(col("doc_id"), col("frame_idx"), col("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // real feature extraction on the binary column (byte histogram —
    // the per-partition kernel shape of any media feature extractor)
    "llm_multimodal_features" -> ((s, d) => {
      import s.implicits._
      val m = Multimodal.withMediaColumn(Tables.documents(s, d))
        .select(col("doc_id"), col("media")).as[Multimodal.MediaRow]
      Multimodal.byteHistogram(s, m)
        .select(col("doc_id"), col("bin").cast("int").as("bin"), col("n"))
        .orderBy(col("doc_id"), col("bin"))
    })
  )

  /** Shared k-round BPE merge loop behind llm_bpe_merges (the learned
    * merge table) and llm_bpe_encode (the corpus encoded with it).
    * Per round: ONE map-side-combinable pair-count aggregate over the
    * persisted previous round's frame + ONE pure-map greedy fold rewrite;
    * the chosen pair is a driver SCALAR. Returns the final token frame
    * and the (round, pair, pre-merge count) choices. Greedy-safe without
    * a flag: a merge product "A B" is strictly longer than its left
    * element A, so it can never be re-consumed within the same round.
    */
  private def bpeMergeLoop(s: SparkSession, d: String, k: Int)
      : (DataFrame, Seq[(Int, String, Long)]) = {
    import s.implicits._
    // typed kernels, not HOFs: `transform`/`aggregate` lambdas evaluate
    // INTERPRETED per element (the winnowing lesson, EXPLAINS r8) — at
    // ~1M tokens × k rounds the fold form benched 5 s; the per-partition
    // loops below are plain JVM code over the same arrays.
    var toks: org.apache.spark.sql.Dataset[(Long, Array[String])] =
      Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .as[(Long, Array[String])]
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var r = 1
    var exhausted = false
    // exactly ONE round's token cache lives at a time: round r's count
    // action below materializes round r's persist (reading r-1's cache
    // once), after which r-1's copy is dead weight. Rebinding without
    // the unpersist left k corpus-sized deserialized caches resident —
    // at sf100 (~250M tokens/round) that is ~100 GB of Array[String]
    // object graphs, and the r17 decade run measured the LRU thrash as
    // a 1.67 third-decade exponent on what is per-round linear work
    // (434 s; ~0.9/round-linear expected).
    var prevRound: Option[org.apache.spark.sql.Dataset[(Long, Array[String])]] = None
    while (r <= k && !exhausted) {
      // persist: the round's frame feeds both the pair count (action
      // below) and the next round's rewrite; the LAST round's cache
      // lifetime ends with the driver's per-query clearCache
      toks = toks.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val best = toks
        .mapPartitions(_.flatMap { case (_, t) =>
          if (t.length < 2) Iterator.empty
          else (0 until t.length - 1).iterator.map(i => (t(i), t(i + 1)))
        })
        .toDF("t1", "t2")
        .groupBy(col("t1"), col("t2"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pair", concat(col("t1"), lit(" "), col("t2")))
        // t1 tiebreak: two distinct (t1,t2) splits can concat to the
        // SAME pair string once merged tokens contain spaces
        .orderBy(desc("n"), col("pair"), col("t1"))
        .limit(1).collect()
      // this round's cache is fully materialized by the action above —
      // release the previous round's now
      prevRound.foreach(_.unpersist())
      prevRound = Some(toks)
      if (best.isEmpty) exhausted = true
      else {
        val a = best(0).getAs[String]("t1"); val b = best(0).getAs[String]("t2")
        val n = best(0).getAs[Long]("n")
        chosen += ((r, a + " " + b, n))
        val merged = a + " " + b
        // left-to-right greedy rewrite: consume (a, b) pairs skipping 2,
        // copy everything else — a merge product is strictly longer than
        // `a`, so it can never be re-consumed within this round
        toks = toks.map { case (id, t) =>
          if (t.length < 2) (id, t)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](t.length)
            var i = 0
            while (i < t.length) {
              if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
                out += merged; i += 2
              } else { out += t(i); i += 1 }
            }
            (id, out.toArray)
          }
        }
      }
      r += 1
    }
    (toks.toDF("doc_id", "toks"), chosen.toSeq)
  }

  /** DuckDB twin of llm_bpe_merges: the k rounds unrolled as CTE blocks.
    * Round r derives from token table s{r-1}(doc_id, pos, tok):
    * `p` = adjacent-pair counts, `b` = the deterministic best (count
    * DESC, concatenated pair ASC, t1 ASC — the t1 tiebreak matters once
    * merged tokens contain spaces and two splits concat identically),
    * `m` = positions matching (t1, t2), `w` = the greedy winners — the
    * EVEN offsets within each run of consecutive match positions, which
    * is exactly the left-to-right greedy non-overlapping selection — and
    * `s{r}` = the rewrite: winners become the merged token, the consumed
    * following position drops (it can never itself be a winner), and
    * positions renumber.
    */
  private def bpeCteChain(k: Int): String = {
    val rounds = (1 to k).map { r =>
      val prev = s"s${r - 1}"
      s"""p$r AS MATERIALIZED (
           SELECT a.tok AS t1, c.tok AS t2, count(*) AS n
           FROM $prev a JOIN $prev c
             ON c.doc_id = a.doc_id AND c.pos = a.pos + 1
           GROUP BY 1, 2),
         b$r AS MATERIALIZED (
           SELECT t1, t2, t1 || ' ' || t2 AS pair, n FROM p$r
           ORDER BY n DESC, t1 || ' ' || t2, t1 LIMIT 1),
         m$r AS MATERIALIZED (
           SELECT a.doc_id, a.pos
           FROM $prev a JOIN $prev c
             ON c.doc_id = a.doc_id AND c.pos = a.pos + 1, b$r b
           WHERE a.tok = b.t1 AND c.tok = b.t2),
         w$r AS MATERIALIZED (
           SELECT doc_id, pos FROM (
             SELECT doc_id, pos,
                    row_number() OVER (PARTITION BY doc_id, grp ORDER BY pos)
                      - 1 AS off
             FROM (SELECT doc_id, pos,
                          pos - row_number() OVER (PARTITION BY doc_id
                            ORDER BY pos) AS grp
                   FROM m$r))
           WHERE off % 2 = 0),
         s$r AS MATERIALIZED (
           SELECT t.doc_id,
                  row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos)
                    AS pos,
                  CASE WHEN w.pos IS NOT NULL THEN (SELECT pair FROM b$r)
                       ELSE t.tok END AS tok
           FROM $prev t
           LEFT JOIN w$r w ON w.doc_id = t.doc_id AND w.pos = t.pos
           LEFT JOIN w$r v ON v.doc_id = t.doc_id AND v.pos = t.pos - 1
           WHERE v.pos IS NULL)"""
    }.mkString(",\n         ")
    s"""WITH t0 AS MATERIALIZED (
           SELECT doc_id, string_split(text, ' ') AS tk
           FROM documents
           WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
         s0 AS MATERIALIZED (
           SELECT doc_id, i AS pos, tk[i] AS tok
           FROM t0, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) u),
         $rounds
         """
  }

  private def bpeMergesOracle(k: Int): String = {
    val sel = (1 to k).map(r =>
      s"SELECT CAST($r AS INT) AS round, pair, CAST(n AS BIGINT) AS n FROM b$r")
      .mkString("\n           UNION ALL\n           ")
    bpeCteChain(k) + s"SELECT * FROM ($sel) ORDER BY round"
  }

  /** Encode twin: per-doc token count over the FINAL round's token table;
    * a merged token is exactly one containing a space (source tokens come
    * from a space split and can never contain one).
    */
  private def bpeEncodeOracle(k: Int): String =
    bpeCteChain(k) +
      s"""SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
                CAST(count(CASE WHEN tok LIKE '% %' THEN 1 END) AS INT)
                  AS n_merged_tokens
         FROM s$k GROUP BY doc_id ORDER BY doc_id"""

  val oracle: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",

    // bit-exact SimHash twin: token hash = md5_number_upper (first 8
    // digest bytes little-endian, matching the kernel), sign-summed per
    // bit over DISTINCT tokens; bit 63 folded in as the sign bit so the
    // result is the same signed BIGINT Spark writes. Docs with NULL text
    // have no tokens → fingerprint 0 (left join + coalesce).
    "llm_dedup_simhash" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents WHERE text IS NOT NULL
         ),
         bits AS (
           SELECT doc_id, r.b AS b,
                  CASE WHEN sum(CASE WHEN (md5_number_upper(tok) >> r.b) & 1 = 1
                                     THEN 1 ELSE -1 END) > 0
                       THEN 1 ELSE 0 END AS bit
           FROM toks CROSS JOIN range(64) r(b)
           GROUP BY doc_id, r.b
         ),
         fp AS (
           SELECT doc_id,
                  CAST(sum(CASE WHEN b < 63 THEN bit * (1::BIGINT << b)
                                ELSE 0 END) AS BIGINT)
                  + CASE WHEN max(CASE WHEN b = 63 THEN bit ELSE 0 END) = 1
                         THEN -9223372036854775807 - 1 ELSE 0 END AS simhash
           FROM bits GROUP BY doc_id
         )
         SELECT d.doc_id, CAST(coalesce(f.simhash, 0) AS BIGINT) AS simhash
         FROM documents d LEFT JOIN fp f ON d.doc_id = f.doc_id
         ORDER BY d.doc_id""",

    // exact corpus-global 3-shingle Jaccard pairs (same gram construction
    // as llm_dedup_ngram's oracle, NO blocking) → per-doc degree + max;
    // the verdict column is literal TRUE — the Spark side computes the
    // real LSH band recall there, so a recall drop reddens the row
    "llm_dedup_fuzzy" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         g AS (SELECT doc_id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS grams
               FROM t),
         p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 len(list_intersect(a.grams, b.grams))::DOUBLE /
                 len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE AS j
               FROM g a JOIN g b ON a.doc_id < b.doc_id),
         e AS (SELECT * FROM p WHERE j >= 0.5),
         deg AS (SELECT doc_id, count(*) AS n_near_dups, max(j) AS mx
                 FROM (SELECT a_id AS doc_id, j FROM e
                       UNION ALL SELECT b_id AS doc_id, j FROM e)
                 GROUP BY doc_id)
         SELECT d.doc_id,
                CAST(coalesce(deg.n_near_dups, 0) AS BIGINT) AS n_near_dups,
                coalesce(floor(deg.mx * 10000.0 + 0.5) / 10000.0, 0.0) AS max_jaccard,
                CAST(1 AS BIGINT) AS lsh_recall_ok
         FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id
         ORDER BY d.doc_id""",

    // same exact pair set → recursive-CTE connected components → drop
    // non-min members → per-lang survivor stats (the llm_dedup_keep
    // oracle shape); verdict literal TRUE as above
    "llm_dedup_fuzzy_keep" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         g AS (SELECT doc_id,
                 list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS grams
               FROM t),
         p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
               FROM g a JOIN g b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
                     len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE >= 0.5),
         edges AS (SELECT a_id AS a, b_id AS b FROM p
                   UNION SELECT b_id, a_id FROM p),
         reach AS (SELECT a AS id, a AS lab FROM edges
                   UNION
                   SELECT eg.a, r.lab FROM edges eg JOIN reach r ON r.id = eg.b),
         dropped AS (SELECT id FROM reach GROUP BY id HAVING id != min(lab))
         SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(n_chars) AS BIGINT) AS kept_chars,
                CAST(1 AS BIGINT) AS lsh_pipeline_ok
         FROM documents WHERE doc_id NOT IN (SELECT id FROM dropped)
         GROUP BY lang ORDER BY lang NULLS FIRST""",

    "llm_dedup_ngram" ->
      """WITH g AS (
           SELECT doc_id, lang, source, CAST(floor(n_chars / 100) AS BIGINT) AS len_bkt,
                  list_distinct([array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS grams
           FROM (SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS toks
                 FROM documents)
         )
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                floor(len(list_intersect(a.grams, b.grams))::DOUBLE /
                      len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE
                      * 10000.0 + 0.5) / 10000.0 AS jaccard
         FROM g a JOIN g b
           ON a.lang = b.lang AND a.source = b.source AND a.len_bkt = b.len_bkt
          AND a.doc_id < b.doc_id
         WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
               len(list_distinct(list_concat(a.grams, b.grams)))::DOUBLE >= 0.2
         ORDER BY a_id, b_id""",

    // gram strings here vs FNV-hashed grams in the kernel: only the
    // COUNTS |A∩B|, |A|, |B| are compared, identical absent a 64-bit
    // collision (same contract as llm_dedup_ngram's oracle)
    "llm_dedup_containment" ->
      """WITH g AS (
           SELECT doc_id, lang, source,
                  list_distinct([array_to_string(toks[i:i+1], ' ')
                                 for i in range(1, greatest(len(toks) - 1, 1) + 1)]) AS grams
           FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
                 FROM documents)
         )
         SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                floor(len(list_intersect(a.grams, b.grams))::DOUBLE /
                      least(len(a.grams), len(b.grams))::DOUBLE
                      * 10000.0 + 0.5) / 10000.0 AS containment
         FROM g a JOIN g b
           ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
               least(len(a.grams), len(b.grams))::DOUBLE >= 0.2
         ORDER BY a_id, b_id""",

    // chunk = consecutive 10-token window (last chunk short); a chunk is
    // duplicated when its text occurs elsewhere in the corpus
    "llm_dedup_lines" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL AND length(text) > 0),
         c AS (
           SELECT doc_id,
                  array_to_string(toks[(i-1)*10+1 : least(i*10, len(toks))], ' ') AS chunk
           FROM t, LATERAL (SELECT unnest(generate_series(1,
                  CAST(ceil(len(toks)/10.0) AS BIGINT))) AS i) u
         ),
         m AS (SELECT doc_id, chunk, count(*) OVER (PARTITION BY chunk) AS mult FROM c)
         SELECT doc_id, CAST(count(*) AS INT) AS n_chunks,
                CAST(count(CASE WHEN mult > 1 THEN 1 END) AS INT) AS n_dup_chunks,
                floor(count(CASE WHEN mult > 1 THEN 1 END) * 10000.0 / count(*) + 0.5)
                  / 10000.0 AS dup_ratio
         FROM m GROUP BY doc_id ORDER BY doc_id""",

    // positions are 1-based here vs 0-based in the kernel — only the
    // covered-position COUNT is compared, identical under any base
    "llm_dedup_substring" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         g AS (
           SELECT doc_id, i AS pos, array_to_string(toks[i : i+4], ' ') AS gram
           FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-4)) AS i) u
         ),
         m AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS mult FROM g),
         cov AS (
           SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS n_cov
           FROM m, LATERAL (SELECT unnest(generate_series(pos, pos+4)) AS p) v
           WHERE mult > 1 GROUP BY doc_id
         )
         SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
                CAST(coalesce(cov.n_cov, 0) AS BIGINT) AS n_cov,
                floor(coalesce(cov.n_cov, 0) * 10000.0 / len(t.toks) + 0.5)
                  / 10000.0 AS cov_ratio
         FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
         ORDER BY t.doc_id""",

    // probe set = doc_id < 5; empty generate_series range for docs
    // shorter than 4 tokens mirrors the kernel's withPartial(false)
    "llm_contamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL AND length(text) > 0),
         g AS (
           SELECT doc_id, array_to_string(toks[i : i+3], ' ') AS gram
           FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks)-3)) AS i) u
         ),
         probe AS (SELECT DISTINCT gram FROM g WHERE doc_id < 5),
         hits AS (SELECT g.doc_id, g.gram FROM g JOIN probe USING (gram)
                  WHERE g.doc_id >= 5)
         SELECT doc_id, CAST(count(DISTINCT gram) AS INT) AS n_hit_grams,
                CAST(count(*) AS INT) AS n_hits
         FROM hits GROUP BY doc_id ORDER BY doc_id""",

    "llm_dedup_embed" ->
      s"""WITH e AS (
           SELECT vec_id, label, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm,
                  $dedupBlkSql AS blk
           FROM embeddings
         ), p AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                  floor(list_sum(list_transform(range(1, 65),
                          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                        (a.nrm * b.nrm) * 10000.0 + 0.5) / 10000.0 AS sim
           FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
           WHERE list_sum(list_transform(range(1, 65),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                 (a.nrm * b.nrm) >= $DedupThreshold
         )
         SELECT b_id AS drop_id, a_id AS keep_id, sim
         FROM (SELECT *, row_number() OVER (PARTITION BY b_id
                                            ORDER BY sim DESC, a_id) AS rn FROM p)
         WHERE rn = 1 ORDER BY drop_id""",

    "llm_dedup_clusters" ->
      s"""WITH RECURSIVE e AS (
           SELECT vec_id, label, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm,
                  $dedupBlkSql AS blk
           FROM embeddings
         ), p AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
           WHERE list_sum(list_transform(range(1, 65),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                 (a.nrm * b.nrm) >= $DedupThreshold
         ), edges AS (
           SELECT a_id AS a, b_id AS b FROM p
           UNION SELECT b_id, a_id FROM p
         ), reach AS (
           SELECT a AS id, a AS lab FROM edges
           UNION
           SELECT eg.a, r.lab FROM edges eg JOIN reach r ON r.id = eg.b
         )
         SELECT id, CAST(min(lab) AS BIGINT) AS cluster_id
         FROM reach GROUP BY id ORDER BY id""",

    "llm_cluster_stats" ->
      s"""WITH RECURSIVE e AS (
           SELECT vec_id, label, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm,
                  $dedupBlkSql AS blk
           FROM embeddings
         ), p AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
           WHERE list_sum(list_transform(range(1, 65),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                 (a.nrm * b.nrm) >= $DedupThreshold
         ), edges AS (
           SELECT a_id AS a, b_id AS b FROM p
           UNION SELECT b_id, a_id FROM p
         ), reach AS (
           SELECT a AS id, a AS lab FROM edges
           UNION
           SELECT eg.a, r.lab FROM edges eg JOIN reach r ON r.id = eg.b
         ), cc AS (
           SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id
         ), bs AS (
           SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz FROM cc
           GROUP BY cluster_id
         ), hist AS (
           SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
           FROM bs GROUP BY sz
           UNION ALL
           SELECT CAST(1 AS BIGINT),
                  (SELECT count(*) FROM embeddings) - (SELECT count(*) FROM cc)
         )
         SELECT cluster_size, n_clusters,
                cluster_size * n_clusters AS n_docs,
                (cluster_size - 1) * n_clusters AS n_dropped
         FROM hist ORDER BY cluster_size""",

    "llm_dedup_keep" ->
      s"""WITH RECURSIVE e AS (
           SELECT vec_id, label, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm,
                  $dedupBlkSql AS blk
           FROM embeddings
         ), p AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
           WHERE list_sum(list_transform(range(1, 65),
                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                 (a.nrm * b.nrm) >= $DedupThreshold
         ), edges AS (
           SELECT a_id AS a, b_id AS b FROM p
           UNION SELECT b_id, a_id FROM p
         ), reach AS (
           SELECT a AS id, a AS lab FROM edges
           UNION
           SELECT eg.a, r.lab FROM edges eg JOIN reach r ON r.id = eg.b
         ), dropped AS (
           SELECT id FROM reach GROUP BY id HAVING id != min(lab)
         )
         SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(n_chars) AS BIGINT) AS kept_chars
         FROM documents WHERE doc_id NOT IN (SELECT id FROM dropped)
         GROUP BY lang ORDER BY lang NULLS FIRST""",

    "llm_similarity_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
         SELECT vec_id,
                floor(
                  list_sum(list_transform(range(1, 65),
                    i -> embedding[i]::DOUBLE * qv[i]::DOUBLE)) /
                  (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) *
                   sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))))
                  * 10000.0 + 0.5) / 10000.0 AS sim
         FROM embeddings, q WHERE vec_id <> 1
         ORDER BY sim DESC, vec_id LIMIT 10""",

    // exact brute-force top-k (the hashable half) + the Spark-side IVF
    // recall verdict — see the query's comment
    "llm_similarity_ivf" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
         SELECT vec_id,
                floor(
                  list_sum(list_transform(range(1, 65),
                    i -> embedding[i]::DOUBLE * qv[i]::DOUBLE)) /
                  (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) *
                   sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE))))
                  * 10000.0 + 0.5) / 10000.0 AS sim,
                CAST(1 AS BIGINT) AS recall_ok
         FROM embeddings, q WHERE vec_id <> 1
         ORDER BY sim DESC, vec_id LIMIT 10""",

    "llm_similarity_join" ->
      """WITH e AS (
           SELECT vec_id, label, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
           FROM embeddings
         )
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                floor(list_sum(list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                      (a.nrm * b.nrm) * 10000.0 + 0.5) / 10000.0 AS sim
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_sum(list_transform(range(1, 65),
                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
               (a.nrm * b.nrm) >= 0.2
         ORDER BY a_id, b_id""",

    // identical twin SQL: at oracle scale the ANN join's unit-scale
    // contract makes it the exact all-pairs join, so the same oracle
    // pins both the values and the contract (see the query's comment)
    "llm_similarity_ann_join" ->
      """WITH e AS (
           SELECT vec_id, label, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
           FROM embeddings
         )
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                floor(list_sum(list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                      (a.nrm * b.nrm) * 10000.0 + 0.5) / 10000.0 AS sim
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_sum(list_transform(range(1, 65),
                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
               (a.nrm * b.nrm) >= 0.2
         ORDER BY a_id, b_id""",

    "llm_similarity_lsh" ->
      s"""WITH e AS (
           SELECT vec_id, embedding,
                  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm,
                  $lshBlkSql AS blk
           FROM embeddings
         )
         SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                floor(list_sum(list_transform(range(1, 65),
                        i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
                      (a.nrm * b.nrm) * 10000.0 + 0.5) / 10000.0 AS sim
         FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id
         WHERE list_sum(list_transform(range(1, 65),
                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
               (a.nrm * b.nrm) >= 0.2
         ORDER BY a_id, b_id""",

    "llm_text_stats" ->
      """WITH toks AS (
           SELECT lang, doc_id, unnest(string_split(text, ' ')) AS token FROM documents
         ), per_lang AS (
           SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                  CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(count(DISTINCT token) AS BIGINT) AS vocab
           FROM toks GROUP BY lang
         ), chars AS (
           SELECT lang, floor(avg(n_chars) * 100.0 + 0.5) / 100.0 AS avg_chars
           FROM documents GROUP BY lang
         )
         SELECT per_lang.lang, n_docs, n_tokens, vocab, avg_chars
         FROM per_lang JOIN chars USING (lang) ORDER BY lang""",

    "llm_text_langid" ->
      """SELECT doc_id,
                CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to','in','is'))) AS INT) AS en_hits,
                CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('el','la','de','que','y','en','un'))) AS INT) AS es_hits,
                CAST(len(list_filter(string_split(text, ' '),
                  t -> t IN ('der','die','das','und','ist','ein','zu'))) AS INT) AS de_hits,
                CASE
                  WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','to','in','is'))) = 0
                   AND len(list_filter(string_split(text, ' '), t -> t IN ('el','la','de','que','y','en','un'))) = 0
                   AND len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist','ein','zu'))) = 0
                    THEN 'unknown'
                  WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','to','in','is')))
                       >= len(list_filter(string_split(text, ' '), t -> t IN ('el','la','de','que','y','en','un')))
                   AND len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','to','in','is')))
                       >= len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist','ein','zu')))
                    THEN 'en'
                  WHEN len(list_filter(string_split(text, ' '), t -> t IN ('el','la','de','que','y','en','un')))
                       >= len(list_filter(string_split(text, ' '), t -> t IN ('der','die','das','und','ist','ein','zu')))
                    THEN 'es'
                  ELSE 'de'
                END AS predicted_lang
         FROM documents ORDER BY doc_id""",

    "llm_text_quality" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                floor(length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE /
                      len(string_split(text, ' '))::DOUBLE * 100.0 + 0.5) / 100.0 AS avg_tok_len,
                floor(len(list_filter(string_split(text, ' '),
                        t -> t IN ('the','a','of','and','to','in','is')))::DOUBLE /
                      len(string_split(text, ' '))::DOUBLE * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
                floor(length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE /
                      nullif(length(text), 0)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS alpha_ratio,
                floor((least(len(string_split(text, ' '))::DOUBLE / 50.0, 1.0) * 0.5 +
                      (len(list_filter(string_split(text, ' '),
                         t -> t IN ('the','a','of','and','to','in','is')))::DOUBLE /
                       len(string_split(text, ' '))::DOUBLE) * 0.5) * 10000.0 + 0.5) / 10000.0 AS quality
         FROM documents ORDER BY doc_id""",

    "llm_text_tokens" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpe_tokens
         FROM documents ORDER BY doc_id""",

    "llm_text_fingerprint" ->
      """SELECT doc_id,
                CASE WHEN text IS NULL THEN NULL
                     ELSE CAST(coalesce(list_sum(list_transform(range(1, length(text) + 1),
                       i -> ascii(text[i]) * ((i - 1) % 64 + 1))), 0) AS BIGINT)
                END AS fingerprint,
                CAST(length(text) AS INT) AS n_chars_obs
         FROM documents ORDER BY doc_id""",

    "llm_text_normalize" ->
      """SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                    ' +', ' ', 'g')) AS norm_text,
                CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                                ' +', ' ', 'g'))) AS INT) AS n_norm_chars
         FROM documents ORDER BY doc_id""",

    "llm_text_repetition" ->
      """WITH g AS (
           SELECT doc_id, coalesce(len(toks), 0) AS nt,
                  [toks[i] || ' ' || toks[i + 1] for i in range(1, len(toks))] AS grams
           FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         )
         SELECT doc_id, CAST(greatest(nt - 1, 0) AS INT) AS n_grams,
                CASE WHEN nt > 1
                     THEN floor((1.0 - len(list_distinct(grams))::DOUBLE /
                                       len(grams)::DOUBLE) * 10000.0 + 0.5) / 10000.0
                     ELSE 0.0 END AS rep_ratio
         FROM g ORDER BY doc_id""",

    "llm_text_topterms" ->
      """WITH toks AS (
           SELECT lang, unnest(string_split(text, ' ')) AS token
           FROM documents WHERE lang IS NOT NULL
         ), tf AS (
           SELECT lang, token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
         ), dfq AS (
           SELECT token, count(DISTINCT lang) AS df FROM toks GROUP BY 1
         ), nl AS (
           SELECT count(DISTINCT lang) AS nl FROM documents
         ), scored AS (
           SELECT lang, token,
                  floor(tf * ln(nl::DOUBLE / df::DOUBLE) * 10000.0 + 0.5) / 10000.0 AS score
           FROM tf JOIN dfq USING (token) CROSS JOIN nl
         )
         SELECT lang, CAST(rnk AS INT) AS rnk, token, score
         FROM (SELECT lang, token, score,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY score DESC, token) AS rnk
               FROM scored)
         WHERE rnk <= 5 ORDER BY lang, rnk""",

    "llm_quality_filter" ->
      s"""WITH f AS (
           SELECT doc_id, lang, source,
                  len(string_split(text, ' ')) AS n_tokens,
                  $qualitySql AS quality,
                  $predictedLangSql AS predicted_lang
           FROM documents
         )
         SELECT lang, source, CAST(count(*) AS BIGINT) AS n_kept,
                min(quality) AS min_q, max(quality) AS max_q
         FROM f
         WHERE quality >= $QualityMin AND predicted_lang = lang
           AND n_tokens BETWEEN $QualityTokMin AND $QualityTokMax
         GROUP BY lang, source
         ORDER BY lang NULLS FIRST, source NULLS FIRST""",

    // the full linear model replayed in SQL: same tokenization
    // (string_split keeps empties), same raw-order unigram+bigram
    // feature union, same md5-derived weights ((md5_number_upper >> 1)
    // keeps the modulus operand non-negative in both engines), same
    // integer-exact floor/keep arithmetic
    "llm_quality_classifier" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
                    FROM documents WHERE text IS NOT NULL),
         f AS (SELECT doc_id, lang,
                 list_distinct(list_concat(toks,
                   [array_to_string(toks[i:i+1], ' ')
                    for i in range(1, greatest(len(toks) - 1, 0) + 1)]))
                   AS feats
               FROM t),
         s AS (SELECT doc_id, lang,
                 CAST(floor(1000.0 * list_sum(list_transform(feats,
                        ft -> CAST(md5_number_upper(ft) >> 1 AS BIGINT)
                              % 2001 - 1000))
                      / len(feats)) AS BIGINT) AS score_milli
               FROM f)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN score_milli >= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_keep,
                CAST(sum(score_milli) AS BIGINT) AS sum_score_milli
         FROM s GROUP BY lang ORDER BY lang NULLS FIRST""",

    // Gopher-rule flags single-sourced from TextAnalysis's thresholds and
    // stop list; coalesce(..., FALSE) mirrors the Spark side's null-text
    // handling (NULL comparisons fail every rule in both engines).
    "llm_gopher_rules" ->
      s"""WITH f AS (
           SELECT coalesce(len(string_split(text, ' '))
                    BETWEEN ${TextAnalysis.GopherMinTokens}
                        AND ${TextAnalysis.GopherMaxTokens}, FALSE) AS okw,
                  coalesce(length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
                           / len(string_split(text, ' '))::DOUBLE
                    BETWEEN ${TextAnalysis.GopherMinMeanLen}
                        AND ${TextAnalysis.GopherMaxMeanLen}, FALSE) AS okm,
                  coalesce(${hitsSql(TextAnalysis.StopEn)} >=
                    ${TextAnalysis.GopherMinStopHits}, FALSE) AS oks
           FROM documents
         ), a AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN okw THEN 1 ELSE 0 END) AS BIGINT) AS wc,
                  CAST(sum(CASE WHEN okm THEN 1 ELSE 0 END) AS BIGINT) AS mwl,
                  CAST(sum(CASE WHEN oks THEN 1 ELSE 0 END) AS BIGINT) AS stop,
                  CAST(sum(CASE WHEN okw AND okm AND oks THEN 1 ELSE 0 END)
                    AS BIGINT) AS all_ok
           FROM f
         )
         SELECT 'all_rules' AS rule, all_ok AS n_pass, n - all_ok AS n_fail FROM a
         UNION ALL SELECT 'mean_word_len', mwl, n - mwl FROM a
         UNION ALL SELECT 'stop_hits', stop, n - stop FROM a
         UNION ALL SELECT 'word_count', wc, n - wc FROM a
         ORDER BY rule""",

    // PII patterns interpolated from the SAME Scala constants the Spark
    // expressions compile (TextAnalysis.Pii*) — RE2/Java-regex-portable
    // syntax only, so the engines cannot drift. 'g' flags: DuckDB
    // regexp_replace is first-match-only by default, Spark's is global.
    "llm_pii_scrub" ->
      s"""WITH p AS (
           SELECT lang,
                  len(regexp_extract_all(text, '${TextAnalysis.PiiEmail}')) AS ne,
                  len(regexp_extract_all(text, '${TextAnalysis.PiiIpv4}')) AS ni,
                  len(regexp_extract_all(text, '${TextAnalysis.PiiPhone}')) AS np,
                  length(text) - length(regexp_replace(regexp_replace(regexp_replace(
                    text,
                    '${TextAnalysis.PiiIpv4}', '<IP>', 'g'),
                    '${TextAnalysis.PiiEmail}', '<EMAIL>', 'g'),
                    '${TextAnalysis.PiiPhone}', '<PHONE>', 'g')) AS removed
           FROM documents
         )
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_docs_with_pii,
                CAST(sum(ne) AS BIGINT) AS emails,
                CAST(sum(ni) AS BIGINT) AS ips,
                CAST(sum(np) AS BIGINT) AS phones,
                CAST(sum(removed) AS BIGINT) AS chars_removed
         FROM p GROUP BY lang ORDER BY lang NULLS FIRST""",

    // chunk starts: range(0, n, stride) == Spark's sequence(0, n-1, stride)
    "llm_chunk_stride" ->
      """WITH t AS (
           SELECT lang, len(string_split(text, ' ')) AS n
           FROM documents WHERE text IS NOT NULL
         ), c AS (
           SELECT lang, n, unnest(range(0, n, 24)) AS s FROM t
         ), ct AS (
           SELECT lang, least(32, n - s) AS chunk_tokens FROM c
         )
         SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
                CAST(sum(CASE WHEN chunk_tokens = 32 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_full,
                CAST(sum(chunk_tokens) AS BIGINT) AS sum_tokens,
                floor(CAST(sum(chunk_tokens) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) * 100.0 + 0.5) / 100.0
                  AS avg_tokens
         FROM ct GROUP BY lang ORDER BY lang NULLS FIRST""",

    // range(1, len) is empty for len < 2 — the same no-pair semantics as
    // the Spark side's size >= 2 guard; tk[] is 1-based in DuckDB.
    "llm_bpe_pairs" ->
      """WITH t AS (
           SELECT string_split(text, ' ') AS tk
           FROM documents WHERE text IS NOT NULL
         ), p AS (
           SELECT unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])
             AS pair
           FROM t
         )
         SELECT pair, CAST(count(*) AS BIGINT) AS n
         FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""",

    "llm_bpe_merges" -> bpeMergesOracle(BpeMergeRounds),

    "llm_bpe_encode" -> bpeEncodeOracle(BpeMergeRounds),

    // exact by the two-pass construction (candidates ⊇ true top-40 while
    // the margin asserted in HeavyHittersSpec holds), so the twin is the
    // plain exact top-40 — same gram kernel as llm_bpe_pairs
    "llm_heavy_hitters" ->
      """WITH t AS (
           SELECT string_split(text, ' ') AS tk
           FROM documents WHERE text IS NOT NULL
         ), p AS (
           SELECT unnest([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])
             AS gram
           FROM t
         )
         SELECT gram, CAST(count(*) AS BIGINT) AS n
         FROM p GROUP BY gram ORDER BY n DESC, gram LIMIT 40""",

    // per-term 1e-6-unit bigints (ngram_lm convention); the list
    // comprehension folds in array order, same as Spark's aggregate HOF.
    "llm_token_entropy" ->
      """WITH t AS (
           SELECT lang, string_split(text, ' ') AS tk,
                  len(string_split(text, ' ')) AS n
           FROM documents WHERE text IS NOT NULL
         ), e AS (
           SELECT lang,
                  list_sum([CAST(floor(
                      len(list_filter(tk, x -> x = t))::DOUBLE / n
                      * ln(n::DOUBLE / len(list_filter(tk, x -> x = t)))
                      * 1000000.0 + 0.5) AS BIGINT)
                    FOR t IN list_distinct(tk)]) AS ent_units
           FROM t
         )
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(ent_units) AS BIGINT) AS sum_units,
                floor(CAST(sum(ent_units) AS DOUBLE) / count(*) / 1000000.0
                      * 10000.0 + 0.5) / 10000.0 AS avg_entropy
         FROM e GROUP BY lang ORDER BY lang NULLS FIRST""",

    "llm_zipf_fit" ->
      """WITH tok AS (
           SELECT unnest(string_split(text, ' ')) AS token
           FROM documents WHERE text IS NOT NULL
         ), c AS (
           SELECT token, count(*) AS tf FROM tok GROUP BY token
           ORDER BY tf DESC, token LIMIT 100
         ), r AS (
           SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS rnk
           FROM c
         )
         SELECT CAST(count(*) AS BIGINT) AS n,
                floor(regr_slope(ln(tf::DOUBLE), ln(rnk::DOUBLE))
                      * 10000.0 + 0.5) / 10000.0 AS slope,
                floor(regr_intercept(ln(tf::DOUBLE), ln(rnk::DOUBLE))
                      * 10000.0 + 0.5) / 10000.0 AS icept,
                floor(regr_r2(ln(tf::DOUBLE), ln(rnk::DOUBLE))
                      * 10000.0 + 0.5) / 10000.0 AS r2
         FROM r""",

    // list slicing grams[j : j+3] is 1-based INCLUSIVE (4-gram window);
    // range(1, len-2) is empty below 1 window — same n >= 6 token floor
    // as the Spark side's explicit filter.
    "llm_winnow_fingerprint" ->
      """WITH t AS (
           SELECT lang, string_split(text, ' ') AS tk
           FROM documents WHERE text IS NOT NULL
         ), g AS (
           SELECT lang,
                  [md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                   FOR i IN range(1, len(tk) - 1)] AS grams
           FROM t
         ), w AS (
           SELECT lang,
                  list_distinct([list_min(grams[j : j+3])
                                 FOR j IN range(1, len(grams) - 2)]) AS fps
           FROM g
         ), f AS (
           SELECT lang, unnest(fps) AS fp FROM w
         )
         SELECT lang, CAST(count(*) AS BIGINT) AS n_fp,
                CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp
         FROM f GROUP BY lang ORDER BY lang NULLS FIRST""",

    "llm_pack_sequences" ->
      """WITH t AS (
           SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents
         ), c AS (
           SELECT lang, doc_id, n_tokens,
                  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM t
         )
         SELECT lang, CAST(floor(cum_before / 512.0) AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                min(doc_id) AS first_doc
         FROM c GROUP BY lang, bin ORDER BY lang NULLS FIRST, bin""",

    "llm_sample_per_source" ->
      """SELECT source, CAST(rk AS INT) AS rk, doc_id, lang
         FROM (SELECT source, doc_id, lang,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY md5(text) NULLS FIRST, doc_id) AS rk
               FROM documents)
         WHERE rk <= 3 ORDER BY source NULLS FIRST, rk""",

    // the sample membership is xxhash64-specific; the hashed surface is
    // the exact per-stratum population + the Spark-side 4σ rate verdict
    "llm_sample_stratified" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_pop,
                CAST(1 AS BIGINT) AS tol_ok
         FROM documents GROUP BY lang ORDER BY lang NULLS FIRST""",

    "llm_doc_shard" ->
      """SELECT substr(md5(text), 1, 1) AS shard,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM documents GROUP BY shard ORDER BY shard NULLS FIRST""",

    "llm_dedup_manifest" ->
      """WITH g AS (
           SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
           FROM documents GROUP BY text
         )
         SELECT keep_id, sha256(text) AS sha256_hex, n_copies,
                CAST(length(text) AS BIGINT) AS text_chars, lang, source
         FROM g JOIN documents ON keep_id = doc_id
         ORDER BY keep_id""",

    "llm_vocab_coverage" ->
      """WITH toks AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
           FROM documents
         ), vocab AS (
           SELECT token FROM (
             SELECT token, count(*) AS tf FROM toks GROUP BY 1
           ) ORDER BY tf DESC, token LIMIT 500
         ), pd AS (
           SELECT t.doc_id, t.lang,
                  floor(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS oov
           FROM toks t LEFT JOIN vocab v ON t.token = v.token
           GROUP BY t.doc_id, t.lang
         )
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                min(oov) AS min_oov, max(oov) AS max_oov,
                CAST(sum(CASE WHEN oov > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_oov
         FROM pd GROUP BY lang ORDER BY lang NULLS FIRST""",

    // generated from the same ProfileCols Seq as the Spark side
    "llm_data_profile" -> {
      val aggsSql = ProfileCols.map(c =>
        s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c").mkString(", ")
      val rowsSql = ProfileCols.map(c =>
        s"SELECT '$c' AS col_name, n_rows, n_rows - nn_$c AS n_null, " +
          s"CAST(nd_$c AS BIGINT) AS n_distinct FROM a").mkString(" UNION ALL ")
      s"""WITH a AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows, $aggsSql FROM documents
          )
          $rowsSql ORDER BY col_name"""
    },

    // CASE threshold chain generated from the same MixtureWeights Seq the
    // Spark when-chain folds over — single-sourced across engines
    "llm_mixture_sample" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
                 min(doc_id) AS min_doc
          FROM documents
          WHERE substr(md5(text), 1, 8) < ($mixtureThrSql)
          GROUP BY source ORDER BY source""",

    // composed twin of the batch corpus build: the classifier CTE (the
    // llm_quality_classifier twin, document carried through), gate +
    // null-id drop, the llm_text_normalize expression, first-wins dedup
    // on norm_text, the mixture CASE chain (same MixtureWeights Seq),
    // then the llm_pack_sequences window over the sampled survivors'
    // NORMALIZED token counts. Null-text docs were never scored; docs
    // normalizing to '' form one real dedup group.
    "llm_corpus_build" ->
      s"""WITH t AS (SELECT doc_id, lang, source, text,
                  string_split(text, ' ') AS toks
           FROM documents WHERE text IS NOT NULL),
         f AS (SELECT doc_id, lang, source, text,
                 list_distinct(list_concat(toks,
                   [array_to_string(toks[i:i+1], ' ')
                    for i in range(1, greatest(len(toks) - 1, 0) + 1)]))
                   AS feats
               FROM t),
         sc AS (SELECT doc_id, lang, source, text,
                 CAST(floor(1000.0 * list_sum(list_transform(feats,
                        ft -> CAST(md5_number_upper(ft) >> 1 AS BIGINT)
                              % 2001 - 1000))
                      / len(feats)) AS BIGINT) AS score_milli
               FROM f),
         n AS (SELECT doc_id, lang, source,
                 trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text
               FROM sc WHERE score_milli >= 0 AND doc_id IS NOT NULL),
         surv AS (SELECT min(doc_id) AS keep_id FROM n GROUP BY norm_text),
         sd AS (SELECT n.* FROM n JOIN surv ON n.doc_id = surv.keep_id),
         mx AS (SELECT * FROM sd
                WHERE substr(md5(norm_text), 1, 8) < ($mixtureThrSql)),
         c AS (SELECT lang, doc_id,
                 len(string_split(norm_text, ' ')) AS n_tokens,
                 coalesce(sum(len(string_split(norm_text, ' ')))
                   OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
               FROM mx)
         SELECT lang,
                CAST(floor(cum_before / ${CorpusBuild.PackBudget}.0) AS BIGINT)
                  AS bin,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                min(doc_id) AS first_doc
         FROM c GROUP BY lang, bin ORDER BY lang NULLS FIRST, bin""",

    // per-token ln fixed to 1e-6-unit bigints before the per-doc sum —
    // exact integer addition, order-independent in both engines
    "llm_ngram_lm" ->
      s"""WITH toks AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
            FROM documents
          ), tf AS (
            SELECT token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1
          ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS total FROM toks
          ), pd AS (
            SELECT doc_id, lang,
                   floor(CAST(sum(CAST(floor(ln(tf::DOUBLE / total::DOUBLE)
                                             * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                         / 1000000.0 / CAST(count(*) AS DOUBLE)
                         * 10000.0 + 0.5) / 10000.0 AS score
            FROM toks JOIN tf USING (token) CROSS JOIN tot
            GROUP BY doc_id, lang
          )
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 min(score) AS min_lp, max(score) AS max_lp,
                 CAST(sum(CASE WHEN score < $NgramLmLow THEN 1 ELSE 0 END) AS BIGINT) AS n_low
          FROM pd GROUP BY lang ORDER BY lang NULLS FIRST""",

    // pd chain duplicated verbatim from llm_ngram_lm (both twin
    // unigramDocScores); NTILE(3) ≡ the Spark side's floor(rank*3/n)
    // closed form — exact for k=3, see the query's comment
    "llm_ccnet_buckets" ->
      """WITH toks AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
            FROM documents
          ), tf AS (
            SELECT token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1
          ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS total FROM toks
          ), pd AS (
            SELECT doc_id, lang,
                   floor(CAST(sum(CAST(floor(ln(tf::DOUBLE / total::DOUBLE)
                                             * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                         / 1000000.0 / CAST(count(*) AS DOUBLE)
                         * 10000.0 + 0.5) / 10000.0 AS score
            FROM toks JOIN tf USING (token) CROSS JOIN tot
            GROUP BY doc_id, lang
          ), b AS (
            SELECT doc_id, lang, score,
                   ntile(3) OVER (PARTITION BY lang
                                  ORDER BY score DESC, doc_id) AS nt
            FROM pd
          )
          SELECT lang,
                 CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                         ELSE 'tail' END AS bucket,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(min(doc_id) AS BIGINT) AS min_doc,
                 CAST(sum(CAST(floor(score * 10000.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS sum_score_4dp
          FROM b GROUP BY lang, bucket
          ORDER BY lang NULLS FIRST, bucket""",

    // bucket = substr(md5(token),1,2) — the same string key the Spark
    // side uses, so no cross-engine integer-hash parity is needed; the
    // +1/+256 Laplace smoothing and 1e-6 fixed-point ln-ratio mirror the
    // Scala expression term for term
    "llm_dsir_weights" ->
      """WITH toks AS (
            SELECT doc_id, lang, source,
                   unnest(string_split(text, ' ')) AS token
            FROM documents
          ), b AS (
            SELECT doc_id, lang, source, substr(md5(token), 1, 2) AS bkt
            FROM toks
          ), dist AS (
            SELECT bkt, CAST(count(*) AS BIGINT) AS raw_n,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS tgt_n
            FROM b GROUP BY bkt
          ), tot AS (
            SELECT CAST(sum(raw_n) AS BIGINT) AS raw_tot,
                   CAST(sum(tgt_n) AS BIGINT) AS tgt_tot
            FROM dist
          ), lr AS (
            SELECT bkt,
                   CAST(floor(ln(((tgt_n + 1)::DOUBLE / (tgt_tot + 256)::DOUBLE)
                                 / ((raw_n + 1)::DOUBLE / (raw_tot + 256)::DOUBLE))
                              * 1000000.0 + 0.5) AS BIGINT) AS lr_units
            FROM dist CROSS JOIN tot
          ), pd AS (
            SELECT doc_id, lang, source,
                   floor(CAST(sum(lr_units) AS DOUBLE) / 1000000.0
                         / CAST(count(*) AS DOUBLE)
                         * 10000.0 + 0.5) / 10000.0 AS w
            FROM b JOIN lr USING (bkt)
            GROUP BY doc_id, lang, source
          )
          SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(CAST(floor(w * 10000.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS sum_w_4dp,
                 min(w) AS min_w, max(w) AS max_w
          FROM pd GROUP BY lang, source
          ORDER BY lang NULLS FIRST, source NULLS FIRST""",

    "llm_embed_centroid" ->
      """SELECT label, CAST(i - 1 AS INT) AS dim, CAST(count(*) AS BIGINT) AS n,
                floor(sum(CAST(floor(embedding[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT))::DOUBLE
                      / 1000000.0 / count(*)::DOUBLE * 10000.0 + 0.5) / 10000.0 AS centroid
         FROM embeddings,
              LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
         GROUP BY label, i ORDER BY label NULLS FIRST, dim""",

    // per-vector scale = max|v|/127; err fixed to integer 1e-12 units per
    // element BEFORE summing (order-independent exact bigint addition);
    // float32→double casts are exact so the IEEE expression trees match
    "llm_embed_quantize" ->
      """WITH e AS (
           SELECT vec_id, label, embedding,
                  list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS scale
           FROM embeddings
         ),
         u AS (
           SELECT vec_id, label, scale, CAST(embedding[i] AS DOUBLE) AS v
           FROM e, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
         ),
         q AS (
           SELECT vec_id, label,
                  CAST(floor((v - floor(v/scale + 0.5)*scale) * (v - floor(v/scale + 0.5)*scale)
                             * 1e12 + 0.5) AS BIGINT) AS err_unit
           FROM u WHERE scale > 0
         )
         SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
                CAST(count(*) AS BIGINT) AS n_elems,
                CAST(sum(err_unit) AS BIGINT) AS sum_err_units
         FROM q GROUP BY label ORDER BY label NULLS FIRST""",

    "llm_multimodal_schema" ->
      """SELECT doc_id, lang, n_chars, CAST(len(embedding) AS INT) AS dim,
                floor(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                      * 10000.0 + 0.5) / 10000.0 AS vnorm
         FROM documents JOIN embeddings ON doc_id = vec_id
         ORDER BY doc_id""",

    // decode stub's checksum = fold(bytes, 17, (h*31+b) mod 1e9+7) over the
    // UTF-8 bytes of text; width/height are modular projections of it.
    "llm_multimodal_meta" ->
      """WITH c AS (
           SELECT doc_id, length(text) AS n_bytes,
                  list_reduce(list_prepend(17::BIGINT,
                    list_transform(range(1, length(text) + 1), i -> ascii(text[i])::BIGINT)),
                    (h, b) -> (h * 31 + b) % 1000000007) AS checksum
           FROM documents WHERE text IS NOT NULL
         )
         SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes,
                CAST(64 + checksum % 640 AS INT) AS width,
                CAST(64 + (checksum // 7) % 480 AS INT) AS height,
                3 AS channels, checksum
         FROM c ORDER BY doc_id""",

    // media bytes = UTF-8 of the (all-ASCII) text, so the byte histogram
    // equals the char-codepoint histogram
    "llm_multimodal_features" ->
      """SELECT doc_id, CAST(ascii(c) // 16 AS INT) AS bin,
                CAST(count(*) AS BIGINT) AS n
         FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
               FROM documents WHERE text IS NOT NULL AND length(text) > 0)
         GROUP BY 1, 2 ORDER BY doc_id, bin""",

    "llm_multimodal_frames" ->
      """SELECT doc_id, CAST(n - 1 AS INT) AS frame_idx,
                CAST(length(substring(text,
                  CAST((n - 1) * greatest(length(text) // 4, 1) + 1 AS INT),
                  CAST(greatest(length(text) // 4, 1) AS INT))) AS INT) AS frame_bytes
         FROM documents, range(1, 5) t(n)
         ORDER BY doc_id, frame_idx"""
  )
}
