package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Incremental FUZZY (near-dup) corpus ingestion — the companion to
  * [[CorpusIngest]]'s exact manifest, covering the production case exact
  * digests cannot: a re-crawled page with a changed footer, a quoted
  * article with one new sentence. Each arriving batch is exact-deduped
  * within itself, MinHash-signed, LSH-probed against every band the
  * index has ever seen, signature-verified against only the CANDIDATE
  * historical docs, and the surviving (genuinely new) docs' signatures
  * and bands are appended.
  *
  * Scale shape (same lifetime-cost design as the r10 exact manifest):
  * state is TWO bucketed tables under `indexDir` —
  * `sigs` (doc_id, lang, minhash[32], batch) CLUSTERED BY doc_id, and
  * `bands` (band, bh, doc_id, batch) CLUSTERED BY (band, bh) — so a
  * micro-batch never re-shuffles history: the LSH probe joins the
  * batch's exploded bands against the bands table bucket-locally
  * (plan-asserted in FuzzyIngestSpec), and the verify step joins the
  * (few) candidates against the sigs table bucket-locally on doc_id.
  * Per-batch network cost is O(batch + candidates), not O(corpus
  * lifetime). Signatures live ONCE per doc (32×8 bytes); the bands
  * table carries only (hash, id) pairs — no ×numBands signature
  * duplication and never text bodies.
  *
  * Suppression semantics: a new doc is dropped when ≥ `simThreshold` of
  * its minhash positions agree with SOME candidate historical doc (the
  * standard unbiased Jaccard estimate). Within-batch near-dups are NOT
  * collapsed (only exact within-batch dups are — both of two near-dup
  * docs arriving in the SAME batch survive); the batch-level
  * `Dedup.minhashPairs`/`fuzzyDedupKeep` family is the tool for that,
  * and a daily batch is small against history by construction.
  *
  * Crash ordering: sigs are written BEFORE bands. A crash in between
  * leaves history docs whose bands are not yet probed-able — possible
  * under-suppression until the batch REPLAYS (foreachBatch at-least-once
  * re-runs it; both reads exclude the replayed batch's own partitions,
  * both writes are static-partition overwrites — idempotent, same as
  * CorpusIngest).
  */
object FuzzyIngest {

  val IndexBuckets = 16
  /** Must match [[Dedup.minhashSignatures]]'s defaults. */
  val NumHashes = 32

  def sigTable(indexDir: String): String =
    "graft_fuzzy_sigs_" + Integer.toHexString(indexDir.hashCode)
  def bandTable(indexDir: String): String =
    "graft_fuzzy_bands_" + Integer.toHexString(indexDir.hashCode)

  private def sigPath(indexDir: String) = s"$indexDir/sigs"
  private def bandPath(indexDir: String) = s"$indexDir/bands"

  /** Drop stale catalog entries / re-register long-lived index tables
    * (bucket spec in the DDL — the layout survives a new JVM/cluster).
    * Returns whether the index exists after reconciliation.
    */
  private def reconcile(s: SparkSession, indexDir: String): Boolean = {
    val fs = new Path(indexDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def one(tbl: String, path: String, ddl: String): Boolean = {
      val exists = fs.exists(new Path(path))
      if (!exists && s.catalog.tableExists(tbl)) s.sql(s"DROP TABLE `$tbl`")
      if (exists && !s.catalog.tableExists(tbl)) {
        s.sql(ddl); s.catalog.recoverPartitions(tbl)
      }
      s.catalog.tableExists(tbl)
    }
    val sigOk = one(sigTable(indexDir), sigPath(indexDir),
      s"""CREATE TABLE `${sigTable(indexDir)}` (
         |  doc_id BIGINT, lang STRING, minhash ARRAY<BIGINT>, batch BIGINT)
         |USING PARQUET PARTITIONED BY (batch)
         |CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO $IndexBuckets BUCKETS
         |LOCATION '${sigPath(indexDir)}'""".stripMargin)
    val bandOk = one(bandTable(indexDir), bandPath(indexDir),
      s"""CREATE TABLE `${bandTable(indexDir)}` (
         |  band INT, bh BIGINT, doc_id BIGINT, batch BIGINT)
         |USING PARQUET PARTITIONED BY (batch)
         |CLUSTERED BY (band, bh) SORTED BY (band, bh) INTO $IndexBuckets BUCKETS
         |LOCATION '${bandPath(indexDir)}'""".stripMargin)
    sigOk && bandOk
  }

  /** The bucket-local LSH probe: every (band, bh) of `newBands` that the
    * index has seen outside `batchId`, as (new_id, old_id) candidates.
    * Exposed for the plan assertion in FuzzyIngestSpec: the index side
    * must scan bucketed with NO shuffle exchange.
    */
  private[graft] def bandCandidates(newBands: DataFrame, batchId: Long,
      tbl: String): DataFrame = {
    val s = newBands.sparkSession
    val idx = s.table(tbl).filter(col("batch") =!= batchId)
      .select(col("band"), col("bh"), col("doc_id").as("old_id"))
    newBands.alias("n").join(idx.alias("o"),
        col("n.band") === col("o.band") && col("n.bh") === col("o.bh"))
      .select(col("n.doc_id").as("new_id"), col("old_id"))
      .distinct()
  }

  /** Streaming entry: every micro-batch runs [[ingestBatch]] — the same
    * foreachBatch shape as [[CorpusIngest.dedupIngest]].
    */
  def fuzzyIngest(docs: DataFrame, indexDir: String, checkpointDir: String,
      simThreshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, id: Long) =>
        ingestBatch(batch, id, indexDir, simThreshold))
      .start()

  /** One fuzzy ingest merge (batch mode; the streaming form above). */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      indexDir: String, simThreshold: Double = 0.5): Unit = {
    val s = batch.sparkSession
    val exists = reconcile(s, indexDir)
    // within-batch EXACT dedup (min doc_id per text), then sign
    val w = Window.partitionBy(col("__h"), col("__len")).orderBy(col("doc_id"))
    val uniq = batch
      .withColumn("__h", xxhash64(coalesce(col("text"), lit(""))))
      .withColumn("__len", coalesce(length(col("text")), lit(-1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang"), col("text"))
    val sigs = Dedup.minhashSignatures(uniq, "text", "doc_id")
      .join(uniq.select(col("doc_id"), col("lang")), "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val survivors =
        if (!exists) sigs
        else {
          val newBands = sigs.select(col("doc_id"),
            posexplode(col("bands")).as(Seq("band", "bh")))
          val cand = bandCandidates(newBands, batchId, bandTable(indexDir))
          // verify candidates only: bucket-local fetch of the historical
          // signatures, then the standard agreement-fraction estimate
          val oldSigs = s.table(sigTable(indexDir))
            .filter(col("batch") =!= batchId)
            .select(col("doc_id").as("old_id"), col("minhash").as("old_sig"))
          val dup = cand
            .join(oldSigs, "old_id")
            .join(sigs.select(col("doc_id").as("new_id"),
              col("minhash").as("new_sig")), "new_id")
            .withColumn("agree",
              size(filter(zip_with(col("new_sig"), col("old_sig"),
                (a, b) => a === b), x => x)).cast("double") / NumHashes.toDouble)
            .filter(col("agree") >= simThreshold)
            .select(col("new_id").as("doc_id")).distinct()
          sigs.join(dup, Seq("doc_id"), "left_anti")
        }
      // read-old-then-overwrite via localCheckpoint (the insert below
      // reads the same tables it overwrites — same pattern as the exact
      // manifest); batch-sized, never index-sized
      val staged = survivors
        .select(col("doc_id"), col("lang"), col("minhash"), col("bands"))
        .localCheckpoint(true)
      try {
        def insertInto(tbl: String, df: DataFrame, cols: String): Unit = {
          val view = s"graft_fuzzy_stage_${Integer.toHexString(indexDir.hashCode)}"
          df.createOrReplaceTempView(view)
          try s.sql(s"""INSERT OVERWRITE TABLE `$tbl` PARTITION (batch=$batchId)
                       |SELECT $cols FROM `$view`""".stripMargin)
          finally s.catalog.dropTempView(view)
        }
        if (!exists) {
          // mode overwrite: a crash between the two CTAS calls leaves ONE
          // table registered; the replay's reconcile re-registers it from
          // the on-disk layout and this overwrite then converges instead
          // of erroring on table-already-exists
          staged.select(col("doc_id"), col("lang"), col("minhash"))
            .withColumn("batch", lit(batchId)).write.mode("overwrite")
            .partitionBy("batch")
            .bucketBy(IndexBuckets, "doc_id").sortBy("doc_id")
            .option("path", sigPath(indexDir)).saveAsTable(sigTable(indexDir))
          staged.select(posexplode(col("bands")).as(Seq("band", "bh")),
              col("doc_id"))
            .withColumn("batch", lit(batchId)).write.mode("overwrite")
            .partitionBy("batch")
            .bucketBy(IndexBuckets, "band", "bh").sortBy("band", "bh")
            .option("path", bandPath(indexDir)).saveAsTable(bandTable(indexDir))
        } else {
          // sigs BEFORE bands: see crash-ordering note in the class doc
          insertInto(sigTable(indexDir),
            staged.select(col("doc_id"), col("lang"), col("minhash")),
            "doc_id, lang, minhash")
          insertInto(bandTable(indexDir),
            staged.select(posexplode(col("bands")).as(Seq("band", "bh")),
              col("doc_id")),
            "band, bh, doc_id")
        }
      } finally staged.unpersist()
    } finally sigs.unpersist()
  }

  /** Every surviving doc with its first-seen batch (signature metadata,
    * never text). Plain path read — catalog-independent.
    */
  def index(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(sigPath(indexDir)).select(col("doc_id"), col("lang"), col("batch"))
}
