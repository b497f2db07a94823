package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental corpus ingestion with a PERSISTENT exact-dedup manifest —
  * the daily-ingest shape of a production training-data pipeline: each
  * arriving batch of documents is deduplicated within itself, anti-joined
  * against every digest the manifest has ever seen, and only the NEW
  * documents' digests are appended. Re-ingesting yesterday's corpus adds
  * nothing; a crashed batch replays idempotently.
  *
  * Scale shape: the manifest stores 16-byte `(xxhash64, length)` digest
  * keys plus doc metadata — never text bodies — so the anti-join shuffles
  * digests, not documents (same rationale as `Dedup.exact`). State is
  * O(distinct documents ever seen), append-only, partitioned by ingest
  * batch.
  */
object CorpusIngest {

  /** Streaming entry: every micro-batch runs [[ingestBatch]]. */
  def dedupIngest(docs: DataFrame, manifestDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, id: Long) =>
        ingestBatch(batch, id, manifestDir))
      .start()

  /** One ingest merge. Exposed for batch-mode tests; called per
    * micro-batch above.
    *
    * Idempotent replay: each batch writes `manifestDir/batch=<id>` with
    * overwrite, so foreachBatch's at-least-once delivery re-running a
    * batch replaces its own output instead of duplicating it — and the
    * anti-join EXCLUDES the current batch's own partition, so a replayed
    * batch is not anti-joined away by its previous (possibly partial)
    * attempt.
    */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      manifestDir: String): Unit = {
    val s = batch.sparkSession
    // within-batch exact dedup: min doc_id per digest (null text forms
    // its own single digest group, mirroring SQL GROUP BY text)
    val w = Window.partitionBy(col("__h"), col("__len")).orderBy(col("doc_id"))
    val b = batch
      .withColumn("__h", xxhash64(col("text")))
      .withColumn("__len", length(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .select(col("doc_id"), col("lang"), col("__h"), col("__len"))
    // existence probe through the path's Hadoop filesystem, NOT
    // java.io.File: on hdfs://-s3a:// manifest dirs a driver-local check
    // is always false and would silently skip dedup on every batch
    val mPath = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = mPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val survivors =
      if (fs.exists(mPath)) {
        val seen = s.read.parquet(manifestDir)
          .filter(col("batch") =!= batchId)
          .select(col("__h"), col("__len"))
        // null-safe: a null digest (null text) in the manifest must still
        // suppress later null-text docs — plain anti-join equality would
        // pass every null-key row through as "new"
        b.alias("b").join(seen.alias("m"),
            col("b.__h") <=> col("m.__h") && col("b.__len") <=> col("m.__len"),
            "left_anti")
      } else b
    survivors.write.mode("overwrite").parquet(s"$manifestDir/batch=$batchId")
  }

  /** The manifest as a DataFrame: every surviving (new-at-ingest-time)
    * document with its digest and the batch that first saw it.
    */
  def manifest(s: org.apache.spark.sql.SparkSession,
      manifestDir: String): DataFrame =
    s.read.parquet(manifestDir)
}
