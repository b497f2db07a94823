package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** The composed curation pipeline a corpus run actually deploys: the
  * model-based quality gate FEEDING the persistent exact-dedup manifest
  * in one foreachBatch — score each arriving delivery, keep documents
  * the classifier accepts, ingest only the keepers (first-wins against
  * the manifest's full history). The two stages exist separately as
  * `stream_quality_gate` (stateless gate → sink) and
  * `llm_dedup_incremental` ([[CorpusIngest.dedupIngest]]); this object
  * pins their INTERACTION — the gate's keepers entering the manifest's
  * idempotent replay protocol — which neither covers alone (VERDICT r13
  * item 5).
  *
  * Composition semantics worth stating: the gate runs BEFORE the
  * manifest, so a gated-out document never claims a text digest — a
  * later delivery of the same text by a keeper still enters. The gate is
  * a stateless per-row map and [[CorpusIngest.ingestBatch]] is
  * replay-idempotent under its static-partition overwrite, so the
  * composition replays idempotently too (spec-pinned). Scale shape: the
  * gate adds one compiled-kernel map + a batch-local semi-join (keeper
  * ids onto the batch, broadcast-sized) in front of the manifest's
  * O(batch + collisions) bucket-local anti-join — nothing new touches
  * history.
  */
object CurationPipeline {

  /** One gated ingest merge: score → keep (score_milli >= 0, the
    * classifier's integer-exact rule; null-text rows are unscorable and
    * never keepers) → manifest ingest. Idempotent per (batch, batchId)
    * because the gate is deterministic and the manifest write is a
    * static-partition overwrite.
    */
  def gatedIngestBatch(batch: DataFrame, batchId: Long,
      manifestDir: String): Unit = {
    val keepIds = TextAnalysis.qualityClassifier(batch)
      .filter(col("score_milli") >= 0)
      .select(col("doc_id"))
    val keepers = batch.join(keepIds, Seq("doc_id"), "left_semi")
    CorpusIngest.ingestBatch(keepers, batchId, manifestDir)
  }

  /** Streaming entry — foreachBatch over [[gatedIngestBatch]], the
    * ingest-family shape (AvailableNow, checkpointed).
    */
  def gatedIngest(docs: DataFrame, manifestDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        gatedIngestBatch(batch, id, manifestDir)
      }
      .start()
}
