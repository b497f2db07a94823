package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** Per-batch observability for the foreachBatch ingest pipelines
  * (VERDICT r10 #7 — listener parity with `kafka_pipeline`).
  *
  * Spark's `StreamingQueryListener` already reports the generic progress
  * of these queries (rows in, batch duration — KafkaPipeline wires it),
  * but it cannot carry pipeline-level semantics: how many arriving docs
  * were within-batch dups, how many the manifest/index suppressed, what
  * fraction the bloom pre-filter routed to the join. Those numbers exist
  * only inside `ingestBatch`, so the pipelines post them here; each event
  * is also emitted as one log line (the operational surface) and retained
  * in a bounded in-memory ring (the test surface — asserted in
  * CorpusIngestSpec/FuzzyIngestSpec).
  *
  * Cost: the counts are O(batch) actions over frames the merge already
  * persisted/checkpointed — never over manifest/index history.
  */
object IngestEvents {

  /** One ingest micro-batch, after its state writes committed.
    *
    * `bloomProbable` = post-dedup ROWS the bloom routed to the
    * join/anti-join (-1 when no bloom pre-filter was active this batch).
    * Row semantics, declared (ADVICE r13): the fused scalar pre-probe
    * counts signed rows, and on the fuzzy collapse path the exploded
    * probe counts distinct doc_ids — the two differ only when one doc_id
    * arrives under two different texts in the same delivery, a
    * duplicate-id corner this observability metric does not chase at the
    * cost of an Expand in the hot aggregate. `suppressed` counts only
    * CROSS-batch suppression (uniqueIn - appended).
    */
  final case class IngestProgress(pipeline: String, stateDir: String,
      batchId: Long, docsIn: Long, uniqueIn: Long, appended: Long,
      bloomProbable: Long) {
    def suppressed: Long = uniqueIn - appended
    /** Fraction of unique docs the bloom could NOT rule out (lower = the
      * pre-filter is earning its keep); NaN when the bloom was inactive.
      */
    def bloomHitRate: Double =
      if (bloomProbable < 0 || uniqueIn == 0) Double.NaN
      else bloomProbable.toDouble / uniqueIn
    def line: String =
      f"pipeline=$pipeline batch=$batchId in=$docsIn unique=$uniqueIn " +
        f"appended=$appended suppressed=$suppressed " +
        (if (bloomProbable < 0) "bloom=off"
         else f"bloomProbable=$bloomProbable hitRate=$bloomHitRate%.3f")
  }

  private val MaxRetained = 1024
  private val buf = ArrayBuffer.empty[IngestProgress]
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def post(p: IngestProgress): Unit = synchronized {
    buf += p
    if (buf.length > MaxRetained) buf.remove(0, buf.length - MaxRetained)
    log.info("graft-ingest " + p.line)
  }

  /** Events posted so far (oldest first), optionally for one state dir. */
  def recent(stateDir: Option[String] = None): Seq[IngestProgress] =
    synchronized {
      stateDir.fold(buf.toSeq)(d => buf.filter(_.stateDir == d).toSeq)
    }

  def clear(): Unit = synchronized(buf.clear())
}
