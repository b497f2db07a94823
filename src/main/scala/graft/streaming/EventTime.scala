package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time transforms (SURVEY §2.B streaming block).
  *
  * Each builder takes any events DataFrame — batch or streaming — and
  * returns the same logical plan, so streaming-vs-batch equivalence is a
  * test, not a hope. Streaming callers add `withWatermark("ts", ...)`
  * before the groupBy; state then ages out with the watermark instead of
  * growing unboundedly.
  */
object EventTime {

  /** Tumbling 1-hour counts per event_type. Window starts are epoch-aligned
    * (UTC), matching `date_trunc('hour', ts)`.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"), col("n"))

  /** Sliding 1-hour windows every 15 minutes: avg + count of `value`.
    * Portable floor-rounding (graft.functions.Rounding) for the oracle.
    */
  def slidingAvg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(graft.functions.Rounding.roundTo(avg(col("value")), 2).as("avg_value"),
        count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("avg_value"), col("n"))

  /** Per-user session windows with a 30-minute inactivity gap.
    *
    * `session_value` sums cent-scaled integers (`floor(value*100+0.5)`)
    * rather than rounding a double sum: integer addition is
    * order-independent, so the result is identical no matter how Spark
    * partitions the session's rows — and bit-identical to the SQL oracle,
    * which a float sum (non-associative) cannot guarantee.
    */
  def sessionStats(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100.0 + 0.5).cast("long")) / 100.0).as("session_value"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n"), col("session_value"))

  /** Streaming dedup surface: drop duplicate event_ids (bounded by the
    * caller's watermark in streaming mode), then count per type.
    */
  def dedupCounts(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))

  /** Stream-static enrichment: every event joined (left outer — unmatched
    * events survive with nulls) to a broadcast static dimension. The
    * stream-static join shape: no watermark and NO join state — the static
    * side is a broadcast snapshot re-resolved per micro-batch, so state
    * stays O(0) regardless of stream volume; the identical plan runs in
    * batch for the oracle. At 100 TB-of-stream the per-executor cost is a
    * hash probe per event against the broadcast dim.
    */
  def enrichStatic(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  /** Event-time interval join: pair each left event with the same user's
    * right events in (left.ts, left.ts + `withinMinutes`]. In streaming
    * mode both inputs carry watermarks and the interval condition bounds
    * the join state on both sides (Spark drops buffered rows once the
    * watermark passes the interval) — the stream-stream join shape. The
    * identical plan runs in batch for the oracle.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      withinMinutes: Int = 60): DataFrame = {
    val l = left.select(col("event_id").as("l_id"), col("user_id").as("l_user"),
      col("ts").as("l_ts"), col("value").as("l_value"))
    val r = right.select(col("event_id").as("r_id"), col("user_id").as("r_user"),
      col("ts").as("r_ts"), col("value").as("r_value"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
  }

  /** One open session per user, maintained by hand. */
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  /** Emitted when a session closes (gap exceeded or watermark timeout). */
  case class ClosedSession(user_id: Long, session_start: Long,
      session_end: Long, n: Long, session_value: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * arbitrary-state API surface (`session_window` above covers the
    * declarative form). Sessions close when a gap > `gapMinutes` appears
    * within a user's (sorted) events, or — in streaming mode — when the
    * event-time timeout fires past the watermark. State per key is one
    * fixed-size SessionState: bounded memory, scales with distinct live
    * users, not event volume.
    */
  /** foreachBatch keyed upsert — the standard streaming-merge sink: the
    * external state table at `stateDir` always holds each user's LATEST
    * event (by ts, then event_id). Every micro-batch is reduced to its
    * per-user winners, merged against the current state, and the state is
    * swapped via write-tmp → two-rename (state → `_old`, tmp → state, with
    * crash recovery from `_old` in [[mergeLatest]]), so a reader never
    * sees a half-written table and a crash at ANY point leaves a complete
    * prior state + the checkpoint to replay from. State size is
    * O(distinct users), not event volume. At 100 TB the same shape runs
    * against a transactional table format's MERGE INTO; plain parquet +
    * swap keeps the contract visible here.
    */
  def upsertLatest(events: DataFrame, stateDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) => mergeLatest(batch, stateDir))
      .start()

  private[graft] val UpsertCols =
    Seq("user_id", "event_id", "event_type", "value", "ts")

  /** One upsert merge: per-user latest of (state ∪ batch) replaces the
    * state. Exposed for batch-mode tests; called per micro-batch above.
    */
  private[graft] def mergeLatest(batch: DataFrame, stateDir: String): Unit = {
    val s = batch.sparkSession
    // All existence/rename/delete goes through the path's Hadoop
    // filesystem, NOT java.io.File: on an hdfs://-s3a:// state dir a
    // driver-local check is always false, so the recovery branch would
    // never trigger and the swap would sys.error instead of recovering.
    // (Same rationale as CorpusIngest.ingestBatch. Note s3a rename is
    // copy+delete, not atomic — at 100 TB the same shape runs against a
    // transactional table format's MERGE INTO, per the scaladoc above.)
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val stateP = new org.apache.hadoop.fs.Path(stateDir)
    val oldP = new org.apache.hadoop.fs.Path(stateDir + "_old")
    // Crash recovery from a previous interrupted swap. Both dirs present:
    // the swap completed (state is the newer table), the `_old` cleanup
    // just didn't run — drop it. Only `_old` present: the crash hit
    // between the two renames — restore it; the checkpoint then replays
    // the interrupted batch against the restored prior state.
    if (fs.exists(stateP)) {
      if (fs.exists(oldP)) fs.delete(oldP, true)
    } else if (fs.exists(oldP) && !fs.rename(oldP, stateP))
      sys.error(s"state recovery failed: $oldP -> $stateP")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(desc("ts"), desc("event_id"))
    def latestOf(df: DataFrame): DataFrame =
      df.select(UpsertCols.map(col): _*)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val merged =
      if (fs.exists(stateP))
        latestOf(s.read.parquet(stateDir).unionByName(latestOf(batch)))
      else latestOf(batch)
    val tmp = new org.apache.hadoop.fs.Path(stateDir + "_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // Two-rename swap (state → _old, tmp → state, drop _old): at every
    // crash point either `state` or `_old` holds a complete prior table,
    // which the recovery above restores — a plain delete-then-rename has
    // a window where NO state exists and earlier batches' users are
    // silently lost.
    if (fs.exists(stateP) && !fs.rename(stateP, oldP))
      sys.error(s"state swap failed: $stateP -> $oldP")
    if (!fs.rename(tmp, stateP))
      sys.error(s"state swap failed: $tmp -> $stateDir")
    fs.delete(oldP, true)
  }

  def sessionizeStateful(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    // NB: no cast on ts — casting a watermarked column drops its
    // watermark tag and EventTimeTimeout then fails analysis
    val typed = events
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[(Long, Timestamp, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.start, s.lastTs, s.n, s.sum))
          } else {
            // batch mode delivers ALL of a user's rows at once (streaming
            // delivers per-trigger chunks): sort by time, close on gaps
            val sorted = rows.map { case (_, ts, v) => (ts.getTime, v) }
              .toArray.sortBy(_._1)
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { case (t, v) =>
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + v))
                case Some(s) =>
                  closed += ClosedSession(user, s.start, s.lastTs, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur match {
              case Some(s) if state.getOption.isEmpty || closed.nonEmpty ||
                  sorted.nonEmpty =>
                state.update(s)
                // Streaming: arm the gap timeout, clamped past the current
                // watermark — if lastTs+gap is already at/behind it, an
                // unclamped call throws and the session would never time
                // out (state leak). Batch: no watermark exists (the
                // getCurrentWatermarkMs call itself throws) and timeouts
                // never fire anyway, so skip arming; that narrow case is
                // the ONLY swallowed error.
                val wmMs =
                  try state.getCurrentWatermarkMs()
                  catch { case _: UnsupportedOperationException => -1L }
                if (wmMs >= 0L)
                  state.setTimeoutTimestamp(math.max(wmMs + 1L, s.lastTs + gapMs))
              case _ => ()
            }
            closed.iterator
          }
      }
  }
}
