package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.Tables

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Streaming golden tests (SURVEY §5.2 #4): the EventTime builders run
  * identically in batch and streaming, and watermarks drop late rows.
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 10:20:00"), 1, "click", 3.0),
    Ev(3, ts("2024-01-01 11:10:00"), 2, "buy", 5.0),
    Ev(4, ts("2024-01-01 11:40:00"), 2, "click", 7.0),
    Ev(5, ts("2024-01-01 12:30:00"), 1, "buy", 9.0)
  )

  test("streaming tumbling counts equal the batch plan on the same rows") {
    val expected = EventTime.tumblingCounts(batch.toDF())
      .orderBy("ws", "event_type").collect().toSeq

    val mem = MemoryStream[Ev](1, spark, None)
    mem.addData(batch: _*)
    val q = EventTime.tumblingCounts(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("tumbling_golden")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling_golden")
        .orderBy("ws", "event_type").collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("watermark drops rows older than the watermark in append mode") {
    val mem = MemoryStream[Ev](2, spark, None)
    val q = EventTime.tumblingCounts(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("late_golden")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past the 10:00 window
      mem.addData(Ev(2, ts("2024-01-01 15:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // late row for the long-closed 10:00 window → dropped
      mem.addData(Ev(3, ts("2024-01-01 10:06:00"), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(4, ts("2024-01-01 23:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("late_golden")
        .select(col("ws"), col("n")).as[(Long, Long)].collect().toMap
      val w10 = ts("2024-01-01 10:00:00").getTime / 1000
      assert(rows(w10) == 1L, s"late row must not inflate the closed window: $rows")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids") {
    val mem = MemoryStream[Ev](3, spark, None)
    val q = EventTime.dedupCounts(mem.toDF().withWatermark("ts", "1 hour"))
      .writeStream.format("memory").queryName("dedup_golden")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // dup id
        Ev(2, ts("2024-01-01 10:01:00"), 1, "buy", 2.0))
      q.processAllAvailable()
      val got = spark.table("dedup_golden")
        .as[(String, Long)].collect().toMap
      assert(got == Map("click" -> 1L, "buy" -> 1L))
    } finally q.stop()
  }

  test("streaming stream-static enrichment equals the batch join") {
    // Stream-static left join: the dim is a broadcast snapshot, no join
    // state; unmatched events (user 3) must survive with a null segment.
    val dim = Seq((1L, "SEG_A"), (2L, "SEG_B")).toDF("c_custkey", "c_mktsegment")
    val withOrphan = batch :+ Ev(9, ts("2024-01-01 13:00:00"), 3, "click", 2.0)
    val expected = EventTime
      .enrichStatic(withOrphan.toDF(), dim, "user_id", "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
      .as[(Long, Option[String])].collect().toSeq.sorted

    val mem = MemoryStream[Ev](20, spark, None)
    mem.addData(withOrphan: _*)
    val q = EventTime.enrichStatic(mem.toDF(), dim, "user_id", "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
      .writeStream.format("memory").queryName("enrich_golden")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich_golden")
        .as[(Long, Option[String])].collect().toSeq.sorted
      assert(got == expected)
      assert(got.exists { case (id, seg) => id == 9L && seg.isEmpty },
        "orphan event must survive the left join with a null segment")
    } finally q.stop()
  }

  test("stream_dedup oracle precondition: event_id determines event_type") {
    // The DuckDB twin (count(DISTINCT event_id) per type) equals
    // dropDuplicates-then-count ONLY while event_id → event_type is
    // functional; if the generator ever plants conflicting-type dup ids,
    // this fails loudly instead of the oracle hash drifting.
    import org.apache.spark.sql.functions.countDistinct
    val conflicting = graft.Tables.events(spark, sfDir)
      .groupBy("event_id")
      .agg(countDistinct("event_type").as("nt"))
      .filter(col("nt") > 1)
    assert(conflicting.isEmpty,
      "event_id maps to multiple event_types — stream_dedup's SQL twin is no longer valid")
  }

  test("stream-stream interval join pairs events within the window, streaming = batch") {
    val clicks = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 12:00:00"), 1, "click", 2.0))
    val buys = Seq(
      Ev(10, ts("2024-01-01 10:30:00"), 1, "purchase", 5.0), // joins click 1
      Ev(11, ts("2024-01-01 11:30:00"), 1, "purchase", 6.0), // outside 1h of click 1
      Ev(12, ts("2024-01-01 12:15:00"), 2, "purchase", 7.0)) // other user
    val expected = EventTime.intervalJoin(clicks.toDF(), buys.toDF())
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L)), s"batch sanity: $expected")

    val lMem = MemoryStream[Ev](10, spark, None)
    val rMem = MemoryStream[Ev](11, spark, None)
    val joined = EventTime.intervalJoin(
      lMem.toDF().withWatermark("ts", "10 minutes"),
      rMem.toDF().withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ssj_golden")
      .outputMode("append").start()
    try {
      lMem.addData(clicks: _*)
      rMem.addData(buys: _*)
      q.processAllAvailable()
      val got = spark.table("ssj_golden")
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"streaming result $got != batch $expected")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions by gap and by watermark timeout") {
    val mem = MemoryStream[Ev](4, spark, None)
    val sessions = EventTime.sessionizeStateful(spark,
      mem.toDF().withWatermark("ts", "1 minute"))
    val q = sessions.writeStream.format("memory").queryName("state_sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 60-min gap
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(3, ts("2024-01-01 11:00:00"), 1, "buy", 4.0))
      q.processAllAvailable()
      // user 2 far in the future advances the watermark past 11:00+30min
      mem.addData(Ev(4, ts("2024-01-01 13:00:00"), 2, "click", 8.0))
      q.processAllAvailable()
      val got = spark.table("state_sessions")
        .as[EventTime.ClosedSession].collect()
        .map(s => (s.user_id, s.session_start / 1000, s.n, s.session_value)).toSet
      val t1000 = ts("2024-01-01 10:00:00").getTime / 1000
      val t1100 = ts("2024-01-01 11:00:00").getTime / 1000
      assert(got.contains((1L, t1000, 2L, 3.0)), s"gap-closed session missing: $got")
      assert(got.contains((1L, t1100, 1L, 4.0)), s"timeout-closed session missing: $got")
      assert(!got.exists(_._1 == 2L), "user 2's session is still open")
    } finally q.stop()
  }

  test("upsert merge: later batch wins per user, state swap survives batches") {
    val state = graft.util.Scratch.fresh("upsert_spec")
    // batch 1: users 1 and 2
    EventTime.mergeLatest(Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 11:00:00"), 1, "view", 2.0),
      Ev(3, ts("2024-01-01 10:00:00"), 2, "buy", 3.0)
    ).toDF(), state)
    // batch 2: user 1 newer event, user 2 OLDER event (must NOT win),
    // user 3 new; plus an equal-ts pair for user 3 (event_id tiebreak)
    EventTime.mergeLatest(Seq(
      Ev(9, ts("2024-01-01 12:00:00"), 1, "buy", 9.0),
      Ev(1, ts("2024-01-01 09:00:00"), 2, "view", 0.5),
      Ev(4, ts("2024-01-01 10:00:00"), 3, "click", 4.0),
      Ev(5, ts("2024-01-01 10:00:00"), 3, "view", 5.0)
    ).toDF(), state)
    val got = spark.read.parquet(state)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 9L, "buy"),   // batch-2 newer event replaced the state
      (2L, 3L, "buy"),   // batch-2 older event did NOT
      (3L, 5L, "view"))) // equal ts: higher event_id wins
  }

  test("upsert merge recovers prior state from a crash between the swap renames") {
    val state = graft.util.Scratch.fresh("upsert_crash_spec")
    EventTime.mergeLatest(Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:30:00"), 2, "view", 2.0)
    ).toDF(), state)
    // simulate a crash between `state -> _old` and `tmp -> state`: the
    // state dir is gone, only _old holds the complete prior table
    assert(new java.io.File(state).renameTo(new java.io.File(state + "_old")))
    // the replayed batch must merge against the RECOVERED state — with a
    // naive delete-then-rename, users 1 and 2 would silently vanish here
    EventTime.mergeLatest(Seq(
      Ev(3, ts("2024-01-01 11:00:00"), 3, "buy", 3.0)
    ).toDF(), state)
    val got = spark.read.parquet(state)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 2L), (3L, 3L)),
      s"prior users lost across the simulated swap crash: $got")
    assert(!new java.io.File(state + "_old").exists(),
      "completed merge must clean up the _old swap dir")
  }

  test("session windows group by 30-minute inactivity gap") {
    val rows = EventTime.sessionStats(Tables.events(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    // sanity on the synthetic table: session value sums are finite and
    // every session has >= 1 event
    assert(rows.forall(_.getAs[Long]("n") >= 1))
  }
}
