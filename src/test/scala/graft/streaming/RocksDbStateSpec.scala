package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** The streaming surface on the RocksDB state store provider (VERDICT r7
  * item 8): the default HDFS-backed store keeps every key in executor
  * heap — at 100 TB session/dedup state that's the OOM path, and RocksDB
  * (spilling to local SSD, incremental checkpoint upload) is the provider
  * a production deployment would run. These tests pin that the graft
  * streaming builders are provider-agnostic: same results on RocksDB as
  * the batch twins, with the provider's engagement asserted from the
  * query progress metrics, not assumed from the conf.
  *
  * Conf-gated: the provider rides in a child session
  * (`spark.newSession()`), so the suite's shared session keeps the
  * default store; cancels (visibly) if the RocksDB provider class or its
  * JNI jar is absent.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 10:20:00"), 1, "click", 3.0),
    Ev(2, ts("2024-01-01 10:20:00"), 1, "click", 3.0), // dup event_id
    Ev(3, ts("2024-01-01 11:10:00"), 2, "buy", 5.0),
    Ev(4, ts("2024-01-01 11:40:00"), 2, "click", 7.0),
    Ev(5, ts("2024-01-01 12:30:00"), 1, "buy", 9.0)
  )

  private def rocksSession() = {
    assume(scala.util.Try(Class.forName(Provider)).isSuccess,
      "RocksDB state store provider not on the classpath")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    s2
  }

  /** Runs `mem → build → memory sink (complete mode)` on the RocksDB
    * session and returns (result rows, rocksdb engaged?).
    */
  private def run(name: String,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Seq[org.apache.spark.sql.Row], Boolean) = {
    val s2 = rocksSession()
    val mem = MemoryStream[Ev](900 + name.hashCode.abs % 100, s2, None)
    mem.addData(batch: _*)
    val q = build(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rocks = q.recentProgress.flatMap(_.stateOperators).exists { op =>
        scala.jdk.CollectionConverters.SetHasAsScala(op.customMetrics.keySet)
          .asScala.exists(_.toLowerCase.contains("rocksdb"))
      }
      (s2.table(name).collect().toSeq, rocks)
    } finally q.stop()
  }

  test("session_window stats on RocksDB equal the batch twin") {
    val expected = EventTime.sessionStats(batch.toDF())
      .orderBy("user_id", "session_start").collect().toSeq
    val (got, rocks) = run("rocks_session",
      df => EventTime.sessionStats(df))
    assert(got.sortBy(r => (r.getLong(0), r.getLong(1))) == expected)
    assert(rocks, "query progress shows no rocksdb state metrics — " +
      "the provider conf did not engage")
  }

  test("streaming dedup counts on RocksDB equal the batch twin") {
    val expected = EventTime.dedupCounts(batch.toDF())
      .orderBy("event_type").collect().toSeq
    val (got, rocks) = run("rocks_dedup",
      df => EventTime.dedupCounts(df))
    assert(got.sortBy(_.getString(0)) == expected)
    assert(rocks, "query progress shows no rocksdb state metrics — " +
      "the provider conf did not engage")
  }
}
