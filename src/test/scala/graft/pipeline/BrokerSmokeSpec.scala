package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Opt-in REAL-broker smoke for the literal Kafka path (VERDICT r7 item
  * 4): this sandbox ships neither a broker nor the spark-sql-kafka
  * connector jar, so `kafkaStream`'s `format("kafka")` has never executed
  * here — the one untestable seam between this repo and the reference
  * (README "Untestable seam"). On a machine that HAS both, run:
  *
  * {{{
  * SPARK_GRAFT_BROKER=host:9092 sbt "testOnly graft.pipeline.BrokerSmokeSpec"
  * }}}
  *
  * and the synthetic producer (R10) publishes to a fresh topic, the real
  * `kafkaStream → payloadAsString → parquetSink` pipeline drains it with
  * AvailableNow, and what landed on disk is compared against what was
  * produced. Without the env var (or without the connector on the
  * classpath) the test CANCELS — visible in the report as canceled, never
  * silently green.
  */
class BrokerSmokeSpec extends SparkSpec {

  test("opt-in: kafkaStream -> parquetSink end-to-end against a real broker") {
    // readiness probe (VERDICT r9 #8): report BOTH preconditions in one
    // cancel message, so "connector appeared but no broker configured" is
    // distinguishable from "connector jar still missing" — without this,
    // dropping the jar into /opt/spark/jars would change nothing visible.
    val broker = sys.env.get("SPARK_GRAFT_BROKER")
    val connector = KafkaPipeline.kafkaConnectorPresent
    val status = (broker.isDefined, connector) match {
      case (false, false) =>
        "not ready: spark-sql-kafka-0-10 connector NOT on the classpath " +
          "AND SPARK_GRAFT_BROKER not set — add the connector (+ " +
          "kafka-clients) jars and point SPARK_GRAFT_BROKER at a broker"
      case (false, true) =>
        "half ready: connector jar FOUND on the classpath; set " +
          "SPARK_GRAFT_BROKER=host:9092 to run the real-path smoke"
      case (true, false) =>
        "half ready: SPARK_GRAFT_BROKER is set but the " +
          "spark-sql-kafka-0-10 connector jar is NOT on the classpath — " +
          "add it (+ kafka-clients) to /opt/spark/jars"
      case (true, true) => "ready"
    }
    assume(broker.isDefined && connector, status)

    val topic = s"graft_smoke_${java.util.UUID.randomUUID().toString.take(8)}"
    val n = 100L
    // R10 producer → the real broker (same record shape as main.rs:74-83)
    KafkaPipeline.syntheticRecords(spark, n)
      .select(col("key"), col("value"), col("headers"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", broker.get)
      .option("topic", topic)
      .save()

    val base = graft.util.Scratch.fresh("broker_smoke")
    val cfg = PipelineConfig(brokers = broker.get, topic = topic,
      batchSize = 40, outputDir = s"$base/out", checkpointDir = s"$base/chk")
    KafkaPipeline.initOutput(cfg.outputDir)
    val q = KafkaPipeline.parquetSink(
      KafkaPipeline.payloadAsString(KafkaPipeline.kafkaStream(spark, cfg)),
      cfg).start()
    q.awaitTermination()

    val got = spark.read.parquet(cfg.outputDir)
      .select(col("b")).as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq
    val want = (0L until n).map(i => s"Message $i").sorted
    assert(got == want,
      s"broker roundtrip lost/duplicated rows: got ${got.size} of $n")
  }
}
