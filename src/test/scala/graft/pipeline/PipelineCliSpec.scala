package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** R12 CLI surface (main.rs:312-394) + R5 exact-name sink (main.rs:274-283). */
class PipelineCliSpec extends SparkSpec {
  import spark.implicits._

  test("R12: defaults match the reference clap definition") {
    val Right(p) = PipelineCli.parse(Array("-t", "test")): @unchecked
    assert(p.config.brokers == "localhost:9092")
    assert(p.config.groupId == "example_consumer_group_id")
    assert(p.config.topic == "test")
    assert(p.config.batchSize == 10)
    assert(!p.producer)
    assert(p.logConf.isEmpty && p.fileSource.isEmpty)
  }

  test("R12: every flag parses, long and short forms") {
    val Right(p) = PipelineCli.parse(Array(
      "--brokers", "k1:9092,k2:9092", "-g", "grp", "--topic", "events",
      "-m", "p", "--num-messages", "250", "--log-conf", "WARN",
      "--file-source", "/tmp/src", "--output-dir", "/tmp/o",
      "--checkpoint-dir", "/tmp/c")): @unchecked
    assert(p.config == PipelineConfig("k1:9092,k2:9092", "grp", "events",
      250, "/tmp/o", "/tmp/c"))
    assert(p.producer)
    assert(p.logConf.contains("WARN"))
    assert(p.fileSource.contains("/tmp/src"))
  }

  test("R12: topic is required; bad flags and bad -n are errors; mode !p = consumer") {
    assert(PipelineCli.parse(Array("-n", "5")).isLeft)
    assert(PipelineCli.parse(Array("-t", "x", "--bogus", "1")).isLeft)
    assert(PipelineCli.parse(Array("-t", "x", "-n", "ten")).isLeft)
    assert(PipelineCli.parse(Array("-t", "x", "-n")).isLeft)
    // reference: Some("p") => produce, anything else => consume
    val Right(c) = PipelineCli.parse(Array("-t", "x", "-m", "C")): @unchecked
    assert(!c.producer)
    val Right(weird) = PipelineCli.parse(Array("-t", "x", "-m", "zzz")): @unchecked
    assert(!weird.producer)
  }

  test("R12 smoke: producer then consumer over the file stand-in, end to end") {
    val base = Files.createTempDirectory("graft_cli").toString
    val src = s"$base/src"
    val Right(prod) = PipelineCli.parse(Array(
      "-t", "test", "-m", "p", "-n", "25", "--file-source", src)): @unchecked
    PipelineCli.runProducer(spark, prod)
    assert(spark.read.parquet(src).count() == 25)

    val Right(cons) = PipelineCli.parse(Array(
      "-t", "test", "-n", "25", "--file-source", src,
      "--output-dir", s"$base/out", "--checkpoint-dir", s"$base/chk")): @unchecked
    PipelineCli.runConsumer(spark, cons)
    val out = spark.read.parquet(s"$base/out")
    assert(out.schema.fieldNames.toSeq == Seq("b"))
    assert(out.count() == 25)
    assert(out.filter(col("b").startsWith("Message ")).count() == 25)
  }

  test("R5: fidelity sink reproduces partition_{p}_batch_{b}.parquet names") {
    val base = Files.createTempDirectory("graft_fid").toString
    val src = s"$base/src"
    // 25 records, partition = id % 2 → p0 has 13 rows, p1 has 12
    KafkaPipeline.syntheticRecords(spark, 25).write.parquet(src)
    val cfg = PipelineConfig(batchSize = 5,
      outputDir = s"$base/out", checkpointDir = s"$base/chk")
    KafkaPipeline.initOutput(cfg.outputDir)
    val q = KafkaPipeline.fidelityFileSink(
      KafkaPipeline.fileStream(spark, src, spark.read.parquet(src).schema),
      cfg).start()
    q.awaitTermination()

    val names = new java.io.File(cfg.outputDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val expected = (0 to 2).flatMap(b =>
      Seq(s"partition_0_batch_$b.parquet", s"partition_1_batch_$b.parquet")).toSet
    assert(names == expected, s"got $names")
    // per-file contents: batchSize rows except the tail, offset-ordered
    // payloads — the exact sequence, pinning the writer's sort preservation
    // (partition = id % 2, offset = id → p0/b0 is messages 0,2,4,6,8)
    val full = spark.read.parquet(s"${cfg.outputDir}/partition_0_batch_0.parquet")
      .as[String].collect()
    assert(full.toSeq == (0 to 8 by 2).map(i => s"Message $i"))
    val b1 = spark.read.parquet(s"${cfg.outputDir}/partition_1_batch_1.parquet")
      .as[String].collect()
    assert(b1.toSeq == (11 to 19 by 2).map(i => s"Message $i"))
    val tail0 = spark.read.parquet(s"${cfg.outputDir}/partition_0_batch_2.parquet").count()
    val tail1 = spark.read.parquet(s"${cfg.outputDir}/partition_1_batch_2.parquet").count()
    assert(tail0 == 3 && tail1 == 2, s"tail chunks flushed: $tail0/$tail1")
    assert(spark.read.parquet(cfg.outputDir + "/*.parquet").count() == 25)

    // a wiped output dir must restart numbering at batch_0 (state lives
    // with the files, not in driver memory)
    graft.util.Scratch.delete(cfg.outputDir)
    graft.util.Scratch.delete(cfg.checkpointDir)
    KafkaPipeline.initOutput(cfg.outputDir)
    val q2 = KafkaPipeline.fidelityFileSink(
      KafkaPipeline.fileStream(spark, src, spark.read.parquet(src).schema),
      cfg).start()
    q2.awaitTermination()
    val names2 = new java.io.File(cfg.outputDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(names2 == expected, s"wiped dir must renumber from batch_0: got $names2")
  }

  test("avro flags: paired validation and typed end-to-end decode with a poison pill") {
    import graft.sources.AvroWire
    assert(PipelineCli.parse(Array("-t", "x", "--avro-registry", "/r")).isLeft,
      "--avro-registry without --avro-schema-id must be rejected")
    assert(PipelineCli.parse(Array("-t", "x", "--avro-schema-id", "zz",
      "--avro-registry", "/r")).isLeft, "non-integer schema id must be rejected")

    val base = Files.createTempDirectory("graft_cli_avro").toString
    val regDir = s"$base/registry"
    val json = """{"type":"record","name":"ev","fields":[
        {"name":"id","type":"long"},{"name":"name","type":["null","string"],"default":null}]}"""
    AvroWire.Registry.register(spark, regDir, 3, json)
    val reg = AvroWire.Registry.fromDir(spark, regDir)
    import spark.implicits._
    val framed = AvroWire.encode(
        Seq((1L, Some("a")), (2L, None)).toDF("id", "name"), reg, 3)
      .select(col("value"))
    val pill = Seq(Tuple1("not avro at all".getBytes("UTF-8"))).toDF("value")
    framed.union(pill).write.parquet(s"$base/src")

    val Right(cons) = PipelineCli.parse(Array(
      "-t", "test", "--file-source", s"$base/src",
      "--avro-registry", regDir, "--avro-schema-id", "3",
      "--output-dir", s"$base/out", "--checkpoint-dir", s"$base/chk")): @unchecked
    PipelineCli.runConsumer(spark, cons)

    val out = spark.read.parquet(s"$base/out")
    assert(out.schema.fieldNames.toSeq == Seq("b", "id", "name"),
      "sink must persist the b projection plus the decoded typed columns")
    val rows = out.select(col("id"), col("name"), col("b")).collect()
    assert(rows.length == 3)
    val decoded = rows.filter(!_.isNullAt(0))
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(decoded === Set((1L, Some("a")), (2L, None)))
    // the pill: NULL decoded columns, b falls back to the reference's
    // UTF-8 projection (valid UTF-8 here, so the raw text survives)
    val pillRow = rows.filter(_.isNullAt(0))
    assert(pillRow.length == 1 && pillRow.head.getString(2) == "not avro at all",
      "a poison pill must not fail the stream and must keep the b fallback")
  }
}
