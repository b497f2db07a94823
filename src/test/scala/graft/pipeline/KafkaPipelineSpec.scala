package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Reference-semantics suite (SURVEY §2.A / FIXTURES.md §A):
  * R2 invalid-UTF-8 → "", R3 rows-per-file batching, R6 fail-fast dir,
  * R10 synthetic producer shape — driven through a real streaming query.
  */
class KafkaPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("tableFileStream reads BOTH fixture layouts: single file and part-file dir") {
    // driver testdata ships <name>.parquet as a FILE; ScaleUp rehearsal
    // data writes it as a DIRECTORY — globbing the name there matched
    // nothing and the r9 scale decade streamed an EMPTY workload
    val base = graft.util.Scratch.fresh("tfs_spec")
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    // dir layout: <base>/dir/tbl.parquet/part-*.parquet
    rows.write.parquet(s"$base/dir/tbl.parquet")
    // file layout: <base>/file/tbl.parquet (single file, exact name)
    rows.coalesce(1).write.parquet(s"$base/tmp")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/file"))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/tmp"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$base/file/tbl.parquet"))

    def drain(sfDir: String): Long = {
      val schema = spark.read.parquet(s"$sfDir/tbl.parquet").schema
      val out = s"$sfDir/out"
      KafkaPipeline.tableFileStream(spark, sfDir, "tbl", schema)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", s"$sfDir/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(drain(s"$base/dir") == 3L, "directory layout must stream all rows")
    assert(drain(s"$base/file") == 3L, "file layout must stream all rows")
  }

  test("R10: synthetic records match the reference producer shape") {
    val rows = KafkaPipeline.syntheticRecords(spark, 3)
      .select(col("key").cast("string"), col("value").cast("string"),
        col("headers")(0)("key"), col("headers")(0)("value").cast("string"),
        col("topic"), col("partition"))
      .as[(String, String, String, String, String, Int)].collect().sortBy(_._1)
    assert(rows(0) == (("Key 0", "Message 0", "header_key", "header_value", "test", 0)))
    assert(rows(1) == (("Key 1", "Message 1", "header_key", "header_value", "test", 1)))
  }

  test("R2: null payload and invalid UTF-8 map to empty string, valid passes through") {
    val df = Seq(
      (1, "hello".getBytes("UTF-8")),
      (2, Array[Byte](-1, -2, -57)), // invalid UTF-8
      (3, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "value")
    val out = KafkaPipeline.payloadAsString(df)
      .select("id", "b").as[(Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1, "hello")))
    assert(out(1) == ((2, "")), "invalid UTF-8 must map to empty string")
    assert(out(2) == ((3, "")), "null payload must map to empty string")
  }

  test("R6: initOutput fails fast when the directory already exists") {
    val dir = Files.createTempDirectory("graft_init").toString
    intercept[IllegalArgumentException] { KafkaPipeline.initOutput(dir) }
    val fresh = dir + "/new"
    KafkaPipeline.initOutput(fresh) // must not throw
    assert(new java.io.File(fresh).isDirectory)
  }

  test("R7 upgrade: checkpoint restart resumes exactly-once — no re-writes, no loss") {
    val base = Files.createTempDirectory("graft_ckpt").toString
    val srcDir = s"$base/src"
    val cfg = PipelineConfig(batchSize = 50,
      outputDir = s"$base/out", checkpointDir = s"$base/chk")
    KafkaPipeline.initOutput(cfg.outputDir)

    // wave 1: 100 records land, stream drains and stops
    KafkaPipeline.syntheticRecords(spark, 100).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = KafkaPipeline.parquetSink(
        KafkaPipeline.fidelityProjection(
          KafkaPipeline.fileStream(spark, srcDir, schema)),
        cfg, Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(cfg.outputDir).count() == 100)

    // wave 2: 60 more records appear; SAME checkpoint → only the new
    // files are processed (the reference's commit-before-write loop
    // could lose a buffered batch here and re-consume after restart)
    KafkaPipeline.syntheticRecords(spark, 60)
      .withColumn("value",
        encode(concat(lit("Wave2 "), col("offset").cast("string")), "UTF-8"))
      .write.mode("append").parquet(srcDir)
    runOnce()
    val out = spark.read.parquet(cfg.outputDir)
    assert(out.count() == 160, "restart must process exactly the new records")
    assert(out.select("b").distinct().count() ==
      spark.read.parquet(srcDir).select(col("value").cast("string")).distinct().count(),
      "no duplicates, no losses across restart")
  }

  test("R5 crash recovery: kill between rename pass and state write, restart clean") {
    // VERDICT r8 item 5: the exactly-once claim for the fidelity sink,
    // pinned by an actual interrupted run — files renamed, batch state
    // NOT written, checkpoint NOT committed; the restart must replay the
    // micro-batch onto the SAME names (deterministic chunking +
    // REPLACE_EXISTING) with no duplicate and no missing file.
    val base = Files.createTempDirectory("graft_crash").toString
    val src = s"$base/src"
    KafkaPipeline.syntheticRecords(spark, 20).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val cfg = PipelineConfig(batchSize = 5,
      outputDir = s"$base/out", checkpointDir = s"$base/chk")
    KafkaPipeline.initOutput(cfg.outputDir)
    def start() = KafkaPipeline.fidelityFileSink(
      KafkaPipeline.fileStream(spark, src, schema), cfg).start()

    // wave 1 commits normally: batches 0..1 per partition, state written
    val q1 = start(); q1.awaitTermination()
    val statePath = java.nio.file.Paths.get(cfg.outputDir, "_graft_batch_state")
    val stateAfterWave1 = Files.readString(statePath)

    // wave 2 lands, and the crash hits inside its micro-batch
    KafkaPipeline.syntheticRecords(spark, 20)
      .withColumn("offset", col("offset") + 20)
      .withColumn("value",
        encode(concat(lit("Wave2 "), col("offset").cast("string")), "UTF-8"))
      .write.mode("append").parquet(src)
    KafkaPipeline.failAfterRename = true
    try {
      val q2 = start()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.awaitTermination()
      }
    } finally KafkaPipeline.failAfterRename = false
    // the torn window is real: wave-2 files already renamed into place...
    val crashed = new java.io.File(cfg.outputDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    assert(crashed.contains("partition_0_batch_2.parquet"),
      s"crash must land AFTER the rename pass: $crashed")
    // ...but the naming commit did not happen
    assert(Files.readString(statePath) == stateAfterWave1,
      "crash must land BEFORE the batch-state write")

    // restart from the same checkpoint: the uncommitted micro-batch
    // replays onto the same names
    val q3 = start(); q3.awaitTermination()
    val names = new java.io.File(cfg.outputDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSet
    val expected = (for (p <- 0 to 1; b <- 0 to 3)
      yield s"partition_${p}_batch_$b.parquet").toSet
    assert(names == expected,
      s"no duplicate, no missing file after recovery: got $names")
    val out = spark.read.parquet(cfg.outputDir + "/*.parquet")
    assert(out.count() == 40, "every record exactly once")
    assert(out.distinct().count() == 40, "no replayed duplicates")
    // an overwritten replay file carries the right rows in offset order
    val b2 = spark.read.parquet(s"${cfg.outputDir}/partition_0_batch_2.parquet")
      .as[String].collect()
    assert(b2.toSeq == (20 to 28 by 2).map(i => s"Wave2 $i"), s"got ${b2.toSeq}")
    // and the naming commit is now durable
    assert(Files.readString(statePath) != stateAfterWave1)
  }

  test("R3+R4: streaming sink writes at most batchSize rows per file, no tail loss") {
    val base = Files.createTempDirectory("graft_sinkspec").toString
    val srcDir = s"$base/src"
    val n = 105L; val batch = 10
    KafkaPipeline.syntheticRecords(spark, n)
      .write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val cfg = PipelineConfig(batchSize = batch,
      outputDir = s"$base/out", checkpointDir = s"$base/chk")
    KafkaPipeline.initOutput(cfg.outputDir)
    val q = KafkaPipeline.parquetSink(
      KafkaPipeline.fidelityProjection(
        KafkaPipeline.fileStream(spark, srcDir, schema)),
      cfg, Trigger.AvailableNow()).start()
    q.awaitTermination()

    val files = new java.io.File(cfg.outputDir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val counts = files.map(f => spark.read.parquet(f.getPath).count())
    assert(counts.forall(_ <= batch), s"file over batchSize: ${counts.mkString(",")}")
    assert(counts.sum == n, "no tail-batch loss: every row lands")
    // fidelity schema: exactly one string column named b
    val out = spark.read.parquet(cfg.outputDir)
    assert(out.schema.fieldNames.toSeq == Seq("b"))
    assert(out.filter(col("b").startsWith("Message ")).count() == n)
  }
}
