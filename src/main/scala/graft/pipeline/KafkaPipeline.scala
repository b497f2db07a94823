package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQueryListener, Trigger}
import org.apache.spark.sql.Row

/** Job configuration — the Spark analogue of the reference's `KafkaConfig`
  * (/root/reference/src/main.rs:147-154, populated from CLI flags at
  * main.rs:370-390). `batchSize` doubles as rows-per-output-file, matching
  * the reference's `--num-messages` dual use (main.rs:373-377, 388).
  */
case class PipelineConfig(
    brokers: String = "localhost:9092",
    groupId: String = "example_consumer_group_id",
    topic: String = "test",
    batchSize: Int = 10,
    outputDir: String = "output",
    checkpointDir: String = "checkpoint",
    startingOffsets: String = "earliest")

/** The reference's whole surface, Spark-native: Kafka source → UTF-8
  * projection → size-batched Parquet sink (SURVEY §2.A R1–R12).
  *
  * Deliberate semantic upgrades (SURVEY §7.0): progress lives in the
  * checkpoint WAL (exactly-once with the file sink) instead of
  * commit-before-write at-most-once (main.rs:268); every trigger flushes,
  * so no tail-batch loss (main.rs:258); the full Kafka record is persisted
  * alongside the reference's payload-only `b` column (main.rs:256 vs
  * 113-117). Preserved quirks: null/invalid-UTF-8 payload → "" — never
  * null, never dropped (main.rs:240-247); fail-fast if the output dir
  * already exists (main.rs:285-294).
  */
object KafkaPipeline {

  /** Whether the spark-sql-kafka-0-10 connector is loadable — the
    * readiness probe for the literal `format("kafka")` leg (VERDICT r9
    * #8). Checked by the CLI's startup status line and BrokerSmokeSpec's
    * cancel message, so a connector jar appearing in /opt/spark/jars
    * becomes visible instead of silently changing nothing.
    */
  def kafkaConnectorPresent: Boolean = scala.util.Try(
    Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
  ).isSuccess

  /** R1: streaming Kafka scan. One Spark task per topic-partition per
    * micro-batch — the reference's tokio-task-per-partition layout
    * (main.rs:296-310) is the engine default here.
    */
  def kafkaStream(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", cfg.brokers)
      .option("subscribe", cfg.topic)
      .option("startingOffsets", cfg.startingOffsets)
      .option("includeHeaders", "true")
      .load()

  /** Broker-free stand-in with the Kafka source's schema, for tests and
    * local runs (the connector jar is absent in this container): a file
    * stream over a parquet directory (streaming file sources require a
    * directory; `glob` narrows to specific files), columns renamed to the
    * Kafka contract by the caller.
    */
  def fileStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      glob: String = "*",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(schema)
      .option("pathGlobFilter", glob)
      .options(options)
      .parquet(dir)

  /** Stream a named table of an sf directory through [[fileStream]],
    * handling BOTH fixture layouts: the driver writes `<name>.parquet` as
    * a single FILE (glob on the name), while Spark-written rehearsal data
    * (graft.ScaleUp) produces a DIRECTORY of part files — globbing the
    * name there matches nothing and the stream silently processes ZERO
    * rows, which is exactly how the sf1 decade ran the streaming fixtures
    * on a fixed (empty!) workload (VERDICT r9 #3). Directory ⇒ stream the
    * part files inside it, so the streamed row count derives from the sf
    * dir like every batch query's input does.
    */
  def tableFileStream(spark: SparkSession, sfDir: String, table: String,
      schema: org.apache.spark.sql.types.StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      fileStream(spark, p.toString, schema, glob = "*.parquet", options)
    else
      fileStream(spark, sfDir, schema, glob = s"$table.parquet", options)
  }

  /** R2: payload bytes → UTF-8 string; null or invalid UTF-8 → "" (exactly
    * the reference's `payload_view::<str>()` fallback, main.rs:240-247).
    * Keeps every other record field, unlike the reference which drops them
    * at the sink (main.rs:256).
    */
  def payloadAsString(df: DataFrame): DataFrame =
    df.withColumn("b",
      when(expr("is_valid_utf8(value)"), col("value").cast("string")).otherwise(lit("")))

  /** The reference's output projection: exactly one non-null string column
    * `b` (main.rs:113-117).
    */
  def fidelityProjection(df: DataFrame): DataFrame = payloadAsString(df).select(col("b"))

  /** R6: `create_dir("output")` — panic if it exists (main.rs:285-294).
    * Fail-fast *before* any stream starts.
    */
  def initOutput(path: String): Unit = {
    val p = Paths.get(path)
    require(!Files.exists(p), s"output directory already exists: $path")
    Files.createDirectories(p)
  }

  /** R3+R4+R5: size-batched Parquet sink. `maxRecordsPerFile` reproduces
    * the reference's N-rows-per-file layout (main.rs:258-267); Spark owns
    * file names (the `partition_{p}_batch_{b}` scheme of main.rs:274-283 is
    * carried semantically by partitioning + the per-file row bound).
    * Checkpointed micro-batches replace per-message async offset commits
    * (main.rs:268) — exactly-once end-to-end.
    */
  def parquetSink(df: DataFrame, cfg: PipelineConfig,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", cfg.outputDir)
      .option("checkpointLocation", cfg.checkpointDir)
      .option("maxRecordsPerFile", cfg.batchSize.toLong)
      .trigger(trigger)

  /** R5 exact-name fidelity sink: reproduces the reference's
    * `partition_{p}_batch_{b}.parquet` layout byte-for-byte
    * (main.rs:274-283) — per Kafka partition, every `batchSize` messages
    * (in offset order) become one single-column (`b`) file, with `b`
    * counting up per partition across micro-batches.
    *
    * This mode inherits the reference's own scale ceiling — one file per
    * `batchSize` messages is inherently a small-files layout — but each
    * micro-batch is a single Spark job: one shuffle on (partition, batch),
    * one dynamic-partition write (one file per chunk), one driver-side
    * rename pass. Use [[parquetSink]] unless a downstream consumer globs
    * these names. Tail chunks ARE flushed (the R3 no-tail-loss upgrade;
    * the reference drops a final partial batch).
    */
  def fidelityFileSink(df: DataFrame, cfg: PipelineConfig,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    df.writeStream
      .foreachBatch((batch: DataFrame, _: Long) => writeFidelityBatch(batch, cfg))
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(trigger)

  /** Per-partition batch numbering lives in `<outputDir>/_graft_batch_state`
    * ("p base" lines, underscore-prefixed so parquet readers skip it),
    * written atomically AFTER a micro-batch's files land. A replay of an
    * uncommitted micro-batch therefore recomputes the same batch ids and
    * overwrites its own partial files (`REPLACE_EXISTING`; chunking is
    * deterministic, so names and contents are identical), a driver restart
    * resumes numbering from disk, and a wiped output dir restarts at
    * batch_0. The state write is the naming commit point — a crash landing
    * exactly between it and the checkpoint commit can duplicate one
    * batch's files under new names (torn dual-commit; the default
    * [[parquetSink]] remains the strict exactly-once path).
    */
  private def batchStatePath(dir: String) = Paths.get(dir, "_graft_batch_state")

  private def readBatchBases(dir: String): Map[Int, Int] =
    if (Files.exists(batchStatePath(dir))) {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(batchStatePath(dir)).asScala
        .map(_.trim).filter(_.nonEmpty)
        .map { l =>
          l.split(' ') match {
            case Array(p, b) if p.forall(_.isDigit) && b.forall(_.isDigit) =>
              p.toInt -> b.toInt
            case _ => throw new IllegalStateException(
              s"corrupt line '$l' in ${batchStatePath(dir)} — delete the " +
                "state file AND the partition_*.parquet output it numbers, " +
                "then restart the sink")
          }
        }
        .toMap
    } else Map.empty

  private def writeBatchBases(dir: String, bases: Map[Int, Int]): Unit = {
    val tmp = Paths.get(dir, "._graft_batch_state.tmp")
    Files.writeString(tmp,
      bases.toSeq.sorted.map { case (p, b) => s"$p $b" }.mkString("\n"))
    // same-directory atomic rename: the state write IS the naming commit
    // point, so it must not be observable half-written
    Files.move(tmp, batchStatePath(dir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Test-only failpoint: when set, [[writeFidelityBatch]] throws AFTER
    * the rename pass has moved a micro-batch's files to their final
    * `partition_{p}_batch_{b}` names but BEFORE the batch-state write —
    * the crash window the replay contract above covers (files landed,
    * naming not committed, checkpoint not committed). KafkaPipelineSpec
    * drives a real checkpointed stream into this window and restarts it
    * to pin "no duplicate, no missing file" recovery.
    */
  @volatile private[pipeline] var failAfterRename: Boolean = false

  private def writeFidelityBatch(batch: DataFrame, cfg: PipelineConfig): Unit = {
    import org.apache.spark.sql.expressions.Window
    val bases = readBatchBases(cfg.outputDir)
    // Fail-loud guard: numbered output with NO state file means the
    // numbering history is gone (state deleted, or dir populated by
    // something else) — restarting at batch_0 would silently clobber
    // committed files. The one legitimate no-state case — replaying a
    // crashed FIRST micro-batch — requires wiping the partial files,
    // which this error names. (The consumer path's initOutput fail-fast
    // guards the normal start.)
    if (bases.isEmpty) {
      val preexisting = Option(new java.io.File(cfg.outputDir).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("partition_") &&
          f.getName.endsWith(".parquet"))
      require(preexisting.isEmpty,
        s"${cfg.outputDir} holds ${preexisting.length} numbered parquet " +
          s"files but no ${batchStatePath(cfg.outputDir).getFileName} — " +
          "refusing to renumber from batch_0 over committed output; wipe " +
          "the directory (or restore the state file) and restart")
    }
    // Final batch id is computed inside the plan (base-for-partition +
    // chunk-within-batch, bases broadcast as a map literal), so the whole
    // micro-batch is ONE Spark job: shuffle once on (partition, bid),
    // dynamic-partition write one file per chunk, then a driver-side
    // metadata pass renames part files to the exact-name contract. The
    // repartition guarantees a chunk's rows land in a single task (→ a
    // single file); the sort satisfies the writer's partition-column
    // ordering (so it inserts no extra sort) and keeps offset order inside
    // each file.
    val w = Window.partitionBy(col("partition")).orderBy(col("offset"))
    val baseFor = coalesce(
      try_element_at(typedLit(bases), col("partition")), lit(0))
    val tmp = Paths.get(cfg.outputDir, ".tmp_fidelity")
    KafkaPipeline.payloadAsString(batch)
      .select(col("b"), col("partition").cast("int").as("partition"), col("offset"))
      .withColumn("bid",
        (baseFor + (row_number().over(w) - 1) / cfg.batchSize).cast("int"))
      .repartition(col("partition"), col("bid"))
      .sortWithinPartitions(col("partition"), col("bid"), col("offset"))
      .select(col("b"), col("partition"), col("bid"))
      .write.partitionBy("partition", "bid").mode("overwrite")
      .parquet(tmp.toString)
    // Rename pass: tmp/partition=p/bid=b/part-*.parquet →
    // partition_{p}_batch_{b}.parquet. REPLACE_EXISTING keeps the replay
    // contract: an uncommitted micro-batch recomputes the same names
    // (chunking is deterministic) and overwrites its own partial files.
    val moved = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    Option(tmp.toFile.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("partition="))
      .foreach { pDir =>
        val p = pDir.getName.stripPrefix("partition=").toInt
        pDir.listFiles().filter(d => d.isDirectory && d.getName.startsWith("bid="))
          .foreach { bDir =>
            val b = bDir.getName.stripPrefix("bid=").toInt
            val parts = bDir.listFiles().filter(_.getName.endsWith(".parquet"))
            assert(parts.length == 1,
              s"expected exactly one file for (partition=$p, bid=$b), " +
                s"got ${parts.length} — repartition invariant broken")
            Files.move(parts.head.toPath,
              Paths.get(cfg.outputDir, s"partition_${p}_batch_$b.parquet"),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            moved += ((p, b))
          }
      }
    graft.util.Scratch.delete(tmp.toString)
    if (failAfterRename)
      throw new IllegalStateException(
        "failpoint: crash between rename pass and batch-state write")
    if (moved.nonEmpty)
      writeBatchBases(cfg.outputDir, bases ++ moved.groupBy(_._1).map {
        case (p, bs) => p -> (bs.map(_._2).max + 1)
      })
  }

  /** R10: synthetic producer — n records shaped exactly like the
    * reference's generator: payload "Message {i}", key "Key {i}", one
    * header header_key→header_value (main.rs:74-83). Write with
    * `.write.format("kafka")` in production; the DataFrame itself is the
    * broker-free test fixture.
    */
  def syntheticRecords(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n).select(
      encode(concat(lit("Key "), col("id")), "UTF-8").as("key"),
      encode(concat(lit("Message "), col("id")), "UTF-8").as("value"),
      array(struct(lit("header_key").as("key"),
        encode(lit("header_value"), "UTF-8").as("value"))).as("headers"),
      lit("test").as("topic"),
      (col("id") % 2).cast("int").as("partition"),
      col("id").as("offset"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("timestamp"))

  /** R11: rebalance/commit observability → StreamingQueryListener logging
    * progress and termination (the reference's ConsumerContext callbacks,
    * main.rs:38-54).
    */
  def progressListener(): StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      println(s"[pipeline] query started: ${e.id}")
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      println(s"[pipeline] progress: batch=${e.progress.batchId} rows=${e.progress.numInputRows}")
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      println(s"[pipeline] query terminated: ${e.id}")
  }
}
