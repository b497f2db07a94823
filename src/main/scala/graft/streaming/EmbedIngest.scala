package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFns.{dot, norm => vnorm}

/** Incremental SEMANTIC (embedding-cosine) corpus ingestion — the third
  * member of the persistent-dedup family beside [[CorpusIngest]] (exact
  * digests) and [[FuzzyIngest]] (MinHash over text shingles), covering
  * the case neither can see: a paraphrase or re-encode whose TEXT is
  * new but whose embedding sits within `simThreshold` cosine of
  * something already ingested (the SemDeDup setting).
  *
  * LSH design: each vector gets a 64-bit SIGN fingerprint — bit i is
  * the sign of ⟨v, r_i⟩ against 64 deterministic Rademacher hyperplanes
  * (entries ±1 from a splitmix64 mix of (plane, dim); fixed seeds, so
  * the index is reproducible run-to-run) — banded into 4 × 16-bit
  * chunks. By pigeonhole, any two fingerprints within hamming distance
  * 3 share at least one chunk EXACTLY (the simhashPairs recall
  * contract), and sign bits flip with probability θ/π, so near-dup
  * vectors (cosine ≥ 0.99 ⇒ θ ≤ 8°, expected hamming ≈ 64·0.045 < 3)
  * are caught with near-certainty; a POSITIVE rescale of a vector
  * changes NO sign, so re-encodes land in identical buckets by
  * construction. Candidates are verified with the EXACT cosine (the
  * same codegen dot/norm expression the similarity family hash-matches
  * against DuckDB), so suppression is exact-on-candidates: the only
  * approximation is band recall.
  *
  * Scale shape (the [[FuzzyIngest]] layout): state is TWO bucketed
  * tables under `indexDir` — `vecs` (vec_id, label, embedding, nrm, fp,
  * first_batch, batch) CLUSTERED BY vec_id and `bands` (band, bh,
  * vec_id, batch) CLUSTERED BY (band, bh) — so a micro-batch's probe
  * joins its ~4·|batch| band keys against the bands table and verifies
  * only the candidates against `vecs`: per-batch cost O(batch +
  * candidates), never O(corpus). Replay idempotence: static partition
  * overwrite of `batch=<id>` plus self-exclusion in the probe, the
  * family contract. Writer lease as in the twins.
  *
  * v1 scope (deliberate): no bloom sidecar and no compact/retract/
  * expire/merge yet — the patterns are proven on both twins and port
  * directly; recorded in ADVICE so the gap is visible, not silent.
  * Zero-norm or null/empty embeddings are dropped at ingest (a NaN
  * cosine can neither suppress nor be suppressed — dropping beats
  * carrying rows no probe can ever match).
  */
object EmbedIngest {

  val IndexBuckets = 16
  val NumPlanes = 64
  val NumBands = 4
  val BitsPerBand = 16

  def vecTable(s: SparkSession, indexDir: String): String =
    "graft_embed_vecs_" + IngestPaths.digest(s, indexDir)
  def bandTable(s: SparkSession, indexDir: String): String =
    "graft_embed_bands_" + IngestPaths.digest(s, indexDir)

  private def vecPath(indexDir: String) = s"$indexDir/vecs"
  private def bandPath(indexDir: String) = s"$indexDir/bands"

  private def fsOf(s: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def stageView(s: SparkSession, indexDir: String): String =
    "graft_embed_stage_" + IngestPaths.digest(s, indexDir)

  /** ±1 hyperplane entry for (plane, dim) — splitmix64 parity bit. */
  @inline private def rademacher(plane: Int, dim: Int): Double = {
    var h = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
    h ^= (h >>> 27); h *= 0x94D049BB133111EBL
    h ^= (h >>> 31)
    if ((java.lang.Long.bitCount(h) & 1) == 0) 1.0 else -1.0
  }

  /** (vec_id, label, embedding, nrm, fp) — per-partition kernel (64
    * plane dots per row; the HOF form would re-evaluate its lambda
    * per (plane × dim) element). Drops null/empty/zero-norm vectors.
    */
  private[graft] def fingerprints(batch: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    batch
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id").cast("long"), col("label").cast("int"),
        col("embedding"))
      // Option[Int]: a null label (adversarial fixture row) must ride
      // through the kernel, not crash the non-nullable tuple encoder
      .as[(Long, Option[Int], Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, label, emb) =>
          var n2 = 0.0
          var d = 0
          while (d < emb.length) { n2 += emb(d).toDouble * emb(d); d += 1 }
          if (n2 == 0.0) None
          else {
            var fp = 0L
            var p = 0
            while (p < NumPlanes) {
              var acc = 0.0
              var i = 0
              while (i < emb.length) { acc += emb(i) * rademacher(p, i); i += 1 }
              if (acc >= 0) fp |= (1L << p)
              p += 1
            }
            Some((id, label, emb, math.sqrt(n2), fp))
          }
        }
      }
      .toDF("vec_id", "label", "embedding", "nrm", "fp")
  }

  private def bandsOf(df: DataFrame): DataFrame =
    df.select(col("vec_id"), explode(sequence(lit(0), lit(NumBands - 1))).as("band"))
      .join(df.select(col("vec_id"), col("fp")), "vec_id")
      .select(col("vec_id"), col("band"),
        expr(s"shiftrightunsigned(fp, band * $BitsPerBand) & ${(1L << BitsPerBand) - 1}")
          .as("bh"))

  private[graft] def reconcile(s: SparkSession, indexDir: String): Boolean = {
    val (fs, _) = fsOf(s, indexDir)
    def one(tbl: String, path: String, ddl: String): Boolean = {
      val exists = fs.exists(new Path(path)) &&
        fs.listStatus(new Path(path)).nonEmpty
      if (!exists && s.catalog.tableExists(tbl)) s.sql(s"DROP TABLE `$tbl`")
      if (exists && !s.catalog.tableExists(tbl)) {
        s.sql(ddl); s.catalog.recoverPartitions(tbl)
      }
      s.catalog.tableExists(tbl)
    }
    val vecOk = one(vecTable(s, indexDir), vecPath(indexDir),
      s"""CREATE TABLE `${vecTable(s, indexDir)}` (
         |  vec_id BIGINT, label INT, embedding ARRAY<FLOAT>, nrm DOUBLE,
         |  fp BIGINT, first_batch BIGINT, batch BIGINT)
         |USING PARQUET PARTITIONED BY (batch)
         |CLUSTERED BY (vec_id) SORTED BY (vec_id) INTO $IndexBuckets BUCKETS
         |LOCATION '${vecPath(indexDir)}'""".stripMargin)
    val bandOk = one(bandTable(s, indexDir), bandPath(indexDir),
      s"""CREATE TABLE `${bandTable(s, indexDir)}` (
         |  band INT, bh BIGINT, vec_id BIGINT, batch BIGINT)
         |USING PARQUET PARTITIONED BY (batch)
         |CLUSTERED BY (band, bh) SORTED BY (band, bh) INTO $IndexBuckets BUCKETS
         |LOCATION '${bandPath(indexDir)}'""".stripMargin)
    vecOk && bandOk
  }

  /** One ingest merge — batch columns `(vec_id, embedding, label)`.
    * Within-batch EXACT dedup (identical embedding → min vec_id; the
    * within-batch NEAR-dup case is deliberately not collapsed, matching
    * [[FuzzyIngest]]'s default), then LSH-probe + exact-cosine verify
    * against history, then append survivors to both tables.
    */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      indexDir: String, simThreshold: Double = 0.99): Unit = {
    require(batchId != CorpusIngest.CompactedBatch,
      s"batch id ${CorpusIngest.CompactedBatch} is reserved")
    val s = batch.sparkSession
    IngestPaths.acquireLease(s, indexDir)
    val exists = reconcile(s, indexDir)
    val signed0 = fingerprints(batch)
    val w = Window.partitionBy(col("fp"), col("embedding")).orderBy(col("vec_id"))
    val signed = signed0
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val survivors =
        if (!exists) signed
        else {
          val newBands = bandsOf(signed)
          val idx = s.table(bandTable(s, indexDir))
            .filter(col("batch") =!= batchId)
            .select(col("band"), col("bh"), col("vec_id").as("old_id"))
          val cand = newBands.alias("n").join(idx.alias("o"),
              col("n.band") === col("o.band") && col("n.bh") === col("o.bh"))
            .select(col("n.vec_id").as("new_id"), col("old_id")).distinct()
          val oldVecs = s.table(vecTable(s, indexDir))
            .filter(col("batch") =!= batchId)
            .select(col("vec_id").as("old_id"),
              col("embedding").as("old_emb"), col("nrm").as("old_nrm"))
          val dup = cand
            .join(oldVecs, "old_id")
            .join(signed.select(col("vec_id").as("new_id"),
              col("embedding").as("new_emb"), col("nrm").as("new_nrm")), "new_id")
            .filter(dot(col("new_emb"), col("old_emb")) /
              (col("new_nrm") * col("old_nrm")) >= simThreshold)
            .select(col("new_id").as("vec_id")).distinct()
          signed.join(dup, Seq("vec_id"), "left_anti")
        }
      val staged = survivors
        .select(col("vec_id"), col("label"), col("embedding"), col("nrm"), col("fp"))
        .localCheckpoint(true)
      try {
        val appended = staged.count()
        def insertInto(tbl: String, df: DataFrame, cols: String): Unit = {
          val view = stageView(s, indexDir)
          df.createOrReplaceTempView(view)
          try s.sql(s"""INSERT OVERWRITE TABLE `$tbl` PARTITION (batch=$batchId)
                       |SELECT $cols FROM `$view`""".stripMargin)
          finally s.catalog.dropTempView(view)
        }
        if (!exists) {
          staged.withColumn("first_batch", lit(batchId))
            .withColumn("batch", lit(batchId)).write.mode("overwrite")
            .partitionBy("batch")
            .bucketBy(IndexBuckets, "vec_id").sortBy("vec_id")
            .option("path", vecPath(indexDir))
            .saveAsTable(vecTable(s, indexDir))
          bandsOf(staged).select(col("band"), col("bh"), col("vec_id"))
            .withColumn("batch", lit(batchId)).write.mode("overwrite")
            .partitionBy("batch")
            .bucketBy(IndexBuckets, "band", "bh").sortBy("band", "bh")
            .option("path", bandPath(indexDir))
            .saveAsTable(bandTable(s, indexDir))
        } else {
          // vecs BEFORE bands (the family's crash ordering: a band row
          // whose vector is missing would make a candidate verify
          // against nothing; the reverse gap only delays suppression
          // until replay)
          insertInto(vecTable(s, indexDir),
            staged,
            s"vec_id, label, embedding, nrm, fp, $batchId AS first_batch")
          insertInto(bandTable(s, indexDir),
            bandsOf(staged).select(col("band"), col("bh"), col("vec_id")),
            "band, bh, vec_id")
        }
        IngestEvents.post(IngestEvents.IngestProgress("embed_ingest",
          indexDir, batchId, batch.count(), -1L, appended, -1L))
      } finally staged.unpersist()
    } finally signed.unpersist()
  }

  /** Streaming entry — foreachBatch over [[ingestBatch]], the family
    * shape.
    */
  def embedIngest(vecs: DataFrame, indexDir: String, checkpointDir: String,
      simThreshold: Double = 0.99)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch, id, indexDir, simThreshold)
      }
      .start()

  /** Every surviving vector with the batch that first saw it. */
  def index(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(vecPath(indexDir))
      .select(col("vec_id"), col("label"), col("first_batch").as("batch"))
}
