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
  * Full family parity (same session as v1): the per-bucket band BLOOM
  * sidecar (FP-only, bloom-ahead, per-bucket saturation — shared
  * [[BloomSidecar]] machinery; an all-miss batch never opens the bands
  * table) and the lifecycle verbs [[compact]] (intent marker +
  * roll-forward), [[retract]], [[expire]], [[merge]] with the twins'
  * crash contracts. Zero-norm, non-finite (NaN/±Inf element), or
  * null/empty embeddings are dropped at ingest (a NaN cosine can
  * neither suppress nor be suppressed — dropping beats carrying rows
  * no probe can ever match).
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

  // ---------------------------------------------------------------------
  // Per-bucket bloom pre-filter over the band index — the FuzzyIngest
  // design ported verbatim (shared machinery: BloomSidecar; same FP-only
  // / bloom-ahead / replay / per-bucket-saturation contracts): bands the
  // sketch rules out are DEFINITELY candidate-free, and an all-miss
  // batch never opens the bands table.
  // ---------------------------------------------------------------------

  private def bloomDir(indexDir: String) = s"$indexDir/bands_bloom"
  private def bandBucket: org.apache.spark.sql.Column =
    pmod(hash(col("band"), col("bh")), lit(IndexBuckets)).cast("int")
  private def bandKey: org.apache.spark.sql.Column =
    xxhash64(col("band"), col("bh"))
  private def bloomKeyed(bands: DataFrame): DataFrame =
    bands.select(bandBucket.as("__b"), bandKey.as("__k"))
  private def defaultCapacity(s: SparkSession): Long =
    s.conf.getOption(CorpusIngest.CapacityConf).map(_.toLong)
      .getOrElse(CorpusIngest.DefaultBucketCapacity)

  private[graft] def loadBloomState(s: SparkSession,
      indexDir: String): Option[BloomSidecar.State] =
    BloomSidecar.load(s, bloomDir(indexDir), IndexBuckets)

  private[graft] def probeColumn(s: SparkSession,
      st: BloomSidecar.State): org.apache.spark.sql.Column =
    BloomSidecar.probeColumn(s, st, IndexBuckets, bandBucket, bandKey)

  private def rebuildBlooms(s: SparkSession, indexDir: String): Unit = {
    val bandT = bandTable(s, indexDir)
    val maxAfter = s.table(bandT).agg(max(col("batch"))).head().getAs[Number](0)
    if (maxAfter != null)
      BloomSidecar.rebuild(s, bloomDir(indexDir), IndexBuckets,
        bloomKeyed(s.table(bandT)), maxAfter.longValue, defaultCapacity(s),
        CorpusIngest.MaxBucketCapacity)
  }

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
    * per (plane × dim) element). Drops null/empty/zero-norm/non-finite
    * vectors.
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
          // non-finite (any NaN/±Inf element) joins zero-norm at the door:
          // a NaN vector's plane dots are all NaN, so its sign bits are a
          // deterministic all-zero fp (Java NaN >= 0 is false) — it would
          // never FIND candidates yet history could never suppress IT,
          // silently diverging from any engine whose float comparisons
          // order NaN greatest (Spark SQL, DuckDB). Found by the r13
          // float-edges wave as a 1-row n_new drift.
          if (n2 == 0.0 || !java.lang.Double.isFinite(n2)) None
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

  /** Band b's 16-bit chunk of `fp` as a scalar column. */
  private def bhOf(b: Int): org.apache.spark.sql.Column =
    expr(s"shiftrightunsigned(fp, ${b * BitsPerBand}) & ${(1L << BitsPerBand) - 1}")

  /** TRUE iff ANY of the row's 4 band keys probes probable — the scalar
    * (non-exploded) form of the bloom pre-filter, usable inside an
    * aggregate over the signed frame. The (bucket, key) expressions MUST
    * mirror [[bandBucket]]/[[bandKey]] over (lit(b), bhOf(b)).
    */
  private def anyBandProbable(
      probe: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until NumBands).map { b =>
      probe(pmod(hash(lit(b), bhOf(b)), lit(IndexBuckets)).cast("int"),
        xxhash64(lit(b), bhOf(b)))
    }.reduce(_ || _)

  /** (id, band, bh) postings of each row's fingerprint — ONE projection
    * (r13: the first cut exploded a band-index sequence and JOINED the
    * fingerprints back on vec_id, a real shuffle per call — and this is
    * called up to three times per ingest batch).
    */
  private[graft] def bandsOf(df: DataFrame, idCol: String = "vec_id"): DataFrame =
    df.select(col(idCol),
      posexplode(expr(
        s"transform(sequence(0, ${NumBands - 1}), " +
          s"b -> shiftrightunsigned(fp, b * $BitsPerBand) & ${(1L << BitsPerBand) - 1})"))
        .as(Seq("band", "bh")))

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
    if (vecOk && bandOk) rollForward(s, indexDir) // heal a crashed compact
    vecOk && bandOk
  }

  /** Complete a crashed [[compact]] — the family's one-entry redo-log
    * protocol (no-op without a pending intent marker; lease semantics as
    * in the twins: steal a crashed writer's expired lease, release when
    * this call took it).
    */
  private def rollForward(s: SparkSession, indexDir: String): Unit =
    IngestPaths.readMarker(s, indexDir).foreach { upToBatch =>
      val ownedBefore = IngestPaths.readLease(s, indexDir)
        .exists(_._1 == IngestPaths.leaseOwner)
      IngestPaths.acquireLease(s, indexDir)
      try {
        if (s.catalog.tableExists(vecTable(s, indexDir)) &&
            s.catalog.tableExists(bandTable(s, indexDir))) {
          s.catalog.refreshTable(vecTable(s, indexDir))
          s.catalog.refreshTable(bandTable(s, indexDir))
          runCompaction(s, indexDir, upToBatch)
        }
        IngestPaths.clearMarker(s, indexDir)
      } finally if (!ownedBefore) IngestPaths.releaseLease(s, indexDir)
    }

  /** Consolidate every index partition with `batch <= upToBatch` into
    * the reserved [[CorpusIngest.CompactedBatch]] partition of BOTH
    * tables — the family compaction (partition/file count stops growing
    * O(lifetime), bucket specs survive). Same replay rule (`upToBatch`
    * strictly below the newest batch) and crash-atomicity protocol
    * (durable intent marker, rolled forward by the next
    * [[ingestBatch]]/[[index]]/[[compact]] call, cleared last).
    */
  def compact(s: SparkSession, indexDir: String, upToBatch: Long): Unit = {
    require(reconcile(s, indexDir), s"no embed index at $indexDir")
    IngestPaths.acquireLease(s, indexDir)
    val vecT = vecTable(s, indexDir); val bandT = bandTable(s, indexDir)
    s.catalog.refreshTable(vecT); s.catalog.refreshTable(bandT)
    val maxBatch = s.table(vecT).agg(max(col("batch"))).head().getAs[Number](0)
    require(maxBatch != null && upToBatch < maxBatch.longValue,
      s"compact(upToBatch=$upToBatch): the newest batch ($maxBatch) may " +
        "still replay under foreachBatch's at-least-once contract")
    IngestPaths.writeMarker(s, indexDir, upToBatch)
    runCompaction(s, indexDir, upToBatch)
    IngestPaths.clearMarker(s, indexDir)
  }

  /** The compaction body — idempotent from any crash point (same
    * consolidate→drop shape as the twins; vecs first, bands second,
    * matching the ingest write order).
    */
  private def runCompaction(s: SparkSession, indexDir: String,
      upToBatch: Long): Unit = {
    val vecT = vecTable(s, indexDir); val bandT = bandTable(s, indexDir)
    val sentinel = CorpusIngest.CompactedBatch
    val fresh = Seq(vecT, bandT).exists { t =>
      !s.table(t).filter(col("batch") <= upToBatch &&
        col("batch") =!= sentinel).isEmpty
    }
    if (!fresh) {
      // manual compact() is the documented recovery path for a deleted
      // or saturated bloom sidecar (family contract)
      val st = loadBloomState(s, indexDir)
      if (st.isEmpty ||
          st.exists(b => (0 until IndexBuckets).exists(b.saturated)))
        rebuildBlooms(s, indexDir)
      return
    }
    def consolidate(tbl: String, path: String, dedup: DataFrame => DataFrame,
        insertCols: String): Unit = {
      val toMerge = s.table(tbl).filter(col("batch") <= upToBatch)
      if (toMerge.isEmpty) return
      val staged = dedup(toMerge).localCheckpoint(true)
      try {
        val view = stageView(s, indexDir)
        staged.createOrReplaceTempView(view)
        try s.sql(s"""INSERT OVERWRITE TABLE `$tbl` PARTITION (batch=$sentinel)
                     |SELECT $insertCols FROM `$view`""".stripMargin)
        finally s.catalog.dropTempView(view)
        // re-assert the writer lease before the destructive drop phase
        IngestPaths.acquireLease(s, indexDir)
        val (fs, p) = fsOf(s, path)
        fs.listStatus(p).filter(_.isDirectory).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("batch=")) {
            val v = n.stripPrefix("batch=").toLong
            if (v <= upToBatch && v != sentinel) {
              fs.delete(st.getPath, true)
              s.sql(s"ALTER TABLE `$tbl` DROP IF EXISTS PARTITION (batch=$v)")
            }
          }
        }
        s.catalog.refreshTable(tbl)
      } finally staged.unpersist()
    }
    val wd = Window.partitionBy(col("vec_id"))
      .orderBy(col("first_batch"), col("batch"))
    consolidate(vecT, vecPath(indexDir),
      df => df.withColumn("__rn", row_number().over(wd))
        .filter(col("__rn") === 1)
        .select(col("vec_id"), col("label"), col("embedding"), col("nrm"),
          col("fp"), col("first_batch")),
      "vec_id, label, embedding, nrm, fp, first_batch")
    consolidate(bandT, bandPath(indexDir),
      df => df.select(col("band"), col("bh"), col("vec_id")).distinct(),
      "band, bh, vec_id")
    // rebuild the band sketches sized to bucket population (clears any
    // per-batch-capacity saturation — the family contract)
    rebuildBlooms(s, indexDir)
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
    // SPARK_GRAFT_INGEST_TIMING=1 → one stderr line per driver action
    // (stage attribution for the per-batch constants; off = zero cost)
    val trace = sys.env.contains("SPARK_GRAFT_INGEST_TIMING")
    var t0 = System.nanoTime()
    def mark(stage: String): Unit = if (trace) {
      val t1 = System.nanoTime()
      System.err.println(f"[embed_ingest b=$batchId] $stage%-14s ${(t1 - t0) / 1e9}%.2fs")
      t0 = t1
    }
    IngestPaths.acquireLease(s, indexDir)
    val exists = reconcile(s, indexDir)
    mark("reconcile")
    val signed0 = fingerprints(batch)
    val w = Window.partitionBy(col("fp"), col("embedding")).orderBy(col("vec_id"))
    val wAll = Window.partitionBy(col("fp"), col("embedding"))
    val signed = signed0
      .withColumn("__rn", row_number().over(w))
      .withColumn("__grp", count(lit(1)).over(wAll))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val st = if (exists) loadBloomState(s, indexDir) else None
      val probe = st.map(bs => BloomSidecar.probeFn(s, bs, IndexBuckets))
      // Arrival counts + cache materialization + the bloom pre-probe in
      // ONE action (r13; this replaced a raw batch.count() at the end
      // AND a separate probe-count job). docsIn counts the NON-DEGENERATE
      // rows delivered (null/empty/zero-norm/non-finite vectors are
      // dropped pre-kernel by this object's contract); uniqueIn is the
      // post-exact-dedup survivor count, so `suppressed` is meaningful
      // for the embed pipeline too (it was -1 before r13). The probe is
      // a SCALAR any-band column over fp — no band explosion needed to
      // decide the all-miss skip — sharing one broadcast bank with the
      // exploded probe-side filter below.
      val arrivedCols = Seq(coalesce(sum(col("__grp")), lit(0L)).as("d"),
        count(lit(1)).as("u")) ++
        probe.map(p => coalesce(sum(when(anyBandProbable(p), lit(1L))),
          lit(0L)).as("p")).toSeq
      val arrived = signed.agg(arrivedCols.head, arrivedCols.tail: _*).head()
      val docsIn = arrived.getLong(0)
      val uniqueIn = arrived.getLong(1)
      val bloomProbable = if (probe.isDefined) arrived.getLong(2) else -1L
      mark("sign+dedup+probe")
      val survivors =
        if (!exists) signed
        else {
          val newBands = bandsOf(signed)
          // bloom pre-filter: bands the sketch has never seen are
          // definitely candidate-free — when NONE probe probable, the
          // bands table's data files are never opened this batch
          val probed = probe match {
            case Some(p) =>
              if (bloomProbable == 0) None
              else Some(newBands.filter(p(bandBucket, bandKey)))
            case None => Some(newBands)
          }
          probed match {
            case None => signed
            case Some(bands) =>
              val idx = s.table(bandTable(s, indexDir))
                .filter(col("batch") =!= batchId)
                .select(col("band"), col("bh"), col("vec_id").as("old_id"))
              val cand = bands.alias("n").join(idx.alias("o"),
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
        }
      val staged = survivors
        .select(col("vec_id"), col("label"), col("embedding"), col("nrm"), col("fp"))
        .localCheckpoint(true)
      try {
        mark("verify+stage")
        val appended = staged.count()
        mark("staged_count")
        // bloom-ahead of both inserts (survivors' bands only): a crash
        // between the merge and the inserts leaves FP-only sketch state
        // — the family contract
        if (appended > 0 || !exists)
          BloomSidecar.merge(s, bloomDir(indexDir), IndexBuckets, batchId,
            bloomKeyed(bandsOf(staged).select(col("band"), col("bh"))),
            st, exists, defaultCapacity(s))
        mark("bloom_merge")
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
          mark("write_vecs")
          bandsOf(staged).select(col("band"), col("bh"), col("vec_id"))
            .withColumn("batch", lit(batchId)).write.mode("overwrite")
            .partitionBy("batch")
            .bucketBy(IndexBuckets, "band", "bh").sortBy("band", "bh")
            .option("path", bandPath(indexDir))
            .saveAsTable(bandTable(s, indexDir))
          mark("write_bands")
        } else {
          // vecs BEFORE bands (the family's crash ordering: a band row
          // whose vector is missing would make a candidate verify
          // against nothing; the reverse gap only delays suppression
          // until replay)
          insertInto(vecTable(s, indexDir),
            staged,
            s"vec_id, label, embedding, nrm, fp, $batchId AS first_batch")
          mark("write_vecs")
          insertInto(bandTable(s, indexDir),
            bandsOf(staged).select(col("band"), col("bh"), col("vec_id")),
            "band, bh, vec_id")
          mark("write_bands")
        }
        IngestEvents.post(IngestEvents.IngestProgress("embed_ingest",
          indexDir, batchId, docsIn, uniqueIn, appended, bloomProbable))
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

  private val VecCols = Seq("vec_id", "label", "embedding", "nrm", "fp",
    "first_batch")
  private val VecColsSql = VecCols.mkString(", ")

  /** RETRACT (takedown) vectors by id — the family verb ported
    * ([[FuzzyIngest.retract]] shape): bands dropped before sigs/vecs,
    * staged static-partition overwrites under the lease, newest REAL
    * batch refused (the consolidated partition never replays),
    * partial-crash re-run contract. Returns vec rows removed.
    */
  def retract(s: SparkSession, indexDir: String, vecIds: DataFrame): Long = {
    require(reconcile(s, indexDir), s"no embed index at $indexDir")
    IngestPaths.acquireLease(s, indexDir)
    val vecT = vecTable(s, indexDir); val bandT = bandTable(s, indexDir)
    s.catalog.refreshTable(vecT); s.catalog.refreshTable(bandT)
    val ids = vecIds.select(col(vecIds.columns.head).cast("long").as("vec_id"))
      .distinct().localCheckpoint(true)
    try {
      val sentinel = CorpusIngest.CompactedBatch
      val maxBatch = s.table(vecT).filter(col("batch") =!= sentinel)
        .agg(max(col("batch"))).head().getAs[Number](0)
      def affected(tbl: String): Map[Long, Long] =
        s.table(tbl).join(ids, Seq("vec_id"), "left_semi")
          .groupBy(col("batch")).agg(count(lit(1)).as("n")).collect()
          .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
      val vecHits = affected(vecT); val bandHits = affected(bandT)
      require(maxBatch == null ||
          (!vecHits.contains(maxBatch.longValue) &&
            !bandHits.contains(maxBatch.longValue)),
        s"retract: ids live in the newest batch ($maxBatch) which may " +
          "still replay under foreachBatch's at-least-once contract and " +
          "would resurrect them - compact first or retract after the " +
          "next batch")
      def rewrite(tbl: String, hits: Map[Long, Long], cols: Seq[String],
          insertCols: String): Unit =
        hits.keys.foreach { v =>
          val staged = s.table(tbl).filter(col("batch") === v)
            .join(ids, Seq("vec_id"), "left_anti")
            .select(cols.map(col): _*)
            .localCheckpoint(true)
          val view = stageView(s, indexDir)
          staged.createOrReplaceTempView(view)
          try s.sql(
            s"""INSERT OVERWRITE TABLE `$tbl` PARTITION (batch=$v)
               |SELECT $insertCols FROM `$view`""".stripMargin)
          finally {
            s.catalog.dropTempView(view)
            staged.unpersist()
          }
        }
      rewrite(bandT, bandHits, Seq("band", "bh", "vec_id"),
        "band, bh, vec_id")
      rewrite(vecT, vecHits, VecCols, VecColsSql)
      s.catalog.refreshTable(vecT); s.catalog.refreshTable(bandT)
      vecHits.values.sum
    } finally ids.unpersist()
  }

  /** EXPIRE (retention) — the family verb ported: whole-partition drops
    * for per-batch partitions, consolidated vecs filtered on
    * `first_batch`, consolidated bands anti-joined against the expired
    * ids, bands before vecs. Returns vec rows removed.
    */
  def expire(s: SparkSession, indexDir: String, olderThanBatch: Long): Long = {
    require(reconcile(s, indexDir), s"no embed index at $indexDir")
    IngestPaths.acquireLease(s, indexDir)
    val vecT = vecTable(s, indexDir); val bandT = bandTable(s, indexDir)
    s.catalog.refreshTable(vecT); s.catalog.refreshTable(bandT)
    val sentinel = CorpusIngest.CompactedBatch
    val maxBatch = s.table(vecT).filter(col("batch") =!= sentinel)
      .agg(max(col("batch"))).head().getAs[Number](0)
    require(maxBatch == null || olderThanBatch < maxBatch.longValue,
      s"expire(olderThanBatch=$olderThanBatch): the newest batch " +
        s"($maxBatch) may still replay under foreachBatch's at-least-once " +
        "contract and must stay")
    var removed = 0L
    def dropOld(tbl: String, path: String, countRows: Boolean): Unit = {
      val (fs, p) = fsOf(s, path)
      fs.listStatus(p).filter(_.isDirectory).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch=")) {
          val v = n.stripPrefix("batch=").toLong
          if (v != sentinel && v <= olderThanBatch) {
            if (countRows)
              removed += s.table(tbl).filter(col("batch") === v).count()
            fs.delete(st.getPath, true)
            s.sql(s"ALTER TABLE `$tbl` DROP IF EXISTS PARTITION (batch=$v)")
          }
        }
      }
      s.catalog.refreshTable(tbl)
    }
    dropOld(bandT, bandPath(indexDir), countRows = false)
    dropOld(vecT, vecPath(indexDir), countRows = true)
    val vecC = s.table(vecT).filter(col("batch") === sentinel)
    val expired = vecC.filter(col("first_batch") <= olderThanBatch)
      .select(col("vec_id")).localCheckpoint(true)
    try {
      val nExpired = expired.count()
      if (nExpired > 0) {
        def rewrite(tbl: String, df: DataFrame, insertCols: String): Unit = {
          val staged = df.localCheckpoint(true)
          val view = stageView(s, indexDir)
          staged.createOrReplaceTempView(view)
          try s.sql(
            s"""INSERT OVERWRITE TABLE `$tbl` PARTITION (batch=$sentinel)
               |SELECT $insertCols FROM `$view`""".stripMargin)
          finally {
            s.catalog.dropTempView(view)
            staged.unpersist()
          }
          s.catalog.refreshTable(tbl)
        }
        rewrite(bandT,
          s.table(bandT).filter(col("batch") === sentinel)
            .join(expired, Seq("vec_id"), "left_anti")
            .select(col("band"), col("bh"), col("vec_id")),
          "band, bh, vec_id")
        rewrite(vecT,
          vecC.filter(col("first_batch") > olderThanBatch)
            .select(VecCols.map(col): _*),
          VecColsSql)
        removed += nExpired
      }
    } finally expired.unpersist()
    removed
  }

  /** MERGE two independently built embed indexes into a FRESH third —
    * the family verb ported, with the cross-index step: `b` vectors
    * within `simThreshold` cosine of SOME `a` vector are suppressed
    * (candidates from a (band,bh) join of the band tables — O(|b| +
    * collisions)), `a` senior. doc-id spaces must be disjoint;
    * destination must not exist. Returns merged vec count.
    */
  def merge(s: SparkSession, aDir: String, bDir: String, dstDir: String,
      simThreshold: Double = 0.99): Long = {
    require(reconcile(s, aDir), s"no embed index at $aDir")
    require(reconcile(s, bDir), s"no embed index at $bDir")
    val (fs, dstPath) = fsOf(s, dstDir)
    require(!fs.exists(dstPath), s"merge destination already exists: $dstDir")
    val aVec = s.table(vecTable(s, aDir))
    val bVec = s.table(vecTable(s, bDir))
    require(aVec.select(col("vec_id"))
        .join(bVec.select(col("vec_id")), "vec_id").isEmpty,
      "vec_id spaces of the two indexes overlap - remap ids before merging")
    val aBands = s.table(bandTable(s, aDir)).select(col("band"), col("bh"), col("vec_id"))
    val bBands = s.table(bandTable(s, bDir)).select(col("band"), col("bh"), col("vec_id"))
    val cand = bBands.alias("n").join(aBands.alias("o"),
        col("n.band") === col("o.band") && col("n.bh") === col("o.bh"))
      .select(col("n.vec_id").as("new_id"), col("o.vec_id").as("old_id"))
      .distinct()
    val dup = cand
      .join(aVec.select(col("vec_id").as("old_id"),
        col("embedding").as("old_emb"), col("nrm").as("old_nrm")), "old_id")
      .join(bVec.select(col("vec_id").as("new_id"),
        col("embedding").as("new_emb"), col("nrm").as("new_nrm")), "new_id")
      .filter(dot(col("new_emb"), col("old_emb")) /
        (col("new_nrm") * col("old_nrm")) >= simThreshold)
      .select(col("new_id").as("vec_id")).distinct()
    val vecsOut = aVec.select(VecCols.map(col): _*)
      .unionByName(bVec.join(dup, Seq("vec_id"), "left_anti")
        .select(VecCols.map(col): _*))
    val bandsOut = aBands
      .unionByName(bBands.join(dup, Seq("vec_id"), "left_anti"))
      .distinct()
    val sentinel = CorpusIngest.CompactedBatch
    vecsOut.withColumn("batch", lit(sentinel)).write
      .partitionBy("batch")
      .bucketBy(IndexBuckets, "vec_id").sortBy("vec_id")
      .option("path", vecPath(dstDir))
      .saveAsTable(vecTable(s, dstDir))
    bandsOut.withColumn("batch", lit(sentinel)).write
      .partitionBy("batch")
      .bucketBy(IndexBuckets, "band", "bh").sortBy("band", "bh")
      .option("path", bandPath(dstDir))
      .saveAsTable(bandTable(s, dstDir))
    rebuildBlooms(s, dstDir)
    s.table(vecTable(s, dstDir)).count()
  }

  /** Every surviving vector with the batch that first saw it. */
  def index(s: SparkSession, indexDir: String): DataFrame =
    s.read.parquet(vecPath(indexDir))
      .select(col("vec_id"), col("label"), col("first_batch").as("batch"))
}
