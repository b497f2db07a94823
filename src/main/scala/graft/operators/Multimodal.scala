package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.B / BASELINE.json north-star).
  *
  * Images/audio/video are carried as opaque `BinaryType` columns next to
  * typed metadata — the lakehouse-standard layout. The actual media decode
  * is STUBBED with a deterministic fake (this container has no image/audio
  * libraries); everything around it — schema, batched per-partition
  * processing, metadata extraction, frame sampling — is real Spark and is
  * what matters at 100 TB: the decode is a pure map over partitions, so it
  * scales with executor count and never shuffles.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, checksum: Long)

  /** Attach a fake binary "image" column derived from the text (stand-in
    * for a real payload read from object storage).
    */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.withColumn("media", encode(col("text"), "UTF-8"))

  /** "Decode" each media blob and extract metadata, processing a whole
    * partition per task (the batch shape a real decoder needs: amortized
    * library init per partition, not per row).
    *
    * STUB: a real implementation would call the codec here; the fake is
    * deterministic so tests can golden-check it.
    */
  def decodeMeta(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (decoder handles, buffers, ...)
      // null media (e.g. a null-text doc) has no metadata row — the SQL
      // twins filter the same rows with WHERE text IS NOT NULL
      rows.filter(_.media != null).map { r =>
        val bytes = r.media
        // modular rolling hash (no i64 wraparound → portable to the oracle)
        val checksum = bytes.foldLeft(17L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
        MediaMeta(r.doc_id, bytes.length,
          width = 64 + (checksum % 640).toInt,
          height = 64 + ((checksum / 7) % 480).toInt,
          channels = 3, checksum = checksum)
      }
    }
  }

  /** Feature extraction over the binary column: a 16-bin byte histogram
    * per blob — a REAL feature (no codec needed), the shape any
    * embedding-from-media extractor has: per-partition kernel over
    * `Dataset[MediaRow]`, one pass over the bytes, fixed-size output.
    * Emitted exploded as (doc_id, bin, n) so the SQL oracle can twin it.
    */
  def byteHistogram(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.filter(_.media != null).flatMap { r =>
        val counts = new Array[Long](16)
        var i = 0
        while (i < r.media.length) {
          counts((r.media(i) & 0xff) >> 4) += 1
          i += 1
        }
        (0 until 16).iterator.filter(counts(_) > 0)
          .map(b => (r.doc_id, b, counts(b)))
      }
    }.toDF("doc_id", "bin", "n")
  }

  /** Frame sampling stub: slice the blob into `n` evenly spaced "frames"
    * (binary sub-blobs) — 1→N generator, same plan shape as a real video
    * frame sampler (explode after a per-row decode).
    */
  def sampleFrames(df: DataFrame, n: Int): DataFrame = {
    val total = length(col("media"))
    val frames = transform(sequence(lit(0), lit(n - 1)),
      i => col("media").substr((i * greatest(total / n, lit(1)) + 1).cast("int"),
        greatest((total / n).cast("int"), lit(1))))
    df.select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
      .withColumn("frame_bytes", length(col("frame")))
  }
}
