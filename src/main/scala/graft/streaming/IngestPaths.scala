package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Canonical state-directory identity for the ingest pipelines' catalog
  * object names (manifest/sig/band tables, staging views).
  *
  * Why not `String.hashCode` of the raw dir (the pre-r11 scheme, ADVICE
  * r10): `/a/b` vs `/a/b/` vs a relative alias are one physical location
  * but three raw strings — three catalog tables over one manifest — and a
  * 32-bit hash of two DISTINCT dirs can collide, silently resolving one
  * pipeline's table onto the other's LOCATION. Canonicalizing through the
  * path's own Hadoop FileSystem (`makeQualified` resolves scheme,
  * authority, working dir, and `.`/`..`) makes aliases converge, and a
  * 48-bit md5 prefix makes cross-dir collision negligible (~1e-7 at 10k
  * concurrent state dirs vs ~1% at 10k for 32-bit).
  */
private[streaming] object IngestPaths {

  /** The fully-qualified URI string of `dir` under its own filesystem. */
  def canonical(s: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toUri.toString
  }

  /** 12-hex-char md5 prefix of the canonical URI — the identity suffix
    * for every catalog object derived from this state dir.
    */
  def digest(s: SparkSession, dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canonical(s, dir).getBytes(StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
  }

  // ---------------------------------------------------------------------
  // Compaction intent log — shared by CorpusIngest and FuzzyIngest
  // ---------------------------------------------------------------------

  /** The compaction INTENT record for a state dir: a one-entry redo log
    * making compact crash-atomic (ADVICE r11). Written durably
    * (tmp+rename) before compaction touches any state, cleared after the
    * last step; every serving entry point rolls a pending record forward
    * first. The underscore prefix keeps the file invisible to parquet's
    * FileIndex, so it may live inside a table directory.
    */
  def markerPath(dir: String): Path = new Path(dir, "_compact_pending")

  def writeMarker(s: SparkSession, dir: String, upToBatch: Long): Unit = {
    val dst = markerPath(dir)
    val fs = dst.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir, "_compact_pending.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"upToBatch=$upToBatch\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) sys.error(s"compact marker rename failed: $dst")
  }

  def readMarker(s: SparkSession, dir: String): Option[Long] = {
    val p = markerPath(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    txt.linesIterator.map(_.split("=", 2))
      .collectFirst { case Array("upToBatch", v) => v.trim.toLong }
  }

  def clearMarker(s: SparkSession, dir: String): Unit = {
    val p = markerPath(dir)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, false)
  }
}
