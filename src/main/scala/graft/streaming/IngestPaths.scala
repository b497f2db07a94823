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
}
