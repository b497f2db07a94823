package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Minimal merging t-digest (Dunning & Ertl, "Computing Extremely
  * Accurate Quantiles Using t-Digests") with the uniform (k0) scale
  * function: every centroid's weight is bounded by `totalWeight /
  * compression`, giving a hard rank-error bound of W/(2·compression)
  * (0.5% at the default 100) and a hard SIZE bound of ~2·compression
  * centroids — the fixed-size mergeable summary [[Joins.bandAggJoin]]'s
  * opt-in measure percentiles stack per cent and merge per probe.
  *
  * Mergeable (merge = concat + recompress over mean-sorted centroids) and
  * bounded, but NOT order-insensitive: different merge trees can place
  * centroid boundaries differently, so results are approximate-stable,
  * never bit-deterministic across partitionings — which is why the
  * measure percentiles are opt-in and tolerance-tested, not hash-oracled.
  */
private[operators] object TDigest {

  val Compression = 100

  /** Immutable digest: mean-sorted centroids + exact min/max for tail
    * clamping. Empty digest: zero-length arrays.
    */
  case class Digest(means: Array[Double], weights: Array[Double],
      min: Double, max: Double) {
    def totalWeight: Double = { var s = 0.0; var i = 0
      while (i < weights.length) { s += weights(i); i += 1 }; s }
    def isEmpty: Boolean = means.length == 0
  }

  val empty: Digest =
    Digest(Array.empty, Array.empty, Double.NaN, Double.NaN)

  /** Greedy left-to-right recompress of mean-sorted (mean, weight) pairs:
    * adjacent centroids merge while the merged weight stays within
    * W/compression. Output ≤ 2·compression centroids.
    */
  private def compress(means: Array[Double], weights: Array[Double],
      mn: Double, mx: Double): Digest = {
    val m = means.length
    if (m == 0) return empty
    var w = 0.0; var i = 0
    while (i < m) { w += weights(i); i += 1 }
    val cap = w / Compression
    val om = new Array[Double](m); val ow = new Array[Double](m)
    var out = 0
    var curM = means(0); var curW = weights(0)
    i = 1
    while (i < m) {
      if (curW + weights(i) <= cap) {
        val nw = curW + weights(i)
        curM = (curM * curW + means(i) * weights(i)) / nw
        curW = nw
      } else {
        om(out) = curM; ow(out) = curW; out += 1
        curM = means(i); curW = weights(i)
      }
      i += 1
    }
    om(out) = curM; ow(out) = curW; out += 1
    Digest(java.util.Arrays.copyOf(om, out),
      java.util.Arrays.copyOf(ow, out), mn, mx)
  }

  /** Digest of a batch of raw values (sorted internally). */
  def fromValues(values: Array[Double]): Digest = {
    if (values.isEmpty) return empty
    val v = values.clone(); java.util.Arrays.sort(v)
    compress(v, Array.fill(v.length)(1.0), v(0), v(v.length - 1))
  }

  def merge(a: Digest, b: Digest): Digest = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val m = a.means.length + b.means.length
    val means = new Array[Double](m); val weights = new Array[Double](m)
    var i = 0; var j = 0; var o = 0
    while (i < a.means.length || j < b.means.length) {
      val takeA = j >= b.means.length ||
        (i < a.means.length && a.means(i) <= b.means(j))
      if (takeA) { means(o) = a.means(i); weights(o) = a.weights(i); i += 1 }
      else { means(o) = b.means(j); weights(o) = b.weights(j); j += 1 }
      o += 1
    }
    compress(means, weights, math.min(a.min, b.min), math.max(a.max, b.max))
  }

  /** Quantile estimate at `p` ∈ [0,1]: linear interpolation between
    * centroid midpoint ranks, clamped to the exact min/max.
    */
  def quantile(d: Digest, p: Double): Double = {
    val m = d.means.length
    if (m == 0) return Double.NaN
    if (m == 1) return d.means(0)
    val w = d.totalWeight
    val t = p * w
    var cum = 0.0
    var i = 0
    while (i < m) {
      val mid = cum + d.weights(i) / 2.0
      if (t < mid) {
        if (i == 0) {
          // below the first midpoint: interpolate from min
          val frac = if (mid <= 0) 0.0 else t / mid
          return d.min + (d.means(0) - d.min) * math.max(frac, 0.0)
        }
        val prevMid = cum - d.weights(i - 1) / 2.0
        val frac = (t - prevMid) / (mid - prevMid)
        return d.means(i - 1) + (d.means(i) - d.means(i - 1)) * frac
      }
      cum += d.weights(i); i += 1
    }
    // above the last midpoint: interpolate to max
    val lastMid = cum - d.weights(m - 1) / 2.0
    val span = w - lastMid
    val frac = if (span <= 0) 1.0 else math.min((t - lastMid) / span, 1.0)
    d.means(m - 1) + (d.max - d.means(m - 1)) * frac
  }

  // -- serialization (fixed little-endian doubles; executor → driver) ----

  def serialize(d: Digest): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 + d.means.length * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(d.means.length)
    bb.putDouble(d.min); bb.putDouble(d.max)
    var i = 0
    while (i < d.means.length) {
      bb.putDouble(d.means(i)); bb.putDouble(d.weights(i)); i += 1
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Digest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val m = bb.getInt()
    val mn = bb.getDouble(); val mx = bb.getDouble()
    val means = new Array[Double](m); val weights = new Array[Double](m)
    var i = 0
    while (i < m) { means(i) = bb.getDouble(); weights(i) = bb.getDouble(); i += 1 }
    Digest(means, weights, mn, mx)
  }

  /** Spark-facing aggregator: builds one serialized digest per group.
    * Buffer = (pending raw values, serialized digest); pending flushes
    * into the digest at 512 values, so buffer size is bounded.
    */
  object DigestAgg extends Aggregator[Option[Double], (Seq[Double], Array[Byte]), Array[Byte]] {
    private val FlushAt = 512
    override def zero: (Seq[Double], Array[Byte]) =
      (Vector.empty, serialize(empty))
    private def flush(b: (Seq[Double], Array[Byte])): (Seq[Double], Array[Byte]) =
      if (b._1.isEmpty) b
      else (Vector.empty,
        serialize(TDigest.merge(deserialize(b._2), fromValues(b._1.toArray))))
    override def reduce(b: (Seq[Double], Array[Byte]),
        in: Option[Double]): (Seq[Double], Array[Byte]) = in match {
      case None => b
      case Some(v) =>
        val nb = (b._1 :+ v, b._2)
        if (nb._1.length >= FlushAt) flush(nb) else nb
    }
    override def merge(a: (Seq[Double], Array[Byte]),
        b: (Seq[Double], Array[Byte])): (Seq[Double], Array[Byte]) = {
      val fa = flush(a); val fb = flush(b)
      (Vector.empty,
        serialize(TDigest.merge(deserialize(fa._2), deserialize(fb._2))))
    }
    override def finish(b: (Seq[Double], Array[Byte])): Array[Byte] =
      flush(b)._2
    override def bufferEncoder
        : org.apache.spark.sql.Encoder[(Seq[Double], Array[Byte])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  /** `tdigest(value)` → serialized digest bytes, usable in groupBy.agg. */
  lazy val digestUdaf: UserDefinedFunction = udaf(DigestAgg)
}
