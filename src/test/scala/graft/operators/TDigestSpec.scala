package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Direct contracts of the minimal merging t-digest behind
  * [[Joins.bandAggJoin]]'s measure percentiles (the DataFrame-level rank
  * tolerance is pinned in JoinsSpec; this suite pins the primitive).
  */
class TDigestSpec extends AnyFunSuite {

  private def rankOf(sorted: Array[Double], q: Double): Double =
    sorted.count(_ <= q).toDouble / sorted.length

  test("size stays bounded by ~2*compression regardless of input size") {
    val big = TDigest.fromValues(Array.tabulate(100000)(i =>
      math.sin(i.toDouble) * 1000.0))
    assert(big.means.length <= 2 * TDigest.Compression + 1,
      s"${big.means.length} centroids")
    // and merging two big digests stays bounded too
    val other = TDigest.fromValues(Array.tabulate(50000)(i => i * 0.37))
    val m = TDigest.merge(big, other)
    assert(m.means.length <= 2 * TDigest.Compression + 1)
    assert(m.totalWeight === 150000.0)
  }

  test("quantiles land within 1% rank error on uniform and skewed data") {
    val uniform = Array.tabulate(50000)(i => i.toDouble)
    val skewed = Array.tabulate(50000)(i => math.pow(1.0003, i))
    for (data <- Seq(uniform, skewed)) {
      val sorted = data.sorted
      val d = TDigest.fromValues(data)
      for (p <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val q = TDigest.quantile(d, p)
        val r = rankOf(sorted, q)
        assert(math.abs(r - p) <= 0.01,
          f"p=$p rank of estimate = $r%.4f (off by ${math.abs(r - p)}%.4f)")
      }
    }
  }

  test("merge of parts tracks the digest of the whole (rank error <= 2%)") {
    val parts = (0 until 8).map(s =>
      Array.tabulate(5000)(i => ((i * 2654435761L + s * 40503L) % 100000L).toDouble))
    val all = parts.flatten.toArray
    val sorted = all.sorted
    val merged = parts.map(TDigest.fromValues).reduce(TDigest.merge)
    assert(merged.totalWeight === all.length.toDouble)
    for (p <- Seq(0.1, 0.5, 0.9)) {
      val r = rankOf(sorted, TDigest.quantile(merged, p))
      assert(math.abs(r - p) <= 0.02, f"p=$p merged rank $r%.4f")
    }
  }

  test("exact small cases, min/max clamping, empty digest") {
    val d = TDigest.fromValues(Array(5.0))
    assert(TDigest.quantile(d, 0.5) === 5.0)
    val two = TDigest.fromValues(Array(1.0, 9.0))
    assert(TDigest.quantile(two, 0.0) >= 1.0 - 1e-12)
    assert(TDigest.quantile(two, 1.0) <= 9.0 + 1e-12)
    assert(TDigest.quantile(TDigest.empty, 0.5).isNaN)
    assert(TDigest.merge(TDigest.empty, d).totalWeight === 1.0)
  }

  test("serialization round-trips bit-exactly") {
    val d = TDigest.fromValues(Array.tabulate(10000)(i => i * 1.5 - 300.0))
    val back = TDigest.deserialize(TDigest.serialize(d))
    assert(back.means.toSeq === d.means.toSeq)
    assert(back.weights.toSeq === d.weights.toSeq)
    assert(back.min === d.min && back.max === d.max)
  }
}
