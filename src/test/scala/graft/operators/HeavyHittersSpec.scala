package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.LlmQueries

/** Misra-Gries summary + the `llm_heavy_hitters` two-pass contract.
  *
  * The sf fixtures never overflow a k=2048 summary (~930 distinct
  * bigrams), so the eviction and merge paths are exercised here directly
  * on a planted Zipf-ish stream with cardinality >> k — the containment
  * guarantee (freq > N/k ⟹ present) is what the shipped query's
  * exactness rests on.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** 20 hot keys at 600 occurrences each + 20k singleton tail:
    * N = 32k, k = 64 → threshold N/k = 500 < 600.
    */
  private def zipfStream: Seq[String] =
    (0 until 20).flatMap(h => Seq.fill(600)(s"hot_$h")) ++
      (0 until 20000).map(i => s"tail_$i")

  test("misra-gries: containment guarantee survives eviction and merge") {
    val mg = new HeavyHitters.MisraGries(64)
    // interleave hot and tail so evictions fire while hot keys accumulate
    // (sorted-by-hash order, deterministic but scrambled)
    val stream = zipfStream.sortBy(x => (x.hashCode * 2654435761L) & 0xffffffffL)
    // split across 8 "partitions", reduce each, then merge pairwise —
    // the exact shape ObjectHashAggregate runs
    val parts = stream.grouped(math.ceil(stream.size / 8.0).toInt).toSeq
    val merged = parts
      .map(p => p.foldLeft(mg.zero)((b, x) => mg.reduce(b, x)))
      .reduce((a, b) => mg.merge(a, b))
    assert(merged.size <= 64, s"state bound violated: ${merged.size}")
    val out = mg.finish(merged).toSet
    (0 until 20).foreach { h =>
      assert(out.contains(s"hot_$h"),
        s"hot_$h (freq 500 > N/k) evicted — guarantee broken")
    }
  }

  test("misra-gries: eviction keeps the undercount within the N/k bound") {
    val mg = new HeavyHitters.MisraGries(64)
    val stream = zipfStream.sortBy(x => (x.hashCode * 2654435761L) & 0xffffffffL)
    val b = stream.foldLeft(mg.zero)((x, y) => mg.reduce(x, y))
    val bound = stream.size / 64 // total decrement mass ≤ N/k
    (0 until 20).foreach { h =>
      val c = b.getOrElse(s"hot_$h", 0L)
      assert(c >= 600 - bound && c <= 600,
        s"hot_$h counter $c outside [${600 - bound}, 600]")
    }
  }

  test("two-pass query is exact: matches the full-groupBy top-40 and is " +
      "layout-independent") {
    val exact = Tables_bigrams()
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("gram")).limit(40)
      .as[(String, Long)].collect().toSeq
    val got = LlmQueries.queries("llm_heavy_hitters")(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(got == exact, "two-pass result diverges from exact top-40")
    assert(got.size == 40)
  }

  test("exactness margin: the 40th count strictly exceeds N/k") {
    // the condition under which candidates provably ⊇ true top-40 at ANY
    // partition layout; if corpus drift ever voids it, this fails (and
    // the fix is raising k), not the hash oracle
    val grams = Tables_bigrams().cache()
    try {
      val n = grams.count()
      val c40 = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("gram")).limit(40)
        .agg(min(col("n"))).as[Long].head()
      assert(c40 > n / 2048,
        s"margin lost: c40=$c40 vs N/k=${n / 2048} — raise k")
    } finally grams.unpersist()
  }

  /** The query's own gram kernel, inlined for an independent exact path. */
  private def Tables_bigrams() =
    graft.Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .withColumn("__t", split(col("text"), " "))
      .filter(size(col("__t")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(__t) - 2),
             i -> concat(element_at(__t, i + 1), ' ', element_at(__t, i + 2)))"""))
        .as("gram"))
}
