package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries mergeable heavy-hitter summary (SURVEY §2.B
  * `llm_heavy_hitters`).
  *
  * The bounded-state counterpart of an exact `groupBy(key).count()` top-k:
  * the exact path shuffles EVERY distinct key, which is fine when the key
  * space is Heaps-bounded (word vocabulary — `llm_vocab_coverage`,
  * `llm_bpe_pairs`) but corpus-sized when it is not (URLs, content hashes,
  * high-order n-grams at 100 TB). Misra-Gries caps the aggregation state at
  * `k` counters per partial buffer, so the shuffle moves at most `k`
  * (string, long) pairs per map partition no matter how many distinct keys
  * the corpus holds.
  *
  * Guarantee (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): every key with true frequency > N/k survives in
  * the final summary, and each surviving counter undercounts by at most
  * N/k (N = stream length; decrements across reduce events total ≤ N/k,
  * and merges add the two sides' bounds). The summary alone is therefore
  * approximate — the shipped query runs the classic SECOND PASS: exact
  * recount of the ≤ k candidates via a broadcast semi-join, which makes the
  * final top-`t` EXACT (hash-matchable against DuckDB) whenever the t-th
  * true count exceeds N/k — asserted with margin in `HeavyHittersSpec` so
  * a data drift that voids the bound fails a test, not the oracle.
  *
  * Buffer design: a mutable HashMap mutated in place — `udaf` lowers an
  * `Aggregator` to a `TypedImperativeAggregate` inside
  * `ObjectHashAggregateExec`, which keeps buffers as JVM objects and
  * serializes only at the partial/final boundary, so per-row reduce is
  * allocation-free. Eviction (subtract-min on overflow) is O(k) but fires
  * at most once per N/k rows amortized: each eviction removes ≥ 1 entry
  * and total decremented mass is bounded by the arrivals that trigger it.
  */
object HeavyHitters {

  class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]] {
    require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(
        b: mutable.HashMap[String, Long], x: String): mutable.HashMap[String, Long] = {
      b.get(x) match {
        case Some(c) => b.update(x, c + 1L)
        case None if b.size < k => b.update(x, 1L)
        case None =>
          // Batched decrement: subtract the minimum counter from every
          // entry and drop the zeros (≥ 1 entry — the min itself — always
          // leaves). The arriving item's single count cancels against the
          // same decrement, so it is NOT inserted. Decrement mass per
          // event is min·|b| ≤ stored mass, and stored mass only grows by
          // 1 per arrival → total decrements ≤ N/k (the classic bound).
          val m = b.valuesIterator.min
          b.filterInPlace((_, c) => c > m)
          b.mapValuesInPlace((_, c) => c - m)
      }
      b
    }

    override def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
      from.foreach { case (g, c) => into.update(g, into.getOrElse(g, 0L) + c) }
      if (into.size > k) {
        // Keep the k largest: subtract the (k+1)-th largest value from all
        // and drop the non-positives (≤ k strictly-greater entries remain;
        // the error bounds of the two sides add — Agarwal et al. §3).
        val vs = into.values.toArray
        java.util.Arrays.sort(vs)
        val cut = vs(vs.length - (k + 1))
        into.filterInPlace((_, c) => c > cut)
        into.mapValuesInPlace((_, c) => c - cut)
      }
      into
    }

    /** Sorted for a deterministic array value; the counters are NOT
      * exposed — they are undercounts, and the shipped query's second
      * pass recounts exactly anyway.
      */
    override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
      b.keys.toSeq.sorted

    // Kryo, not ExpressionEncoder: catalyst's map deserializer rebuilds
    // an IMMUTABLE map, which would ClassCastException the first in-place
    // reduce after a spill/shuffle round-trip; kryo round-trips the
    // mutable class itself. The buffer is partial-aggregate-internal, so
    // an opaque binary wire format costs nothing downstream.
    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      org.apache.spark.sql.Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** `misraGries(k)(gramCol)` → array&lt;string&gt; of ≤ k candidate keys. */
  def misraGries(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k))
}
