package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Whole-surface physical-plan sweep (the durable form of the round-4
  * audit): NO CartesianProduct anywhere, and BroadcastNestedLoopJoin only
  * where a query's semantics genuinely demand one. Iterates
  * `SparkEntry.queries`, so every new catalog entry is swept
  * automatically — an accidental unconstrained join in a future query
  * fails here instead of surfacing as a 100 TB incident.
  */
class PlanSweepSpec extends SparkSpec {

  /** Queries whose PHYSICAL plan legitimately contains a
    * BroadcastNestedLoopJoin:
    *  - join_theta_range: genuinely theta band predicate over a dim-sized
    *    build (the declared NLJ case; join_range_bucketed is the scale
    *    path);
    *  - join_cross: the declared cartesian (tiny dim × tiny dim);
    *  - llm_ngram_lm / llm_ccnet_buckets / llm_text_topterms /
    *    llm_vocab_coverage / fn_sql_subquery / llm_similarity_topk /
    *    llm_similarity_ivf / llm_cluster_stats: a ONE-ROW corpus-total /
    *    scalar-aggregate / query-vector frame crossed into the stream —
    *    the degenerate-broadcast scalar-join form, cost O(|rows|), not a
    *    pair explosion (the ivf entry inherits llm_similarity_topk's
    *    shape since r12: its hashed half IS the brute-force top-k).
    */
  private val bnljAllowed = Set(
    "join_theta_range", "join_cross", "llm_ngram_lm", "llm_ccnet_buckets",
    "llm_text_topterms", "llm_vocab_coverage", "fn_sql_subquery",
    "llm_similarity_topk", "llm_similarity_ivf", "llm_cluster_stats")
  // llm_dedup_embed_incremental left the list in r13: its replay now
  // probes the sign-LSH bands for candidates and exact-verifies only
  // those, so the broadcast-history NLJ (the one allowlist entry whose
  // build side grew with history) no longer exists.

  test("plan sweep: zero CartesianProduct, BNLJ only in the by-design spots") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // building the frame runs any construction-time jobs (sinks,
      // streaming, manifest seeding) at sf0.001 — the smoke-test price of
      // auditing the REAL final plan of every query
      val plan = fn(spark, sfDir).queryExecution.sparkPlan
      val cartesians = plan.collect { case c: CartesianProductExec => c }
      if (cartesians.nonEmpty)
        offenders += s"$name: CartesianProduct"
      val bnlj = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
      if (bnlj.nonEmpty && !bnljAllowed(name))
        offenders += s"$name: BroadcastNestedLoopJoin (not in allowed set)"
    }
    assert(offenders.isEmpty,
      s"unconstrained joins in:\n  ${offenders.mkString("\n  ")}")
  }
}
