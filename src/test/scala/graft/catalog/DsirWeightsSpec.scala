package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Selection-signal property for `llm_dsir_weights` (DSIR, Xie et al.
  * 2023): the hash-compared oracle twin pins the VALUES; this spec pins
  * the SEMANTICS the values are for — importance weights must rank the
  * target slice (`en`) above the rest, i.e. resampling by them would
  * actually bias toward target-looking documents. 256 hashed buckets
  * collide heavily across languages (that is the point of the hashing
  * trick — bounded state), so the assertion is on the per-slice MEAN,
  * not every document.
  */
class DsirWeightsSpec extends SparkSpec {
  import spark.implicits._

  test("dsir: mean importance weight of the target slice exceeds the rest") {
    val out = LlmQueries.queries("llm_dsir_weights")(spark, sfDir)
      .withColumn("is_tgt", col("lang") === "en")
      .groupBy(col("is_tgt"))
      .agg((sum(col("sum_w_4dp")) / sum(col("n_docs"))).as("mean_w_4dp"))
      .as[(Boolean, Double)].collect().toMap
    assert(out.keySet == Set(true, false), s"expected both slices: $out")
    assert(out(true) > out(false),
      s"target mean ${out(true)} must exceed non-target mean ${out(false)}")
  }
}
