package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the batch-split-independence claim `stream_quality_gate` makes:
  * because the gate is a STATELESS per-row map, what the streaming sink
  * persists must equal the batch classifier's keepers exactly — per
  * (lang, n_keep, min_keep, sum_score_milli) row. A stateful leak (e.g.
  * a batch-crossing dedup sneaking into the gate) or a checkpoint-replay
  * duplication would break this equality before any oracle sees it.
  */
class QualityGateSpec extends SparkSpec {

  test("streaming gate sink equals the batch classifier's keepers") {
    val streamed = graft.SparkEntry.queries("stream_quality_gate")(spark, sfDir)
      .collect().toSeq
    val batch = graft.operators.TextAnalysis
      .qualityClassifier(graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("text")))
      .filter(col("score_milli") >= 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_keep"),
        min(col("doc_id")).as("min_keep"),
        sum(col("score_milli")).as("sum_score_milli"))
      .orderBy(col("lang"))
      .collect().toSeq
    assert(streamed.nonEmpty, "vacuous: no keepers at sf0.001")
    assert(streamed == batch,
      s"streaming gate diverged from the batch model:\n$streamed\nvs\n$batch")
  }
}
