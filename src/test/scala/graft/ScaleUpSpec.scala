package graft

import org.apache.spark.sql.functions._

/** Pins the r13 ScaleUp contracts: (1) chained derivation is refused —
  * the per-copy rewrites are injective in one pass but NOT under
  * composition (suffix chains (k,0)/(0,k) collide, embedding sign masks
  * commute), which fabricated 49,608 cross-copy near-dup pairs in the
  * r13 sf10 rehearsal and read as a fake superlinear exponent on the
  * exact-SSJoin family; (2) a single pass keeps copy vocabularies
  * disjoint at ANY factor — document near-dup pairs scale exactly
  * linearly in copies; (3) event user_ids wrap modulo the copy-0
  * customer stride, so the stream-enrich join stays fully matched at
  * factors the old uS·factor ≤ cS require rejected.
  */
class ScaleUpSpec extends SparkSpec {

  private def freshDst(tag: String): String =
    graft.util.Scratch.fresh(s"scaleup_$tag")

  test("chain guard: deriving from a derived directory fails loudly") {
    val d1 = freshDst("chain1")
    ScaleUp.derive(spark, sfDir, d1, 2, skew = false)
    val e = intercept[IllegalArgumentException] {
      ScaleUp.derive(spark, d1, freshDst("chain2"), 2, skew = false)
    }
    assert(e.getMessage.contains("chained derivation"))
  }

  test("single-pass copies are vocabulary-disjoint: near-dup pairs scale " +
      "exactly linearly and never cross copies") {
    // sf0.01 so the base corpus has real near-dup pairs (non-vacuous)
    val src = "/root/testdata/sf0.01"
    val d2 = freshDst("lin2"); val d4 = freshDst("lin4")
    ScaleUp.derive(spark, src, d2, 2, skew = false)
    ScaleUp.derive(spark, src, d4, 4, skew = false)
    val p2 = operators.Dedup.shingleJaccardPairsGlobal(
      spark.read.parquet(s"$d2/documents.parquet"), 3, 0.8)
    val p4 = operators.Dedup.shingleJaccardPairsGlobal(
      spark.read.parquet(s"$d4/documents.parquet"), 3, 0.8)
    val n2 = p2.count(); val n4 = p4.count()
    assert(n2 > 0, "vacuous: base corpus has no near-dup pairs")
    assert(n4 === 2 * n2, s"pairs must double with copies: x2=$n2 x4=$n4")
    // no pair may span two copies (stride = max base doc_id + 1)
    val dS = spark.read.parquet(s"$src/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0) + 1L
    val cross = p4.filter(
      floor(col("a_id") / dS) =!= floor(col("b_id") / dS)).count()
    assert(cross === 0L, s"cross-copy pairs fabricated: $cross")
  }

  test("event user_ids wrap into the copy-0 customer range at factors " +
      "beyond the old stride limit") {
    val cMax = spark.read.parquet(s"$sfDir/customer.parquet")
      .agg(max(col("c_custkey"))).head().getAs[Number](0).longValue
    val uMax = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(max(col("user_id"))).head().getAs[Number](0).longValue
    // pick a factor the old require would reject: uS * factor > cS
    val factor = (((cMax + 1) / (uMax + 1)) + 2).toInt
    val d = freshDst("wrap")
    ScaleUp.derive(spark, sfDir, d, factor, skew = false)
    val ev = spark.read.parquet(s"$d/events.parquet")
    val bad = ev.filter(col("user_id") > cMax || col("user_id") < 0).count()
    assert(bad === 0L,
      s"user_ids escaped the copy-0 customer range at factor $factor")
    // rows replicate exactly
    val n0 = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(ev.count() === n0 * factor)
  }
}
