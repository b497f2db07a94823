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

  test("explode-based replication matches the literal per-copy formulas " +
      "(r15: the union path could not plan factor 1000)") {
    // golden pin for the r15 explode rewrite: copy 1 of documents and
    // embeddings must equal the PRE-r15 literal-int formulas applied to
    // the base table — token suffix `_1`, recomputed n_chars, key shift
    // by stride, and the xxhash64(1, d) sign mask (INT literal, the
    // type the mask always hashed). Any drift here silently changes
    // every scale rehearsal's data.
    val d = freshDst("explode_eq")
    ScaleUp.derive(spark, sfDir, d, 3, skew = false)

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val dS = docs0.agg(max(col("doc_id"))).head().getAs[Number](0).longValue + 1
    val expDocs = docs0
      .withColumn("doc_id", col("doc_id") + lit(dS))
      .withColumn("text",
        when(col("text").isNull, col("text"))
          .when(length(col("text")) === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "), t => concat(t, lit("_1"))), " ")))
      .withColumn("n_chars", coalesce(length(col("text")).cast("long"), lit(0L)))
    val gotDocs = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("doc_id") >= dS && col("doc_id") < 2 * dS)
    assert(gotDocs.exceptAll(expDocs).count() === 0L &&
      expDocs.exceptAll(gotDocs).count() === 0L,
      "documents copy 1 drifted from the literal formula")

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val vS = emb0.agg(max(col("vec_id"))).head().getAs[Number](0).longValue + 1
    val expEmb = emb0
      .withColumn("vec_id", col("vec_id") + lit(vS))
      .withColumn("embedding", expr(
        """transform(embedding, (v, d) ->
             CAST(v * (1 - 2 * pmod(xxhash64(1, d), 2)) AS FLOAT))"""))
    val gotEmb = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") >= vS && col("vec_id") < 2 * vS)
    assert(gotEmb.exceptAll(expEmb).count() === 0L &&
      expEmb.exceptAll(gotEmb).count() === 0L,
      "embeddings copy 1 sign mask drifted from the literal xxhash64(INT, INT) formula")
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
