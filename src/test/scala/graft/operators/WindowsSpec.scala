package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("distributedRunningSum equals the naive single-partition global window") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))

    val dist = Windows.distributedRunningSum(
        orders, col("o_totalprice"), year(col("o_orderdate")),
        Seq(col("o_orderdate"), col("o_orderkey")), "running")
      .select(col("o_orderkey"), round(col("running"), 2).as("running"))
      .orderBy("o_orderkey").as[(Long, Double)].collect()

    val naive = orders
      .withColumn("running", sum(col("o_totalprice")).over(
        Window.orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("o_orderkey"), round(col("running"), 2).as("running"))
      .orderBy("o_orderkey").as[(Long, Double)].collect()

    assert(dist.length == naive.length)
    dist.zip(naive).foreach { case ((k1, v1), (k2, v2)) =>
      assert(k1 == k2)
      assert(math.abs(v1 - v2) < 0.01, s"key $k1: $v1 vs $v2")
    }
  }

  test("distributedRunningSum plan has no single-partition global window over the data") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val plan = Windows.distributedRunningSum(
        orders, col("o_totalprice"), year(col("o_orderdate")),
        Seq(col("o_orderdate"), col("o_orderkey")), "running")
      .queryExecution.executedPlan.toString()
    // the intra-bucket window must be hash-partitioned on the bucket key;
    // the only SinglePartition exchange allowed is over per-bucket offsets
    // (#buckets rows). Count them: exactly one is expected.
    val single = "SinglePartition".r.findAllIn(plan).size
    assert(single <= 1, s"expected at most one tiny global exchange, got $single:\n$plan")
  }

  test("partitionedPrefixSum equals the naive per-scope exclusive window") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val dist = Windows.partitionedPrefixSum(docs, col("n_chars"),
        Seq("lang"), floor(col("doc_id") / 50).cast("long"),
        Seq(col("doc_id")), "cum")
      .select(col("doc_id"), col("cum")).orderBy("doc_id")
      .as[(Long, Long)].collect()
    val naive = docs.withColumn("cum",
        coalesce(sum(col("n_chars")).over(
          Window.partitionBy(col("lang")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("cum")).orderBy("doc_id")
      .as[(Long, Long)].collect()
    assert(dist.length == naive.length && dist.length > 0)
    assert(dist.toSeq == naive.toSeq, "exclusive prefix sums must be exact")
  }

  test("floor(rank*3/n)+1 closed form equals SQL NTILE(3) for every partition size") {
    // the identity llm_ccnet_buckets' oracle leans on: the Spark side
    // derives the tertile from a distributed exclusive rank rn0 as
    // floor(rn0*3/n), the DuckDB twin uses NTILE(3). Exhaustive over
    // partition sizes 1..13 (covers every n mod 3 residue repeatedly).
    val rows = for { n <- 1 to 13; i <- 0 until n } yield (n, i.toLong)
    val df = rows.toDF("p", "i")
    val w = Window.partitionBy(col("p")).orderBy(col("i"))
    val mismatches = df
      .withColumn("nt", ntile(3).over(w))
      .withColumn("cf", (col("i") * 3 / col("p")).cast("long") + 1)
      .filter(col("nt") =!= col("cf")).count()
    assert(mismatches == 0L)
  }

  test("partitionedPrefixSum plan never collapses to a single partition") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val plan = Windows.partitionedPrefixSum(docs, col("n_chars"),
        Seq("lang"), floor(col("doc_id") / 50).cast("long"),
        Seq(col("doc_id")), "cum")
      .queryExecution.executedPlan.toString()
    // both windows are scope-partitioned: the offsets window by lang, the
    // intra window by (lang, bucket) — no SinglePartition exchange at all
    val single = "SinglePartition".r.findAllIn(plan).size
    assert(single == 0, s"expected no single-partition exchange, got $single:\n$plan")
  }
}
