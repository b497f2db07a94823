package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.operators.Dedup

/** ScalaCheck properties (SURVEY §5.2 #3). The expression properties
  * evaluate the catalyst interpreted path directly on the driver (Literal
  * children + eval), so hundreds of samples cost microseconds; the dedup
  * idempotence property runs real Spark jobs on a handful of generated
  * corpora.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private def evalDot(a: Array[Double], b: Array[Double]): Double =
    DotProduct(
      Literal.create(a, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType))
    ).eval(InternalRow.empty).asInstanceOf[Double]

  private def evalSic(a: Array[Long], b: Array[Long]): Long =
    SortedIntersectCount(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType))
    ).eval(InternalRow.empty).asInstanceOf[Long]

  private val vecGen: Gen[Array[Double]] =
    Gen.choose(0, 32).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)).map(_.toArray))

  private val sortedSetGen: Gen[Array[Long]] =
    Gen.listOf(Gen.choose(-1000L, 1000L)).map(_.distinct.sorted.toArray)

  test("prop: SortedIntersectCount equals set-intersection cardinality") {
    check(Prop.forAll(sortedSetGen, sortedSetGen) { (a, b) =>
      evalSic(a, b) == a.toSet.intersect(b.toSet).size.toLong
    }, "sorted-intersect-count")
  }

  test("prop: DotProduct equals the sequential fold over the common prefix") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      var expect = 0.0
      (0 until n).foreach(i => expect += a(i) * b(i))
      evalDot(a, b) == expect
    }, "dot-product-fold")
  }

  test("prop: cosine from DotProduct is bounded, symmetric, and 1 on self") {
    val nonZero = vecGen.suchThat(v => v.length > 0 && v.exists(_ != 0.0))
    check(Prop.forAll(nonZero, nonZero) { (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      if (n == 0 || !a.exists(_ != 0.0) || !b.exists(_ != 0.0)) true
      else {
        val cos = evalDot(a, b) / math.sqrt(evalDot(a, a) * evalDot(b, b))
        val cosBa = evalDot(b, a) / math.sqrt(evalDot(b, b) * evalDot(a, a))
        val self = evalDot(a, a) / math.sqrt(evalDot(a, a) * evalDot(a, a))
        math.abs(cos) <= 1.0 + 1e-9 && cos == cosBa && math.abs(self - 1.0) < 1e-9
      }
    }, "cosine-properties")
  }

  test("prop: exact dedup is idempotent and keeps one row per distinct text") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val docs = (1 to 200).map { i =>
        (i.toLong, s"text ${rnd.nextInt(40)}")
      }.toDF("doc_id", "text")
      val once = Dedup.exact(docs, "text", "doc_id")
      val distinctTexts = docs.select("text").distinct().count()
      assert(once.count() == distinctTexts)
      // idempotence: treating survivors as a corpus changes nothing
      val survivors = docs.join(once.select(col("keep_id").as("doc_id")), "doc_id")
      val twice = Dedup.exact(survivors, "text", "doc_id")
      assert(twice.count() == distinctTexts)
      assert(twice.select(sum("n_copies")).as[Long].head() == distinctTexts)
    }
  }

  test("prop: minhash LSH pair set is symmetric-free and threshold-sound") {
    val rnd = new scala.util.Random(11)
    val base = (1 to 60).map(i => s"token${rnd.nextInt(20)} " * 10 + s"doc $i")
    val docs = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    pairs.foreach { case (a, b, j) =>
      assert(a < b, "pairs must be ordered (no duplicates/self-pairs)")
      assert(j >= 0.5 && j <= 1.0 + 1e-9, s"jaccard out of range: $j")
    }
  }
}
