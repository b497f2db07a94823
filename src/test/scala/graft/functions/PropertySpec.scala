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

  test("prop: chunkDupStats matches a brute-force recount on random corpora") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val docs = (1 to 120).map { i =>
        val n = 1 + rnd.nextInt(25)
        (i.toLong, Seq.fill(n)(s"w${rnd.nextInt(8)}").mkString(" "))
      }
      val expected = {
        val chunks = docs.flatMap { case (id, text) =>
          text.split(" ").grouped(4).map(g => (id, g.mkString(" ")))
        }
        val mult = chunks.groupBy(_._2).map { case (c, xs) => c -> xs.size }
        chunks.groupBy(_._1).map { case (id, cs) =>
          val dup = cs.count(c => mult(c._2) > 1)
          (id, cs.size, dup,
            math.floor(dup * 10000.0 / cs.size + 0.5) / 10000.0)
        }.toSeq.sortBy(_._1)
      }
      val got = Dedup.chunkDupStats(docs.toDF("doc_id", "text"), chunkTokens = 4)
        .orderBy("doc_id").as[(Long, Int, Int, Double)].collect().toSeq
      assert(got == expected, s"mismatch on generated corpus")
    }
  }

  test("prop: partitionedPrefixSum equals a sequential per-scope scan") {
    val rnd = new scala.util.Random(17)
    (1 to 3).foreach { _ =>
      val rows = (1 to 300).map { i =>
        (i.toLong, s"g${rnd.nextInt(4)}", rnd.nextInt(1000).toLong)
      }
      val expected = rows.groupBy(_._2).flatMap { case (_, grp) =>
        val sorted = grp.sortBy(_._1)
        sorted.zip(sorted.scanLeft(0L)(_ + _._3)).map {
          case ((id, _, _), cumBefore) => (id, cumBefore)
        }
      }.toSeq.sortBy(_._1)
      val got = graft.operators.Windows.partitionedPrefixSum(
          rows.toDF("id", "grp", "v"), col("v"), Seq("grp"),
          floor(col("id") / 37).cast("long"), Seq(col("id")), "cum")
        .select(col("id"), col("cum")).orderBy("id")
        .as[(Long, Long)].collect().toSeq
      assert(got == expected, "prefix sums diverge from the sequential scan")
    }
  }

  test("prop: quantization error per element is bounded by (scale/2)^2") {
    val rnd = new scala.util.Random(19)
    val vecs = (1 to 50).map { i =>
      (i.toLong, i % 3, Array.fill(16)((rnd.nextDouble() * 20 - 10).toFloat))
    }
    val maxAbs = vecs.map { case (_, _, v) => v.map(x => math.abs(x.toDouble)).max }.max
    val bound = {
      val s = maxAbs / 127.0
      math.floor((s / 2) * (s / 2) * 1e12 + 0.5).toLong
    }
    val out = graft.operators.Similarity.quantizeError(
        vecs.toDF("vec_id", "label", "embedding"))
      .as[(Int, Long, Long, Long)].collect()
    out.foreach { case (_, _, nElems, sumUnits) =>
      assert(sumUnits <= nElems * bound,
        s"per-element error exceeds the (scale/2)^2 quantization bound")
    }
  }

  test("prop: bandedRangeJoin equals the brute-force band filter") {
    // Random frames (negative values included so floor-toward-negative
    // matters; bands chosen to straddle bucket boundaries), real Spark
    // jobs; pins the ±1 bucket-cover logic — an off-by-one at
    // floor((r ± band)/band) drops exactly the pairs on a bucket edge.
    val rnd = new scala.util.Random(13)
    (1 to 7).foreach { trial =>
      val band = 0.5 + rnd.nextDouble() * 7.5
      // W independent of band (VERDICT r7 item 7): narrower (splits hot
      // buckets, higher replication), equal, and wider than the band —
      // incl. W > band where m = ceil(band/W) = 1 must still cover
      val bucketWidth = trial match {
        case 1 => band                            // the classic W = band
        case 2 => band / (1 + rnd.nextInt(4) + rnd.nextDouble())  // W < band
        case _ => band * (0.2 + rnd.nextDouble() * 2.8)           // around band
      }
      val ls = Seq.fill(40)(rnd.nextDouble() * 60.0 - 30.0)
      val rs = Seq.fill(40)(rnd.nextDouble() * 60.0 - 30.0)
      val l = ls.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
      val r = rs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
      val got = graft.operators.Joins
        .bandedRangeJoin(l, r, "lv", "rv", band, bucketWidth)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      val want = (for {
        (lv, li) <- ls.zipWithIndex
        (rv, ri) <- rs.zipWithIndex
        if math.abs(lv - rv) <= band
      } yield (li.toLong, ri.toLong)).toSet
      // Seq-vs-Set double check: a duplicate pair (double-covered bucket)
      // would pass a Set compare — the no-dedup-needed claim is part of
      // the contract
      assert(got.size == got.toSet.size,
        s"banded join emitted duplicate pairs at band=$band W=$bucketWidth")
      assert(got.toSet == want,
        s"banded join diverged from brute force at band=$band W=$bucketWidth: " +
          s"missing=${(want -- got).take(3)} extra=${(got.toSet -- want).take(3)}")
    }
  }

  test("prop: roundTo propagates non-finite values and rounds finite ones") {
    // Spark's floor returns LONG — an unguarded floor(x*p+0.5)/p silently
    // maps NaN -> 0.0 and +-Inf -> +-Long.MaxValue/p, masking poisoned
    // floats (DuckDB's DOUBLE floor propagates them). Pin the guard.
    val vals = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.23456, -1.23456, 0.0)
    val out = vals.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v")
      .select(col("i"), Rounding.roundTo(col("v"), 2).as("r"))
      .orderBy("i").as[(Int, Double)].collect().map(_._2)
    assert(out(0).isNaN, "NaN must propagate, not round to 0.0")
    assert(out(1).isPosInfinity && out(2).isNegInfinity,
      "infinities must propagate")
    // note: floor(x*p+0.5) is round-half-up TOWARD +inf, so -1.23456
    // rounds to -1.23 (same in DuckDB — that's the point of the form)
    assert(out(3) == 1.23 && out(4) == -1.23 && out(5) == 0.0,
      s"finite rounding changed: ${out.toSeq}")
    // and the guard leaves random finite values bit-identical to the
    // unguarded floor form (one batch job, 500 seeded samples)
    val rnd = new scala.util.Random(17)
    val samples = Seq.fill(500)(rnd.nextDouble() * 2e6 - 1e6)
    val got = samples.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v")
      .select(col("i"), Rounding.roundTo(col("v"), 2).as("r"))
      .orderBy("i").as[(Int, Double)].collect().map(_._2)
    samples.zip(got).foreach { case (d, g) =>
      val expected = math.floor(d * 100.0 + 0.5) / 100.0
      assert(g == expected, s"guarded roundTo diverged on finite $d: $g")
    }
  }

  test("prop: mixtureThresholdHex is a sound, monotone membership threshold") {
    import graft.catalog.LlmQueries
    // threshold shape: 8 lowercase hex digits for w<1, the keep-all
    // sentinel "g" (> every hex string) for w>=1
    check(Prop.forAll(Gen.choose(0.0, 1.5)) { w =>
      val t = LlmQueries.mixtureThresholdHex(w)
      if (w >= 1.0) t == "g"
      else t.length == 8 && t.forall(c => c.isDigit || ('a' to 'f').contains(c))
    }, "mixture-threshold-shape")
    // monotone: a larger weight never admits fewer members (string order)
    check(Prop.forAll(Gen.choose(0.0, 1.2), Gen.choose(0.0, 1.2)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      LlmQueries.mixtureThresholdHex(lo) <= LlmQueries.mixtureThresholdHex(hi)
    }, "mixture-threshold-monotone")
    // sound: membership over uniform 8-hex strings keeps ~w of them, and
    // lexicographic compare agrees with the numeric interpretation
    check(Prop.forAll(Gen.choose(0.05, 0.95), Gen.choose(0L, 4294967295L)) {
      (w, x) =>
        val hex = f"$x%08x"
        val t = LlmQueries.mixtureThresholdHex(w)
        (hex < t) == (x < (w * 4294967296L).toLong)
    }, "mixture-threshold-lex-numeric-agree")
  }

  test("prop: embed sign fingerprints are positive-scale invariant and flip under negation") {
    // the property the semantic-ingest oracle leans on: a positive
    // rescale changes NO hyperplane sign (identical fingerprint ⇒
    // identical LSH buckets with certainty), while negating the vector
    // flips EVERY decided sign (fingerprint complement up to exact-zero
    // dots, which the ±1-entry planes make measure-zero for these
    // non-degenerate float vectors)
    val vecGenF: Gen[Array[Float]] =
      Gen.choose(2, 16).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-8.0f, 8.0f).suchThat(v => math.abs(v) > 1e-3f))
          .map(_.toArray))
    val scaleGen: Gen[Float] = Gen.choose(0.01f, 50.0f)
    def fpOf(vs: Seq[(Long, Array[Float])]): Map[Long, Long] =
      graft.streaming.EmbedIngest.fingerprints(
          vs.toDF("vec_id", "embedding")
            .withColumn("label", org.apache.spark.sql.functions.lit(0)))
        .select(col("vec_id"), col("fp")).as[(Long, Long)].collect().toMap
    val p = Prop.forAll(vecGenF, scaleGen) { (v, c) =>
      val fps = fpOf(Seq((1L, v), (2L, v.map(_ * c)), (3L, v.map(-_))))
      // negation: allow a couple of exact-zero plane dots (both sides
      // then take the >= 0 bit) — everything decided must flip
      fps(1L) == fps(2L) &&
        java.lang.Long.bitCount(fps(1L) ^ fps(3L)) >= 60
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, s"fingerprint-invariance failed: ${res.status}")
    spark.catalog.clearCache()
  }

  test("prop: shingleJaccardPairsGlobal equals driver-side brute force on random corpora") {
    // real Spark jobs per sample (like the dedup idempotence property):
    // few samples, dense 5-letter alphabet so shingle overlaps and
    // threshold boundaries actually occur
    val tokGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.choose(1, 12)
      .flatMap(n => Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    val corpusGen = Gen.choose(6, 14).flatMap(n => Gen.listOfN(n, docGen))
    val thrGen = Gen.oneOf(0.3, 0.5, 0.7)
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      val nSh = math.max(toks.length - 2, 1)
      (0 until nSh)
        .map(i => toks.slice(i, math.min(i + 3, toks.length)).mkString(" "))
        .toSet
    }
    val p = Prop.forAll(corpusGen, thrGen) { (texts, thr) =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.shingleJaccardPairsGlobal(df, n = 3, threshold = thr)
        .as[(Long, Long, Double)].collect().toSet
      spark.catalog.clearCache()
      val sh = texts.zipWithIndex.map { case (t, i) => i.toLong -> shingles(t) }
      val expect = (for {
        (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
        if j >= thr
      } yield (ia, ib, math.floor(j * 10000.0 + 0.5) / 10000.0)).toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, s"shingle-global-vs-brute failed: ${res.status}")
  }

  test("prop: qualityClassifier kernel equals a driver-side brute force") {
    // independent reimplementation of the whole model (feature union,
    // md5 first-8-LE weight, floor arithmetic) checked on random token
    // corpora — pins the kernel against spec drift the fixed fixtures
    // in TextAnalysisSpec can't see (r13, the 154th oracle key)
    def brute(text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def w(f: String): Long = {
        val d = md.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L; var i = 0
        while (i < 8) { h |= (d(i) & 0xffL) << (8 * i); i += 1 }
        (h >>> 1) % 2001L - 1000L
      }
      val toks = text.split(" ", -1)
      val feats = (toks ++ toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" "))).distinct
      math.floor(1000.0 * feats.map(w).sum / feats.length).toLong
    }
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { _ =>
      val docs = (1 to 120).map { i =>
        val n = rnd.nextInt(12) // 0 tokens -> "" (still one feature)
        // small vocab forces repeated tokens/bigrams (the distinct path);
        // occasional empty tokens exercise the split(-1) rule
        val t = (1 to n).map(_ =>
          if (rnd.nextInt(8) == 0) "" else s"w${rnd.nextInt(9)}")
          .mkString(" ")
        (i.toLong, Option(if (i % 3 == 0) null else s"l${i % 4}"), t)
      }.toDF("doc_id", "lang", "text")
      val got = graft.operators.TextAnalysis.qualityClassifier(docs)
        .select(col("doc_id"), col("score_milli"))
        .as[(Long, Long)].collect().toMap
      val want = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toMap.map { case (k, v) => k -> brute(v) }
      assert(got == want, s"kernel/brute divergence: ${
        (got.toSet diff want.toSet).take(3)} vs ${(want.toSet diff got.toSet).take(3)}")
    }
  }
}
