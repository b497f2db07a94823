package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("approx_percentile tracks exact percentile within 5% per group") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("a90"),
        expr("percentile(l_extendedprice, 0.9)").as("e90"))
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, a50, e50, a90, e90) =>
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$flag p50: approx $a50 vs exact $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"$flag p90: approx $a90 vs exact $e90")
    }
  }

  test("approx_count_distinct at rsd 0.02 tracks exact distinct within 5% per group") {
    // the band the query's tol_ok verdict declares; the DEFAULT rsd 0.05
    // sketch measured 8.6% off on one sf0.01 group, which is why the
    // query pins rsd = 0.02
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("a"),
        countDistinct(col("l_orderkey")).as("e"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"$flag: approx $a vs exact $e")
    }
  }

  test("HLL union of partial sketches tracks exact distinct within 5% " +
      "and stays consistent with the single-level sketch") {
    // agg_hll_partitioned's contract: sketches built per FINE partition
    // and re-merged by a coarser consumer must (a) land inside the ±5%
    // tolerance band vs exact COUNT(DISTINCT), and (b) track a
    // directly-built per-group sketch closely — the merged REGISTER
    // state is lossless (slot-wise max is associative), but Datasketches
    // may swap the HIP estimator for the composite one on unioned
    // sketches, so the two estimates are banded, not exact-equal.
    val li = Tables.lineitem(spark, sfDir)
    val merged = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_orderkey"), lit(14)).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("a"))
    val direct = li
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"), lit(14)))
        .as("d"),
        countDistinct(col("l_orderkey")).as("e"))
    val rows = merged.join(direct, "l_returnflag")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, a, d, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"$flag: merged-sketch $a vs exact $e")
      assert(math.abs(a - d).toDouble / e < 0.02,
        s"$flag: union-of-partials $a vs direct sketch $d")
    }
  }

  test("count-min: merged shard sketches never underestimate, stay within " +
      "eps*N, and match the single global sketch") {
    val ev = Tables.events(spark, sfDir).filter(col("event_type").isNotNull)
    val exact = ev.groupBy(col("event_type")).count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val got = Aggregates
      .countMinEstimates(Tables.events(spark, sfDir), "event_type", "user_id")
      .toMap
    assert(got.keySet === exact.keySet)
    val slack = math.ceil(0.001 * n).toLong // the query's eps
    got.foreach { case (t, est) =>
      assert(est >= exact(t), s"$t: CMS must never underestimate " +
        s"($est < ${exact(t)})")
      assert(est <= exact(t) + slack,
        s"$t: $est exceeds exact ${exact(t)} + eps*N $slack")
    }
    // merge-order independence: the driver-merged shard sketches answer
    // exactly like ONE globally-built sketch (counter sums commute)
    val globalBytes = ev
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)"))
      .head().getAs[Array[Byte]](0)
    val global = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(globalBytes))
    got.foreach { case (t, est) =>
      assert(est === global.estimateCount(t),
        s"$t: shard-merged $est != global ${global.estimateCount(t)}")
    }
  }

  test("the four sketch queries report tol_ok=1 on every row (r12 hashed verdict)") {
    // the driver-green contract: each query's hashed output carries the
    // exact aggregate + the in-query tolerance verdict, so this is the
    // same condition the oracle hash pins — kept here so a sketch
    // regression fails fast in the suite, not only at the driver
    Seq("agg_approx_distinct", "agg_hll_partitioned", "agg_countmin",
      "agg_approx_percentile").foreach { q =>
      val out = graft.catalog.RelationalQueries.queries(q)(spark, sfDir)
      val bad = out.filter(col("tol_ok") =!= 1L).count()
      assert(bad == 0L, s"$q: $bad rows outside the tolerance band")
      assert(out.count() > 0, s"$q: empty output")
    }
  }

  test("the tolerance verdict is FALSIFIABLE: a degenerate sketch fails the same band") {
    // guards the r12 verdict pattern against the tautology critique: the
    // identical |est − exact| ≤ 5%·max(exact,1) check the queries hash
    // must reject a sketch that is actually broken. eps=0.9 → a ~4-cell
    // Count-Min where the event types collide and point estimates absorb
    // other types' counts wholesale.
    val ev = Tables.events(spark, sfDir).filter(col("event_type").isNotNull)
    val exact = ev.groupBy(col("event_type")).count()
      .as[(String, Long)].collect().toMap
    val degenerate = Aggregates
      .countMinEstimates(Tables.events(spark, sfDir), "event_type", "user_id",
        eps = 0.9)
      .toMap
    val outOfBand = degenerate.count { case (t, e) =>
      math.abs(e - exact(t)).toDouble > 0.05 * math.max(exact(t), 1L) }
    assert(outOfBand > 0,
      s"a ~4-cell sketch must overcount beyond the 5% band: $degenerate vs $exact")
  }

  // The oracled agg_collect_set query serializes to STRING (the driver's
  // comparator can't hash list cells); this keeps the ARRAY-typed form itself
  // under test: numeric sort order, distinctness, and agreement with the
  // serialized query output.
  test("collect_set array form is sorted, distinct, and matches the string-serialized query") {
    val arrayForm = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        sort_array(collect_set(col("l_linestatus"))).as("statuses"),
        sort_array(collect_set(col("l_linenumber"))).as("linenos"))
      .orderBy(col("l_returnflag"))
      .as[(String, Seq[String], Seq[Int])].collect()
    assert(arrayForm.nonEmpty)
    arrayForm.foreach { case (flag, statuses, linenos) =>
      assert(statuses == statuses.distinct.sorted, s"$flag statuses not sorted-distinct")
      assert(linenos == linenos.distinct.sorted, s"$flag linenos not numerically sorted-distinct")
    }
    val serialized = graft.SparkEntry.queries("agg_collect_set")(spark, sfDir)
      .as[(String, String, String)].collect()
      .map { case (flag, st, ln) => flag -> ((st, ln)) }.toMap
    arrayForm.foreach { case (flag, statuses, linenos) =>
      assert(serialized(flag)._1 == statuses.mkString(","), s"$flag statuses serialization drift")
      assert(serialized(flag)._2 == linenos.mkString(","), s"$flag linenos serialization drift")
    }
  }
}
