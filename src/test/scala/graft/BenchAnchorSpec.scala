package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round contention detector (VERDICT r16 item 5): the
  * r16 close passed the 1.15 med/min bar while every key sat a uniform
  * ~1.25x over the r15 calm close — exactly the shape `drift` must
  * catch. Pure arithmetic, no Spark session.
  */
class BenchAnchorSpec extends AnyFunSuite {

  private val anchors = Map(
    "a" -> 0.4, "b" -> 0.5, "c" -> 1.0, "d" -> 0.6,
    "e" -> 0.8, "f" -> 0.3, "g" -> 0.45)

  test("uniform 1.25x board shift is flagged (the r16 failure mode)") {
    val measured = anchors.map { case (k, v) => k -> v * 1.25 }
    val d = BenchAnchor.drift(measured, anchors)
    assert(d.exists(x => math.abs(x - 1.25) < 1e-9))
    assert(d.exists(_ > BenchAnchor.DriftBar))
  }

  test("a calm board with one noisy key stays under the bar (median, not mean)") {
    val measured = anchors.map { case (k, v) =>
      k -> (if (k == "c") v * 5.0 else v * 1.02)
    }
    val d = BenchAnchor.drift(measured, anchors).get
    assert(math.abs(d - 1.02) < 1e-9, s"median must shrug off one outlier, got $d")
  }

  test("even shared-key count takes the mid-pair mean") {
    val a = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0,
      "e" -> 1.0, "f" -> 1.0)
    val m = Map("a" -> 1.0, "b" -> 1.1, "c" -> 1.2, "d" -> 1.3,
      "e" -> 1.4, "f" -> 1.5)
    val d = BenchAnchor.drift(m, a).get
    assert(math.abs(d - 1.25) < 1e-9)
  }

  test("fewer than MinKeys shared keys -> None (subset sweeps skip the check)") {
    val measured = Map("a" -> 0.5, "b" -> 0.6) // 2 < MinKeys
    assert(BenchAnchor.drift(measured, anchors).isEmpty)
    assert(BenchAnchor.drift(Map.empty[String, Double], anchors).isEmpty)
    assert(BenchAnchor.drift(anchors, Map.empty).isEmpty)
  }

  test("nonpositive anchor values are excluded, never divided by") {
    val bad = anchors + ("a" -> 0.0) + ("b" -> -1.0)
    // 5 valid anchors remain < MinKeys=6 -> None rather than Infinity
    assert(BenchAnchor.drift(anchors.map { case (k, v) => k -> v }, bad).isEmpty)
  }

  test("parseAnchors reads the committed file format and skips junk") {
    val json =
      """{ "note": "anchors: 1.5 is not a value", "head": "1abcb89",
        |  "anchors": { "fn_date": 0.463, "stream_dedup": 0.419,
        |    "window_rank": 0.473 } }""".stripMargin
    val m = BenchAnchor.parseAnchors(json)
    assert(m === Map("fn_date" -> 0.463, "stream_dedup" -> 0.419,
      "window_rank" -> 0.473))
    assert(BenchAnchor.parseAnchors("not json at all") === Map.empty)
    assert(BenchAnchor.parseAnchors("""{"no_anchor_key": 1}""") === Map.empty)
  }

  test("numeric pairs AFTER the anchors map are not absorbed (ADVICE r17)") {
    val json =
      """{ "anchors": { "fn_date": 0.463, "window_rank": 0.473 },
        |  "total_min": 88.1, "draws": 3 }""".stripMargin
    val m = BenchAnchor.parseAnchors(json)
    assert(m === Map("fn_date" -> 0.463, "window_rank" -> 0.473),
      s"pairs past the map's closing brace must be ignored, got $m")
    // tolerant of a truncated file: no closing brace -> scan to end
    val trunc = """{ "anchors": { "fn_date": 0.463, "window_rank": 0.47"""
    assert(BenchAnchor.parseAnchors(trunc) ===
      Map("fn_date" -> 0.463, "window_rank" -> 0.47))
  }

  test("the committed anchor file itself parses and clears MinKeys") {
    val m = BenchAnchor.load("tools/bench_anchor.json")
    assert(m.size >= BenchAnchor.MinKeys,
      s"committed anchor file must carry >= ${BenchAnchor.MinKeys} keys, got ${m.size}")
    assert(m.values.forall(_ > 0))
    // every anchor key must still be a declared query, or the drift
    // check silently shrinks as the surface evolves
    m.keySet.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"anchor key $k is not a query")
    }
  }
}
