package graft

/** Cross-round contention detector for the bench close (VERDICT r16
  * item 5). The per-draw med/min redraw bar catches WITHIN-draw
  * contention but is blind to uniform machine load that shifts min and
  * median together: the r16 close drew med/min 1.143 (under the 1.15
  * bar) while every key — including rows untouched for eight rounds —
  * sat a uniform ~1.25x over the r15 calm close. The fix is a fixed
  * anchor: ~12 stable keys whose calm min-of-3 values are committed in
  * `tools/bench_anchor.json`; a draw whose anchor-median ratio exceeds
  * [[DriftBar]] is treated as contended (redraw if budget remains,
  * else the artifact is stamped `"contended":true`) so a uniformly
  * inflated board can never pass as a calm close on paper.
  *
  * Pure functions (no Spark) so `BenchAnchorSpec` pins the arithmetic
  * without a session.
  */
object BenchAnchor {
  /** Untouched-key median-ratio bar: above this, the box is loaded. */
  val DriftBar = 1.2

  /** Fewer shared keys than this and the drift is not meaningful
    * (subset sweeps rarely include the anchor rows) — skip the check.
    */
  val MinKeys = 6

  /** Minimal parser for the committed anchor file's `"anchors"` map —
    * flat `"key": number` pairs, written by hand, no nested objects
    * after the map opens. A regex keeps Bench free of JSON-library
    * coupling; anything unparseable yields an empty map (check skipped,
    * never a crashed close).
    */
  def parseAnchors(json: String): Map[String, Double] = {
    val at = json.indexOf("\"anchors\"")
    if (at == -1) return Map.empty
    val open = json.indexOf('{', at)
    if (open == -1) return Map.empty
    // The anchors map is flat by contract, so its FIRST closing brace
    // ends it — truncating there keeps numeric key/value pairs placed
    // after the map in a future hand edit from being absorbed as
    // anchors (ADVICE r17). No close brace → scan to end (tolerant of
    // a truncated file; the entry regex still only matches pairs).
    val close = json.indexOf('}', open)
    val body = json.substring(open, if (close == -1) json.length else close)
    val entry = """"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)""".r
    entry.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._1 != "anchors")
      .toMap
  }

  /** Median per-key ratio `measured(k) / anchor(k)` over the shared key
    * set; None when fewer than [[MinKeys]] are shared (or an anchor is
    * nonpositive — a corrupt file must not divide by zero).
    */
  def drift(measured: collection.Map[String, Double],
      anchors: Map[String, Double]): Option[Double] = {
    val ratios = anchors.toSeq.collect {
      case (k, a) if a > 0 && measured.contains(k) => measured(k) / a
    }.sorted
    if (ratios.size < MinKeys) None
    else Some(
      if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2)
  }

  /** Reads and parses the committed anchor file; empty map if absent
    * (Bench may run outside the repo root — e.g. scale rehearsals).
    */
  def load(path: String = "tools/bench_anchor.json"): Map[String, Double] =
    scala.util.Try(parseAnchors(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)))
      .getOrElse(Map.empty)
}
