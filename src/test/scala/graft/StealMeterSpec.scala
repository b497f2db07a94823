package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the /proc/stat steal arithmetic behind the r19 steal-gated
  * bench close (VERDICT r18 item 1) — the parse and the window math are
  * pure, so a wrong field index or a wrap-through-negative window would
  * otherwise only surface as a silently mis-stamped artifact.
  */
class StealMeterSpec extends AnyFunSuite {
  // aggregate line first, per-cpu lines after — only "cpu " may match
  private val stat =
    """cpu  100 0 50 800 20 0 5 25 0 0
      |cpu0 50 0 25 400 10 0 2 12 0 0
      |intr 12345
      |""".stripMargin

  test("counters reads steal and the 8-field total from the cpu line") {
    // total = 100+0+50+800+20+0+5+25 = 1000, steal = field 8 = 25
    assert(StealMeter.counters(stat) === Some((25L, 1000L)))
  }

  test("counters tolerates malformed input with None, never a throw") {
    assert(StealMeter.counters("") === None)
    assert(StealMeter.counters("cpu0 1 2 3 4 5 6 7 8") === None) // no aggregate
    assert(StealMeter.counters("cpu  1 2 3") === None) // too few fields
    assert(StealMeter.counters("cpu  a b c d e f g h") === None) // non-numeric
  }

  test("counters ignores guest fields beyond the first eight") {
    // guest jiffies are already included in user — summing them would
    // double-count and understate the steal share
    val withGuest = "cpu  100 0 50 800 20 0 5 25 999 999\n"
    assert(StealMeter.counters(withGuest) === Some((25L, 1000L)))
  }

  test("stealPct is the delta ratio between snapshots") {
    // 10 stolen of 200 elapsed -> 5%
    val p = StealMeter.stealPct(Some((25L, 1000L)), Some((35L, 1200L)))
    assert(p.exists(v => math.abs(v - 5.0) < 1e-9))
    // calm window: zero stolen
    assert(StealMeter.stealPct(Some((25L, 1000L)), Some((25L, 1100L)))
      .contains(0.0))
  }

  test("stealPct refuses nonsense windows") {
    assert(StealMeter.stealPct(None, Some((1L, 10L))) === None)
    assert(StealMeter.stealPct(Some((1L, 10L)), None) === None)
    // no elapsed jiffies
    assert(StealMeter.stealPct(Some((1L, 10L)), Some((1L, 10L))) === None)
    // counters ran backwards (wrap / reboot)
    assert(StealMeter.stealPct(Some((5L, 10L)), Some((4L, 20L))) === None)
    assert(StealMeter.stealPct(Some((5L, 20L)), Some((6L, 10L))) === None)
  }

  test("sample works on this host (Linux) and feeds a sane window") {
    // the sandbox is Linux — a live read must parse, and a short window
    // must land in [0, 100]
    val s0 = StealMeter.sample()
    assert(s0.nonEmpty, "/proc/stat must parse on the build host")
    Thread.sleep(50)
    val pct = StealMeter.stealPct(s0, StealMeter.sample())
    assert(pct.forall(p => p >= 0.0 && p <= 100.0))
  }
}
