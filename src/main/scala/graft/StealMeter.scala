package graft

/** Hypervisor CPU-steal sampling for the bench close (VERDICT r18 item
  * 1). The r18 close measured 11.4% steal mid-close by hand — 56% of
  * runnable time stolen in low-parallelism phases — and that, not the
  * plans, was the band behind two consecutive on-paper 2x-bar breaches.
  * Bench now reads `/proc/stat` itself: the aggregate `cpu` line's
  * jiffy counters include a `steal` field (ticks the hypervisor ran a
  * co-tenant while this guest was runnable), so the steal share of any
  * wall-clock window is the delta ratio between two snapshots. Each
  * draw is stamped with its own window's steal percentage, the close
  * can DEFER a draw start until a short probe window reads calm, and a
  * draw whose mid-draw steal exceeds the bar ranks with the contended
  * bucket — a co-tenant burst can no longer headline as a calm close.
  *
  * Pure parse/arithmetic functions (no I/O) so `StealMeterSpec` pins
  * the counter handling without a Linux host.
  */
object StealMeter {
  /** Mid-draw steal above this percentage marks the draw contended
    * (VERDICT r18: ~1.6% idle baseline, 6%+ under co-tenant load, 11.4%
    * measured mid-close; 3% separates the two populations).
    */
  val StealBar = 3.0

  /** Jiffy counters from the aggregate `cpu` line of a /proc/stat body:
    * (stealJiffies, totalJiffies). Total sums the first eight fields
    * (user nice system idle iowait irq softirq steal) — guest/
    * guest_nice are already folded into user by the kernel. None on
    * anything malformed (non-Linux host, truncated read): the close
    * must degrade to unstamped, never crash.
    */
  def counters(stat: String): Option[(Long, Long)] = {
    val line = stat.linesIterator.find(l =>
      l.startsWith("cpu ") || l.startsWith("cpu\t"))
    line.flatMap { l =>
      val fields = l.split("\\s+").drop(1)
      if (fields.length < 8) None
      else scala.util.Try {
        val vals = fields.take(8).map(_.toLong)
        (vals(7), vals.sum)
      }.toOption
    }
  }

  /** Steal percentage of the window between two snapshots: 100 *
    * Δsteal / Δtotal. None when either snapshot is missing, no jiffies
    * elapsed, or a counter ran backwards (counter wrap / reboot — a
    * nonsense window must not stamp a draw).
    */
  def stealPct(before: Option[(Long, Long)],
      after: Option[(Long, Long)]): Option[Double] =
    (before, after) match {
      case (Some((s0, t0)), Some((s1, t1)))
          if t1 > t0 && s1 >= s0 =>
        Some(100.0 * (s1 - s0) / (t1 - t0))
      case _ => None
    }

  /** One /proc/stat snapshot; None off-Linux or on read failure. */
  def sample(): Option[(Long, Long)] =
    scala.util.Try(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/stat")),
      java.nio.charset.StandardCharsets.UTF_8)).toOption.flatMap(counters)

  /** Steal percentage over a live `windowMillis` probe window. */
  def probe(windowMillis: Long): Option[Double] = {
    val before = sample()
    Thread.sleep(windowMillis)
    stealPct(before, sample())
  }

  /** Defer until a probe window reads at or under `bar`, up to
    * `maxWaitMillis` total; returns the last probe's steal (None when
    * unmeasurable — then there is nothing to gate on and the caller
    * proceeds). The budget-exhausted case also proceeds: a loaded box
    * must still produce a (stamped) artifact, never hang the close.
    */
  def awaitCalm(bar: Double, maxWaitMillis: Long,
      probeMillis: Long = 3000L,
      log: String => Unit = _ => ()): Option[Double] = {
    val deadline = System.nanoTime() + maxWaitMillis * 1000000L
    var last = probe(probeMillis)
    while (last.exists(_ > bar) && System.nanoTime() < deadline) {
      log(f"steal ${last.get}%.1f%% > $bar%.1f%% - deferring")
      Thread.sleep(probeMillis)
      last = probe(probeMillis)
    }
    last
  }
}
