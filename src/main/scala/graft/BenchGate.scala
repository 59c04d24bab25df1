package graft

/** Pure decision logic for [[Bench]]'s machine-load gate and its
  * re-measure escalation (spec-pinned in BenchGateSpec, separate from
  * the measurement plumbing so the rules are testable without a
  * SparkSession).
  *
  * Three rounds of published bench artifacts (r10–r12) were burned by
  * external load the sentinels DETECTED but the harness published
  * anyway. The rules here make contamination block publication instead
  * of annotating it:
  *
  *  - suite start REFUSES (or sleep-waits, up to a budget) while the
  *    1-minute loadavg exceeds a threshold — loadavg is the one signal
  *    that sees partial multicore load before we start burning cores
  *    ourselves;
  *  - any query whose batch tripped a contention trigger (spread,
  *    spin, or external-cores) is re-measured until two CONSECUTIVE
  *    batch medians agree within an agreement ratio, bounded by a
  *    batch cap;
  *  - the published headline is the MINIMUM of the batch medians — a
  *    contaminated batch can only lose to a cleaner one, never drag
  *    the number up.
  */
object BenchGate {

  /** Sleep-wait until `readLoad()` drops to `threshold` or the budget
    * is exhausted; returns (final load, seconds waited). A negative
    * load reading (no /proc) passes the gate — refusing to bench on
    * such a box would be refusing forever.
    */
  def gateWait(readLoad: () => Double, sleep: Int => Unit, threshold: Double,
               budgetS: Int, stepS: Int = 5): (Double, Int) = {
    var cur = readLoad()
    var waited = 0
    while (cur > threshold && waited < budgetS) {
      sleep(stepS); waited += stepS; cur = readLoad()
    }
    (cur, waited)
  }

  /** Two consecutive batch medians "agree" when the larger is within
    * `ratio` of the smaller (guarded against a zero-time batch).
    */
  def agreeWithin(m1: Double, m2: Double, ratio: Double = 1.3): Boolean =
    math.max(m1, m2) <= math.max(math.min(m1, m2), 1e-9) * ratio

  /** The published per-query headline over all measured batches: the
    * minimum of the batch medians. Median-within-batch discards the
    * odd descheduled iteration; min-across-batches discards the odd
    * contaminated batch.
    */
  def headline(batchMedians: Seq[Double]): Double = batchMedians.min

  /** Whether the escalation loop should stop after observing the
    * given batch-median sequence: stop once the last two agree.
    */
  def settled(batchMedians: Seq[Double], ratio: Double = 1.3): Boolean =
    batchMedians.length >= 2 &&
      agreeWithin(batchMedians(batchMedians.length - 2), batchMedians.last, ratio)
}
