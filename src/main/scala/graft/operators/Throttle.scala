package graft.operators

/** Client-side adaptive throttling for remote-call operators
  * (enrichment lookups, inference endpoints, rate-limited sinks).
  *
  * At 100 TB a pipeline fans a lookup out from thousands of tasks; when
  * the backend brownouts, naive retry storms amplify the overload. The
  * published client-side fix (SRE book §"Handling Overload", the
  * algorithm Beam ships for its IOs — reference:
  * sdks/java/io/components/src/main/java/org/apache/beam/sdk/io/
  * components/throttling/AdaptiveThrottler.java:31) tracks requests vs
  * accepts over a sliding window and preemptively rejects client-side
  * with probability max(0, (requests - K·accepts) / (requests + 1)).
  *
  * One throttler instance lives per partition-task client (the same
  * lifecycle slot as Enrichment's per-partition client), so the control
  * loop needs no coordination across executors — each task observes its
  * own share of backend health. Deterministic under an injected clock
  * and RNG, which is how the spec pins behavior.
  */
final class AdaptiveThrottler(
    samplePeriodMs: Long = 60000L,
    bucketMs: Long = 1000L,
    overloadRatio: Double = 2.0,
    rng: java.util.Random = new java.util.Random()) extends Serializable {
  require(overloadRatio > 1.0, "overloadRatio must exceed 1.0")
  require(bucketMs > 0 && samplePeriodMs % bucketMs == 0,
    s"samplePeriodMs ($samplePeriodMs) must be a positive multiple of " +
      s"bucketMs ($bucketMs) — truncation would silently shrink the window")

  private val nBuckets = (samplePeriodMs / bucketMs).toInt
  private val reqs = new Array[Long](nBuckets)
  private val oks = new Array[Long](nBuckets)
  private val stamps = Array.fill(nBuckets)(Long.MinValue) // bucket start ms

  /** Ring-buffer bucket for `now`, lazily zeroed on reuse. */
  private def idx(now: Long): Int = {
    val b = now / bucketMs
    val i = ((b % nBuckets + nBuckets) % nBuckets).toInt
    val start = b * bucketMs
    if (stamps(i) != start) { stamps(i) = start; reqs(i) = 0; oks(i) = 0 }
    i
  }

  private def windowSum(a: Array[Long], now: Long): Long = {
    val lo = now - samplePeriodMs
    var s = 0L
    var i = 0
    while (i < nBuckets) { if (stamps(i) > lo) s += a(i); i += 1 }
    s
  }

  /** max(0, (all - K·ok) / (all + 1)) over the sliding window. */
  def throttlingProbability(now: Long): Double = {
    val all = windowSum(reqs, now)
    if (all == 0) return 0.0
    val ok = windowSum(oks, now)
    math.max(0.0, (all - overloadRatio * ok) / (all + 1.0))
  }

  /** Call once per intended request; true ⇒ drop/delay it (and call
    * again after the delay). The attempt is counted either way. */
  def throttleRequest(now: Long): Boolean = {
    val p = throttlingProbability(now)
    reqs(idx(now)) += 1
    rng.nextDouble() < p
  }

  /** Call once per request the backend accepted. */
  def successfulRequest(now: Long): Unit =
    oks(idx(now)) += 1
}

object Throttle {

  /** Wrap a remote call with adaptive throttling: throttled attempts
    * invoke `backoff` (sleep, yield, or test-clock advance) and retry;
    * accepted calls feed the success signal back. A call that throws
    * counts as sent-but-not-accepted — exactly the signal that raises
    * the reject probability on the next attempts. Use inside
    * `mapPartitions` beside the per-partition client (see
    * [[Enrichment]]), one throttler per task. */
  def call[A, B](t: AdaptiveThrottler, clock: () => Long,
      backoff: () => Unit)(f: A => B)(a: A): B = {
    while (t.throttleRequest(clock())) backoff()
    val b = f(a)
    t.successfulRequest(clock())
    b
  }
}
