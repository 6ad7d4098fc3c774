package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}

/** User-facing pipeline metrics — Beam's `Metrics` API
  * (sdks/java/core/.../metrics/Metrics.java:146-187: `counter`,
  * `distribution`, `gauge`, each updatable from INSIDE user processing
  * code and aggregated across workers by the runner).
  *
  * Spark mapping: accumulators ARE that contract — executor-side
  * `add`s merge into a driver-visible value, with task-failure
  * re-execution handled by the scheduler (counts from failed task
  * attempts of RESULT stages are discarded; speculative duplicates of
  * successful attempts are merged once). `Counter` is Spark's stock
  * `LongAccumulator`; `Distribution` (metrics/Distribution.java:21-25:
  * sum/count/min/max of observed longs) is the custom [[DistributionAcc]]
  * below; `Gauge` (latest-value, e.g. "current model version") is
  * last-writer-wins, which across unordered workers is only meaningful
  * for values that are equal within a batch — modeled as a counter
  * holding max. Declarative per-batch metrics (`df.observe`) remain the
  * better fit for column aggregates (ScaleSpec); this facade is for
  * imperative instrumentation inside `mapPartitions` bodies —
  * Enrichment clients, inference handlers, decode loops.
  */
object Metrics {

  /** Beam `Distribution`: sum/count/min/max of updates. */
  final class DistributionAcc
      extends AccumulatorV2[Long, (Long, Long, Long, Long)] {
    private var sum = 0L
    private var n = 0L
    private var mn = Long.MaxValue
    private var mx = Long.MinValue

    override def isZero: Boolean = n == 0L
    override def copy(): DistributionAcc = {
      val c = new DistributionAcc
      c.sum = sum; c.n = n; c.mn = mn; c.mx = mx
      c
    }
    override def reset(): Unit = { sum = 0L; n = 0L; mn = Long.MaxValue; mx = Long.MinValue }
    override def add(v: Long): Unit = {
      sum += v; n += 1
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    override def merge(other: AccumulatorV2[Long, (Long, Long, Long, Long)]): Unit =
      other match {
        case d: DistributionAcc if d.n > 0 =>
          sum += d.sum; n += d.n
          if (d.mn < mn) mn = d.mn
          if (d.mx > mx) mx = d.mx
        case _ => ()
      }
    /** (sum, count, min, max) — min/max are 0 when empty (Beam reports
      * an empty DistributionResult similarly). */
    override def value: (Long, Long, Long, Long) =
      if (n == 0) (0L, 0L, 0L, 0L) else (sum, n, mn, mx)
    def mean: Double = { val (s, c, _, _) = value; if (c == 0) 0.0 else s.toDouble / c }
  }

  /** `Metrics.counter(namespace, name)` — register on the driver, `add`
    * from executors. */
  def counter(spark: SparkSession, namespace: String, name: String): LongAccumulator =
    spark.sparkContext.longAccumulator(s"$namespace.$name")

  /** `Metrics.distribution(namespace, name)`. */
  def distribution(spark: SparkSession, namespace: String,
      name: String): DistributionAcc = {
    val acc = new DistributionAcc
    spark.sparkContext.register(acc, s"$namespace.$name")
    acc
  }

  /** Beam `Gauge` (metrics/Metrics.java `gauge`: latest reported
    * value): last-writer-wins by report time. Each `add` stamps the
    * value with epoch millis (`System.currentTimeMillis`, the
    * `Instant.now` parity Beam's GaugeResult records — NOT nanoTime,
    * whose origin is arbitrary per JVM and so cross-executor
    * incomparable); merge keeps the later stamp — the
    * same "latest across workers" contract Beam's GaugeResult carries
    * (and the same caveat: cross-worker clock comparison is only
    * meaningful for values that converge, e.g. "current model
    * version"; an unmerged empty gauge reads 0, Beam's empty result). */
  final class GaugeAcc extends AccumulatorV2[Long, Long] {
    private var stamp = Long.MinValue
    private var v = 0L
    override def isZero: Boolean = stamp == Long.MinValue
    override def copy(): GaugeAcc = {
      val c = new GaugeAcc
      c.stamp = stamp; c.v = v
      c
    }
    override def reset(): Unit = { stamp = Long.MinValue; v = 0L }
    // wall clock, as Beam's Gauge (Instant.now): nanoTime origins are
    // arbitrary per JVM, so cross-executor "latest" needs epoch time
    override def add(x: Long): Unit = { stamp = System.currentTimeMillis(); v = x }
    /** Beam's `Gauge.set` spelling. */
    def set(x: Long): Unit = add(x)
    // >= : wall-clock millis tie (two sets in the same ms) resolves to
    // the incoming side — last-writer-wins must not silently keep the
    // older value on a granularity collision
    override def merge(other: AccumulatorV2[Long, Long]): Unit = other match {
      case g: GaugeAcc if !g.isZero && g.stamp >= stamp => stamp = g.stamp; v = g.v
      case _ => ()
    }
    override def value: Long = v
  }

  /** `Metrics.gauge(namespace, name)` — completes the counter /
    * distribution / gauge trio. */
  def gauge(spark: SparkSession, namespace: String, name: String): GaugeAcc = {
    val acc = new GaugeAcc
    spark.sparkContext.register(acc, s"$namespace.$name")
    acc
  }
}
