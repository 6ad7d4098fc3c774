package graft.functions

/** Misra-Gries heavy-hitters summary — the deterministic frequent-items
  * sketch (k counters) in its MERGEABLE form: merging is pointwise
  * count addition followed by a shrink that subtracts the (k+1)-th
  * largest count from every counter and drops the non-positives
  * (Agarwal et al., "Mergeable Summaries", PODS 2012 — the
  * construction that makes per-shard/per-batch summaries combine
  * without losing the error guarantee). Complements the
  * randomized count-min sketch ([[CountMinSketch]], the analog of the
  * reference's sketching extension,
  * sdks/java/extensions/sketching/src/main/java/org/apache/beam/sdk/
  * extensions/sketching/SketchFrequencies.java:90) with a
  * deterministic ONE-SIDED bound: for every item,
  * `est <= true <= est + err`, where `err` (tracked explicitly) is
  * the total shrink subtraction and never exceeds n/(k+1). Any item
  * with true frequency > err is GUARANTEED present — the coverage
  * contract streaming hot-items detection needs.
  *
  * A summary is (counters, err, n): counters ≤ k entries, `err` the
  * accumulated undercount bound, `n` the processed weight. All
  * operations are pure; the streaming operator
  * ([[graft.streaming.StatefulV2.heavyHitters]]) folds batches in and
  * the batch side can `merge` per-partition summaries — same bounds
  * either way, by mergeability.
  */
object MisraGries {

  /** counters (≤ k), accumulated under-count bound, processed weight */
  final case class Summary[T](counters: Map[T, Long], err: Long, n: Long) {
    /** est(x): lower bound on x's true count; true ≤ est + err. */
    def est(x: T): Long = counters.getOrElse(x, 0L)
    def topK(m: Int): Seq[(T, Long)] =
      counters.toSeq.sortBy { case (_, c) => -c }.take(m)
  }

  def empty[T]: Summary[T] = Summary(Map.empty, 0L, 0L)

  /** Keep the k largest counters, subtracting the (k+1)-th largest
    * from every survivor — the shrink that preserves
    * `est <= true <= est + err` with err growing by exactly the
    * subtracted amount per remaining counter's perspective. */
  private def shrink[T](m: Map[T, Long], k: Int): (Map[T, Long], Long) =
    if (m.size <= k) (m, 0L)
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      (m.collect { case (t, c) if c > cut => t -> (c - cut) }, cut)
    }

  /** Fold a batch of exact (item, weight) counts into the summary.
    * Weights must be strictly positive — every advertised bound
    * (`est <= true <= est + err`, err ≤ n/(k+1), coverage) assumes
    * non-negative increments, so a bad weight fails loudly here
    * rather than silently voiding the guarantees downstream. */
  def addAll[T](s: Summary[T], batch: Iterable[(T, Long)], k: Int): Summary[T] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val combined = batch.foldLeft(s.counters) { case (m, (t, w)) =>
      require(w > 0, s"Misra-Gries weights must be > 0, got $w for item $t")
      m.updated(t, m.getOrElse(t, 0L) + w)
    }
    val (kept, cut) = shrink(combined, k)
    Summary(kept, s.err + cut, s.n + batch.iterator.map(_._2).sum)
  }

  /** Merge two summaries (shard combine): pointwise sum + shrink.
    * Bounds compose: err ≤ errA + errB + cut ≤ (nA + nB)/(k+1). */
  def merge[T](a: Summary[T], b: Summary[T], k: Int): Summary[T] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val combined = b.counters.foldLeft(a.counters) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    val (kept, cut) = shrink(combined, k)
    Summary(kept, a.err + b.err + cut, a.n + b.n)
  }
}
