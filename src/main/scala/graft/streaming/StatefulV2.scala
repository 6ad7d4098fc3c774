package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Beam State/Timer parity on Spark 4's `transformWithState` — the
  * successor to `flatMapGroupsWithState` ([[Stateful]]) with the full
  * Beam state-cell vocabulary (SURVEY §2.10):
  *
  * | Beam (state/)                    | here                        |
  * |----------------------------------|-----------------------------|
  * | ValueState (ValueState.java:27)  | handle.getValueState        |
  * | BagState (BagState.java:31)      | handle.getListState         |
  * | MapState (MapState.java:33)      | handle.getMapState          |
  * | MultimapState (MultimapState.java:33) | [[MultimapUserState]]  |
  * | OrderedListState (OrderedListState.java:28) | [[OrderedListUserState]] |
  * | @TimerId / Timer (Timer.java:42) | handle.registerTimer        |
  * | state TTL (Deduplicate.java:70)  | TTLConfig(Duration)         |
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — which is also the provider
  * to run at 100 TB: per-key state lives off-heap/on-disk per
  * partition, checkpointed incrementally via changelog.
  */
object StatefulV2 {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Prepare a session for BATCH `transformWithState` (r19): the
    * executor-side store still loads through the provider (only
    * RocksDB implements the TWS column families), and the provider's
    * load path reports to the driver's StateStoreCoordinator RPC
    * endpoint — which Spark only creates when a STREAMING query
    * starts. A pure-batch session (graft.Verify) therefore fails with
    * `RpcEndpointNotFoundException: ...StateStoreCoordinator` unless
    * the coordinator is touched first; the accessor is public on the
    * classic StreamingQueryManager. */
  def ensureBatchTws(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      RocksDbProvider)
    // `private[sql]` in Scala but public at the JVM level — reflect
    spark.streams.getClass.getMethod("stateStoreCoordinator")
      .invoke(spark.streams)
    ()
  }

  /** `toArray` for an unbounded-generic buffer without threading a
    * ClassTag through every processor's public signature: ListState's
    * appendList/put only ITERATE the array (T is erased), so an
    * Object-array cast is safe here. */
  private def toArr[T](b: scala.collection.mutable.ArrayBuffer[T]): Array[T] =
    b.toArray[Any](scala.reflect.ClassTag.Any).asInstanceOf[Array[T]]

  // ===== Beam's two remaining user-state KINDS (r19, VERDICT r18 #6):
  // MultimapState and OrderedListState as thin, documented encodings
  // over the handle's MapState — constructed inside any processor's
  // init() from a MapState it owns, so they compose with timers/TTL
  // exactly like the primitive cells.

  /** Beam MultimapState (sdks/java/core/.../state/MultimapState.java:33
    * — put/get/remove/keys/entries where get returns a BAG per map
    * key), encoded over `MapState[MK, Seq[MV]]`: one state row per map
    * key holding that key's bag. put() is read-modify-write of ONE
    * bag row (Beam's runners pay the same per-mapkey rewrite); at
    * 100 TB a hot map key's bag is the row that grows — same contract
    * as Beam, worth a window/TTL bound in the owning processor. */
  final class MultimapUserState[MK, MV](m: MapState[MK, Seq[MV]]) {
    def put(k: MK, v: MV): Unit =
      m.updateValue(k, (if (m.containsKey(k)) m.getValue(k) else Seq.empty[MV]) :+ v)
    /** The bag under `k` (empty if absent) — MultimapState.get(). */
    def get(k: MK): Seq[MV] =
      if (m.containsKey(k)) m.getValue(k) else Seq.empty[MV]
    def containsKey(k: MK): Boolean = m.containsKey(k)
    /** Drop the whole bag under `k` — MultimapState.remove(). */
    def remove(k: MK): Unit = m.removeKey(k)
    def keys(): Iterator[MK] = m.keys()
    /** Flattened (key, value) pairs — MultimapState.entries(). */
    def entries(): Iterator[(MK, MV)] =
      m.iterator().flatMap { case (k, vs) => vs.iterator.map((k, _)) }
    def clear(): Unit = m.clear()
  }

  /** Beam OrderedListState (state/OrderedListState.java:28 —
    * timestamped values readable/clearable by TIMESTAMP RANGE),
    * encoded over `MapState[Long, Seq[V]]` keyed by the timestamp
    * (multiple values per instant keep arrival order in their bag).
    * Range reads filter the map iterator and sort client-side — the
    * map holds one row per DISTINCT timestamp, so a read touches only
    * resident rows of this user key, and clearRange() deletes whole
    * timestamp rows (the GC path a watermark-driven replay needs). */
  final class OrderedListUserState[V](m: MapState[Long, Seq[V]]) {
    def add(tsMs: Long, v: V): Unit =
      m.updateValue(tsMs, (if (m.containsKey(tsMs)) m.getValue(tsMs)
        else Seq.empty[V]) :+ v)
    /** All (ts, value) pairs with minMs <= ts < maxMs, ts-ascending;
      * values at equal ts in insertion order — readRange(). */
    def readRange(minMs: Long, maxMs: Long): Seq[(Long, V)] =
      m.iterator().filter { case (ts, _) => ts >= minMs && ts < maxMs }
        .toSeq.sortBy(_._1)
        .flatMap { case (ts, vs) => vs.map((ts, _)) }
    /** The full ordered contents — OrderedListState.read(). */
    def read(): Seq[(Long, V)] = readRange(Long.MinValue, Long.MaxValue)
    /** Delete every entry with minMs <= ts < maxMs — clearRange(). */
    def clearRange(minMs: Long, maxMs: Long): Unit =
      m.keys().filter(ts => ts >= minMs && ts < maxMs).toSeq
        .foreach(m.removeKey)
    def isEmpty: Boolean = !m.keys().hasNext
    def clear(): Unit = m.clear()
  }

  /** Ordered-buffer REPLAY through [[OrderedListUserState]]: buffer
    * (ts, value) per key, emit in (ts, value) order with a per-key
    * sequence index. Streaming: each watermark advance drains exactly
    * the ripe prefix via readRange(−∞, watermark) + clearRange (the
    * range-read contract OrderedListState exists for) — late-arriving
    * rows inside the watermark still sort into their place because
    * emission happens only when their timestamp range closes.
    * `emitOnInput = true` is the BATCH path (timers never fire in a
    * batch run): buffer then drain at the end of the input iterator —
    * same code path through the state encoding, spec'd ≡ streaming. */
  class OrderedReplayProcessor[K](emitOnInput: Boolean)
      extends StatefulProcessor[K, (K, java.sql.Timestamp, Long), (K, Long, Long, Long)] {
    @transient private var buf: OrderedListUserState[Long] = _
    @transient private var seq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = new OrderedListUserState[Long](
        getHandle.getMapState[Long, Seq[Long]]("buf", Encoders.scalaLong,
          org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder[Seq[Long]](), TTLConfig.NONE))
      seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    private def drain(key: K, uptoMs: Long): Iterator[(K, Long, Long, Long)] = {
      val ripe = buf.readRange(Long.MinValue, uptoMs)
      if (ripe.isEmpty) Iterator.empty
      else {
        buf.clearRange(Long.MinValue, uptoMs)
        var s = if (seq.exists()) seq.get() else 0L
        val out = ripe.sortBy(p => (p._1, p._2)).map { case (ts, v) =>
          s += 1; (key, s, ts, v)
        }
        seq.update(s)
        out.iterator
      }
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, Long)],
        timers: TimerValues): Iterator[(K, Long, Long, Long)] = {
      rows.foreach { case (_, ts, v) => buf.add(ts.getTime, v) }
      if (emitOnInput) drain(key, Long.MaxValue)
      else {
        // one timer at the current frontier; re-registered every batch
        // so each watermark advance ripens the next prefix
        getHandle.registerTimer(timers.getCurrentWatermarkInMs() + 1)
        Iterator.empty
      }
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[(K, Long, Long, Long)] = {
      // ripe = ts <= watermark (the watermark PASSED the instant);
      // re-arm while anything is still buffered so the next watermark
      // advance wakes this key even without new input (the armChain
      // discipline every event-time processor here follows)
      val out = drain(key, timers.getCurrentWatermarkInMs() + 1)
      if (!buf.isEmpty)
        getHandle.registerTimer(timers.getCurrentWatermarkInMs() + 1)
      out
    }
  }

  /** [[OrderedReplayProcessor]] as an operator: input (key, ts,
    * value), output (key, seq, tsMs, value) in per-key (ts, value)
    * order. Batch and streaming from the ONE processor — the batch
    * path sets `emitOnInput` and runs TimeMode.None (timers cannot
    * fire in batch runs); streaming callers attach `.withWatermark`
    * on the ts column first. */
  def orderedReplay[K: Encoder](ds: Dataset[(K, java.sql.Timestamp, Long)],
      emitOnInput: Boolean = false)(
      implicit outEnc: Encoder[(K, Long, Long, Long)]): Dataset[(K, Long, Long, Long)] =
    ds.groupByKey(_._1).transformWithState(
      new OrderedReplayProcessor[K](emitOnInput),
      if (emitOnInput) TimeMode.None() else TimeMode.EventTime(),
      OutputMode.Append())

  /** Multimap GROUP-AND-DRAIN through [[MultimapUserState]]: per user
    * key, values bag up under their map key (attribute); a foreign
    * `drainMarker` row drains every bag, emitting (key, mapKey,
    * values-in-arrival-order) and clearing — the smallest op that
    * exercises put/get/keys/entries/remove across batches. */
  class MultimapGroupProcessor[K](drainMarker: String)
      extends StatefulProcessor[K, (K, String, Long), (K, String, Seq[Long])] {
    @transient private var mm: MultimapUserState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mm = new MultimapUserState[String, Long](
        getHandle.getMapState[String, Seq[Long]]("mm", Encoders.STRING,
          org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder[Seq[Long]](), TTLConfig.NONE))

    override def handleInputRows(key: K, rows: Iterator[(K, String, Long)],
        timers: TimerValues): Iterator[(K, String, Seq[Long])] = {
      var drain = false
      rows.foreach { case (_, mk, v) =>
        if (mk == drainMarker) drain = true else mm.put(mk, v)
      }
      if (!drain) Iterator.empty
      else {
        val out = mm.keys().toSeq.sorted.map(mk => (key, mk, mm.get(mk)))
        out.foreach { case (_, mk, _) => mm.remove(mk) }
        out.iterator
      }
    }
  }

  /** [[MultimapGroupProcessor]] as an operator. */
  def multimapGroup[K: Encoder](ds: Dataset[(K, String, Long)],
      drainMarker: String = "__drain__")(
      implicit outEnc: Encoder[(K, String, Seq[Long])]): Dataset[(K, String, Seq[Long])] =
    ds.groupByKey(_._1).transformWithState(
      new MultimapGroupProcessor[K](drainMarker),
      TimeMode.None(), OutputMode.Append())

  /** Beam GroupIntoBatches (transforms/GroupIntoBatches.java:108) with
    * real timers: BagState buffer + ValueState count + a processing-time
    * flush timer per key — the exact state/timer cell layout of the
    * Beam implementation. */
  class BatchingProcessor[K, V](maxSize: Int, flushTimeoutMs: Long)(
      implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, V), (K, Seq[V])] {

    @transient private var buf: ListState[V] = _
    @transient private var cnt: ValueState[Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[V]("buf", vEnc, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[(K, V)],
        timers: TimerValues): Iterator[(K, Seq[V])] = {
      val out = scala.collection.mutable.ArrayBuffer[(K, Seq[V])]()
      val n0 = if (cnt.exists()) cnt.get() else 0L
      var n = n0
      var sizeFlushed = false
      // buffer locally, persist the remainder in ONE appendList at the
      // end (per-row appendValue is O(appends-this-batch) per call —
      // see SessionLog.flush); the store is only read when the batch
      // spanning it actually flushes
      val local = scala.collection.mutable.ArrayBuffer[V]()
      rows.foreach { case (_, v) =>
        local += v
        n += 1
        if (n >= maxSize) {
          val head = if (!sizeFlushed && n0 > 0) buf.get().toSeq else Seq.empty
          out += ((key, head ++ local))
          local.clear(); n = 0
          sizeFlushed = true
        }
      }
      if (sizeFlushed) buf.clear()
      if (local.nonEmpty) buf.appendList(toArr(local))
      cnt.update(n)
      // Beam's bufferingTimer contract: the timer covers the CURRENT
      // remainder. Clear + re-arm whenever a flush emptied the buffer
      // (a stale timer would otherwise fire early for rows buffered
      // after a size flush); drop it when nothing is pending.
      if (flushTimeoutMs > 0) {
        val hadTimer = armed.exists()
        if (n == 0) {
          if (hadTimer) { getHandle.deleteTimer(armed.get()); armed.clear() }
        } else if (sizeFlushed || !hadTimer) {
          if (hadTimer) getHandle.deleteTimer(armed.get())
          val at = timers.getCurrentProcessingTimeInMs() + flushTimeoutMs
          getHandle.registerTimer(at)
          armed.update(at)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Seq[V])] = {
      val pending = buf.get().toSeq
      buf.clear(); cnt.clear(); armed.clear()
      if (pending.nonEmpty) Iterator((key, pending)) else Iterator.empty
    }
  }

  /** GroupIntoBatches via transformWithState: size-capped batches per
    * key; the remainder flushes when the per-key processing-time timer
    * fires. With no flush timeout the query runs in TimeMode.None —
    * ProcessingTime mode makes the engine schedule continuous no-data
    * micro-batches to advance the timer clock, which is wasted work
    * when no timers exist. */
  def groupIntoBatchesTws[K: Encoder, V: Encoder](
      ds: Dataset[(K, V)], maxSize: Int, flushTimeoutMs: Long)(
      implicit outEnc: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new BatchingProcessor[K, V](maxSize, flushTimeoutMs),
      if (flushTimeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
      OutputMode.Append())

  /** Beam GroupIntoBatches.ofByteSize
    * (transforms/GroupIntoBatches.java:149) — WEIGHT-capped batches:
    * a batch flushes BEFORE adding an element that would push the
    * accumulated weight past `maxWeight` (batches never exceed the
    * budget), and an element whose own weight reaches the budget
    * flushes alone immediately. The remainder flushes on the per-key
    * processing-time timer, exactly as the count-capped
    * [[BatchingProcessor]] does. This is the streaming form of the
    * token-budget sequence packing a training-data loader runs
    * (`pipeline_seq_packing` is the batch twin): weight = token
    * count, budget = context length. */
  class WeightBatchingProcessor[K, V](maxWeight: Long, flushTimeoutMs: Long,
      weigh: V => Long)(implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, V), (K, Seq[V])] {
    require(maxWeight > 0, s"maxWeight must be positive, got $maxWeight")

    @transient private var buf: ListState[V] = _
    @transient private var wc: ValueState[(Long, Long)] = _ // (weight, count)
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[V]("buf", vEnc, TTLConfig.NONE)
      wc = getHandle.getValueState[(Long, Long)]("wc",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[(K, V)],
        timers: TimerValues): Iterator[(K, Seq[V])] = {
      val out = scala.collection.mutable.ArrayBuffer[(K, Seq[V])]()
      var (w, cnt) = if (wc.exists()) wc.get() else (0L, 0L)
      // no-flush batches APPEND without reading or rewriting the
      // buffer (pendingNew); the persisted tail materializes only
      // when a flush actually needs its content — state traffic is
      // O(appends + flushes + 1) per key per batch, never O(buffer)
      val pendingNew = scala.collection.mutable.ArrayBuffer[V]()
      var tail: scala.collection.mutable.ArrayBuffer[V] = null
      def materialize(): Unit = if (tail == null) {
        tail = scala.collection.mutable.ArrayBuffer[V]()
        val it = buf.get()
        while (it.hasNext) tail += it.next()
        tail ++= pendingNew
      }
      def flushTail(): Unit = {
        materialize()
        out += ((key, tail.toSeq))
        tail.clear(); w = 0L; cnt = 0L
      }
      var flushed = false
      rows.foreach { case (_, v) =>
        val vw = math.max(0L, weigh(v))
        if (vw >= maxWeight) {
          // oversize alone: close the open batch first (arrival order
          // preserved), then emit the element as its own batch
          if (cnt > 0) flushTail()
          out += ((key, Seq(v)))
          flushed = true
        } else {
          if (cnt > 0 && w + vw > maxWeight) { flushTail(); flushed = true }
          if (tail != null) tail += v else pendingNew += v
          w += vw; cnt += 1
        }
      }
      // flushed && tail == null ⟺ every flush was an oversize landing
      // on an EMPTY buffer (cnt==0 skips flushTail, so the persisted
      // buf was never materialized and is known empty) — rows buffered
      // after it sit only in pendingNew and must still append, or they
      // are silently lost while wc counts them
      // persist in ONE put/appendList (per-row appendValue is
      // O(appends-this-batch) per call — see SessionLog.flush)
      if (flushed && tail != null) {
        if (tail.isEmpty) buf.clear() else buf.put(toArr(tail))
      } else if (pendingNew.nonEmpty) buf.appendList(toArr(pendingNew))
      wc.update((w, cnt))
      if (flushTimeoutMs > 0) {
        val hadTimer = armed.exists()
        if (cnt == 0L) {
          if (hadTimer) { getHandle.deleteTimer(armed.get()); armed.clear() }
        } else if (flushed || !hadTimer) {
          if (hadTimer) getHandle.deleteTimer(armed.get())
          val at = timers.getCurrentProcessingTimeInMs() + flushTimeoutMs
          getHandle.registerTimer(at)
          armed.update(at)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Seq[V])] = {
      val pending = buf.get().toSeq
      buf.clear(); wc.clear(); armed.clear()
      if (pending.nonEmpty) Iterator((key, pending)) else Iterator.empty
    }
  }

  /** GroupIntoBatches.ofByteSize via transformWithState: weight-capped
    * batches per key under `weigh`; the remainder flushes when the
    * per-key processing-time timer fires (flushTimeoutMs <= 0 → no
    * timer, TimeMode.None — see [[groupIntoBatchesTws]]). */
  def groupIntoBatchesByWeight[K: Encoder, V: Encoder](
      ds: Dataset[(K, V)], maxWeight: Long, flushTimeoutMs: Long)(
      weigh: V => Long)(
      implicit outEnc: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new WeightBatchingProcessor[K, V](maxWeight, flushTimeoutMs, weigh),
      if (flushTimeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
      OutputMode.Append())

  /** Beam's PROCESSING-TIME trigger primitive in the global window —
    * `Repeatedly.forever(AfterProcessingTime.pastFirstElementInPane()
    * .plusDelayOf(delay))` (AfterProcessingTime.java:39,
    * Repeatedly.java:38): each key fires a pane `delayMs` of wall time
    * after the first element that arrived since the previous firing,
    * forever. Pane metadata (index) and both accumulation modes match
    * [[TriggeredWindowProcessor]]; a pane always holds ≥1 new element
    * (pastFirstElementInPane — an empty interval never fires). */
  class ProcessingTimePaneProcessor[K, V](delayMs: Long, accumulating: Boolean)(
      implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, V), (K, Long, Seq[V])] {
    require(delayMs > 0, "delayMs must be positive")

    @transient private var buf: ListState[V] = _      // pane contents
    @transient private var since: ValueState[Long] = _ // new since last fire
    @transient private var pane: ValueState[Long] = _  // next pane index

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[V]("buf", vEnc, TTLConfig.NONE)
      since = getHandle.getValueState[Long]("since", Encoders.scalaLong,
        TTLConfig.NONE)
      pane = getHandle.getValueState[Long]("pane", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[(K, V)],
        timers: TimerValues): Iterator[(K, Long, Seq[V])] = {
      var n = if (since.exists()) since.get() else 0L
      val firstOfPane = n == 0
      // ONE appendList per batch — see SessionLog.flush
      val local = scala.collection.mutable.ArrayBuffer[V]()
      rows.foreach { case (_, v) => local += v; n += 1 }
      if (local.nonEmpty) buf.appendList(toArr(local))
      since.update(n)
      // pastFirstElementInPane: the delay is anchored at the FIRST
      // element of the pane; later arrivals never push it out
      if (firstOfPane && n > 0)
        getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + delayMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Long, Seq[V])] = {
      val n = if (since.exists()) since.get() else 0L
      if (n == 0) return Iterator.empty // raced with a concurrent clear
      val p = if (pane.exists()) pane.get() else 0L
      val contents = buf.get().toSeq
      if (!accumulating) buf.clear()
      since.update(0L)
      pane.update(p + 1)
      Iterator((key, p, contents))
    }
  }

  /** [[ProcessingTimePaneProcessor]] over a keyed stream: periodic
    * per-key panes on a wall-clock cadence, independent of event time
    * — Beam's canonical "emit what you have every N seconds" global-
    * window trigger. Output: (key, paneIndex, values). */
  def processingTimePanes[K: Encoder, V: Encoder](
      ds: Dataset[(K, V)], delayMs: Long, accumulating: Boolean = false)(
      implicit outEnc: Encoder[(K, Long, Seq[V])]): Dataset[(K, Long, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new ProcessingTimePaneProcessor[K, V](delayMs, accumulating),
      TimeMode.ProcessingTime(), OutputMode.Append())

  /** Beam's COMPOSITE trigger language (windowing/AfterFirst.java:41,
    * AfterAll.java:40, AfterPane.java:33, AfterProcessingTime.java:39)
    * as a serializable spec tree, implicitly wrapped in
    * `Repeatedly.forever` (Repeatedly.java:38): every firing resets
    * the WHOLE tree, exactly like Beam's repeated composite.
    *
    *  - `AfterCount(n)`  — AfterPane.elementCountAtLeast(n)
    *  - `AfterDelay(d)`  — AfterProcessingTime.pastFirstElementInPane()
    *                       .plusDelayOf(d): anchored at the first
    *                       element since the previous firing
    *  - `AfterFirst(…)`  — ready when ANY child is ready
    *  - `AfterAll(…)`    — ready when EVERY child is ready
    */
  sealed trait TriggerSpec extends Serializable
  object TriggerSpec {
    final case class AfterCount(n: Int) extends TriggerSpec {
      require(n > 0, "AfterCount needs n > 0")
    }
    final case class AfterDelay(delayMs: Long) extends TriggerSpec {
      require(delayMs > 0, "AfterDelay needs delayMs > 0")
    }
    final case class AfterFirst(subs: TriggerSpec*) extends TriggerSpec {
      require(subs.nonEmpty, "AfterFirst needs children")
    }
    final case class AfterAll(subs: TriggerSpec*) extends TriggerSpec {
      require(subs.nonEmpty, "AfterAll needs children")
    }

    /** Earliest wall-clock instant at which `t` is (or becomes) ready,
      * holding the element count fixed: `Some(ts)` with ts ≤ now means
      * ready NOW; `None` means no amount of waiting alone satisfies it
      * (an unsatisfied count condition). All children share the pane's
      * single anchor — equivalent to Beam's per-subtrigger anchors
      * because the whole tree resets together on every firing. */
    def readyAt(t: TriggerSpec, cnt: Long, anchorMs: Long): Option[Long] =
      t match {
        case AfterCount(n) => if (cnt >= n) Some(0L) else None
        case AfterDelay(d) => if (cnt > 0) Some(anchorMs + d) else None
        case AfterFirst(subs @ _*) =>
          subs.flatMap(s => readyAt(s, cnt, anchorMs)) match {
            case ts if ts.nonEmpty => Some(ts.min)
            case _ => None
          }
        case AfterAll(subs @ _*) =>
          val ts = subs.map(s => readyAt(s, cnt, anchorMs))
          if (ts.forall(_.isDefined)) Some(ts.map(_.get).max) else None
      }
  }

  /** Composite-trigger panes in the global window: per key, buffer
    * elements and fire a pane whenever the [[TriggerSpec]] tree is
    * ready — on the element path (count conditions trip immediately)
    * or on a wall-clock timer armed at the tree's earliest future
    * ready-instant (re-armed as the tree's shape demands: AfterAll
    * waits for its slowest child, AfterFirst for its fastest). This is
    * the `ReduceFnRunner`+`TriggerStateMachine` pair of the reference
    * (runners/core-java/.../TriggerStateMachineRunner.java) reduced to
    * the repeatable processing-time/count sub-language; watermark
    * (event-time) conditions live in [[TriggeredWindowProcessor]] /
    * [[MixedTriggerProcessor]]. Output: (key, paneIndex, values). */
  class CompositeTriggerProcessor[K, V](spec: TriggerSpec,
      accumulating: Boolean)(implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, V), (K, Long, Seq[V])] {

    @transient private var buf: ListState[V] = _       // pane contents
    @transient private var since: ValueState[Long] = _ // count since fire
    @transient private var anchor: ValueState[Long] = _ // first-elem ts
    @transient private var pane: ValueState[Long] = _  // next pane index
    @transient private var armed: ValueState[Long] = _ // timer instant

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[V]("buf", vEnc, TTLConfig.NONE)
      since = getHandle.getValueState[Long]("since", Encoders.scalaLong,
        TTLConfig.NONE)
      anchor = getHandle.getValueState[Long]("anchor", Encoders.scalaLong,
        TTLConfig.NONE)
      pane = getHandle.getValueState[Long]("pane", Encoders.scalaLong,
        TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    private def fire(key: K): (K, Long, Seq[V]) = {
      val p = if (pane.exists()) pane.get() else 0L
      val contents = buf.get().toSeq
      if (!accumulating) buf.clear()
      since.update(0L)
      anchor.clear()
      pane.update(p + 1)
      (key, p, contents)
    }

    /** Sync the armed timer to the tree's earliest future ready-instant
      * (or drop it when the tree can only advance via elements). */
    private def rearm(now: Long): Unit = {
      val cnt = if (since.exists()) since.get() else 0L
      val anc = if (anchor.exists()) anchor.get() else now
      val want = TriggerSpec.readyAt(spec, cnt, anc).filter(_ > now)
      val have = if (armed.exists()) Some(armed.get()) else None
      if (want != have) {
        have.foreach(ts => getHandle.deleteTimer(ts))
        want.foreach(ts => getHandle.registerTimer(ts))
        want match {
          case Some(ts) => armed.update(ts)
          case None => armed.clear()
        }
      }
    }

    override def handleInputRows(key: K, rows: Iterator[(K, V)],
        timers: TimerValues): Iterator[(K, Long, Seq[V])] = {
      val now = timers.getCurrentProcessingTimeInMs()
      var cnt = if (since.exists()) since.get() else 0L
      var anc = if (anchor.exists()) anchor.get() else now
      var pn = if (pane.exists()) pane.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Seq[V])]()
      // buffer locally; persist buf/since/anchor/pane ONCE at the end
      // (per-row appendValue/update is O(writes-this-batch) per call —
      // see SessionLog.flush)
      val local = scala.collection.mutable.ArrayBuffer[V]()
      var storeValid = true // persisted rows still part of the open pane
      var storeRows: Seq[V] = null
      def readStore(): Seq[V] = {
        if (storeRows == null) storeRows = buf.get().toSeq
        storeRows
      }
      rows.foreach { case (_, v) =>
        if (cnt == 0) anc = now // first element of this pane
        local += v
        cnt += 1
        // Count conditions trip on the element path, mid-batch — a
        // second AfterCount pane can fire within one input batch.
        if (TriggerSpec.readyAt(spec, cnt, anc).exists(_ <= now)) {
          val contents =
            (if (storeValid) readStore() else Seq.empty[V]) ++ local
          out += ((key, pn, contents))
          pn += 1
          if (!accumulating) { local.clear(); storeValid = false }
          cnt = 0
        }
      }
      if (!storeValid) {
        if (local.isEmpty) buf.clear() else buf.put(toArr(local))
      } else if (local.nonEmpty) buf.appendList(toArr(local))
      since.update(cnt)
      pane.update(pn)
      if (cnt > 0) anchor.update(anc) else anchor.clear()
      rearm(now)
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Long, Seq[V])] = {
      val now = timers.getCurrentProcessingTimeInMs()
      armed.clear()
      val cnt = if (since.exists()) since.get() else 0L
      val anc = if (anchor.exists()) anchor.get() else now
      val ready = cnt > 0 &&
        TriggerSpec.readyAt(spec, cnt, anc).exists(_ <= now)
      val out = if (ready) Iterator(fire(key)) else Iterator.empty
      rearm(now)
      out
    }
  }

  /** [[CompositeTriggerProcessor]] over a keyed stream. Example —
    * Beam's "every 100 elements or at most every 10 s, whichever comes
    * first":
    * {{{
    * compositeTriggerPanes(ds,
    *   TriggerSpec.AfterFirst(TriggerSpec.AfterCount(100),
    *                          TriggerSpec.AfterDelay(10000L)))
    * }}} */
  def compositeTriggerPanes[K: Encoder, V: Encoder](
      ds: Dataset[(K, V)], spec: TriggerSpec,
      accumulating: Boolean = false)(
      implicit outEnc: Encoder[(K, Long, Seq[V])]): Dataset[(K, Long, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new CompositeTriggerProcessor[K, V](spec, accumulating),
      TimeMode.ProcessingTime(), OutputMode.Append())

  /** Beam Deduplicate (transforms/Deduplicate.java:70) as explicit
    * MapState + TTL: ids expire after `ttl`, so re-arrivals beyond the
    * horizon pass through again — bounded state, Beam's exact TTL-timer
    * design (vs dropDuplicatesWithinWatermark's watermark coupling). */
  class TtlDedupProcessor[K, V](ttl: java.time.Duration)(
      implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, Long, V), (K, Long, V)] {

    @transient private var seen: MapState[Long, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[Long, Boolean]("seen",
        Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(key: K, rows: Iterator[(K, Long, V)],
        timers: TimerValues): Iterator[(K, Long, V)] =
      rows.flatMap { case (k, id, v) =>
        if (seen.containsKey(id)) None
        else { seen.updateValue(id, true); Some((k, id, v)) }
      }
  }

  /** Exactly-once-by-id within a TTL horizon, per key. */
  def dedupWithTtl[K: Encoder, V: Encoder](
      ds: Dataset[(K, Long, V)], ttl: java.time.Duration)(
      implicit outEnc: Encoder[(K, Long, V)]): Dataset[(K, Long, V)] =
    ds.groupByKey(_._1).transformWithState(
      new TtlDedupProcessor[K, V](ttl),
      TimeMode.ProcessingTime(), OutputMode.Append())

  /** Streaming SCD2 (type-2 dimension maintenance — the continuous
    * form of `operators/Scd.history`): ONE ValueState per key holding
    * the current (state, valid_from, tie) triple. An arriving change
    * row whose state DIFFERS closes the previous span — emitting
    * (key, prevState, prevValidFrom, validTo = new row's ts) — and
    * becomes current; consecutive identical states are absorbed
    * without touching the store. The open row per key lives only in
    * state; the serving history is (emitted closed rows ∪ open
    * state), batch-equivalent to `Scd.history` over the full change
    * log (spec-asserted).
    *
    * Contract and scale shape: input respects the CDC-log
    * commit-order contract per key ((ts, tie) monotone across
    * batches — the log's commit order); within a micro-batch rows are
    * sorted by (ts, tie) before application. State is O(keys) and
    * write traffic is ONE ValueState put per key per batch that saw a
    * change — the minimal CDC write amplification (contrast the
    * windowed batch build's full-shuffle). */
  class Scd2Processor[K, S](implicit sEnc: Encoder[S])
      extends StatefulProcessor[K, (K, S, Long, Long), (K, S, Long, Long)] {

    @transient private var cur: ValueState[(S, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[(S, Long, Long)]("cur",
        Encoders.tuple(sEnc, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, S, Long, Long)],
        timers: TimerValues): Iterator[(K, S, Long, Long)] = {
      val sorted = rows.toVector.sortBy(r => (r._3, r._4))
      val out = Vector.newBuilder[(K, S, Long, Long)]
      var c = if (cur.exists()) Some(cur.get()) else None
      var dirty = false
      sorted.foreach { case (_, st, ts, tie) =>
        c match {
          case Some((ps, pvf, _)) if ps != st =>
            out += ((key, ps, pvf, ts))
            c = Some((st, ts, tie)); dirty = true
          case Some(_) => () // same state: absorbed, no state write
          case None => c = Some((st, ts, tie)); dirty = true
        }
      }
      if (dirty) c.foreach(cur.update)
      out.result().iterator
    }
  }

  /** [[Scd2Processor]] over a keyed change stream (key, state, ts,
    * tie): emits each CLOSED span (key, state, valid_from, valid_to)
    * as soon as its successor arrives; open spans stay in state. */
  def scd2Changes[K: Encoder, S: Encoder](
      ds: Dataset[(K, S, Long, Long)])(
      implicit outEnc: Encoder[(K, S, Long, Long)]): Dataset[(K, S, Long, Long)] =
    ds.groupByKey(_._1).transformWithState(
      new Scd2Processor[K, S](),
      // no timers, no TTL → TimeMode.None: the engine schedules no
      // clock-driven no-data batches (and processAllAvailable drains
      // deterministically in tests)
      TimeMode.None(), OutputMode.Append())

  /** Streaming step-funnel — the continuous form of the batch
    * `agg_funnel_steps` chained window-mins: per key, three slots
    * (t1, t2, t3) = earliest step-1 time, earliest step-2 time within
    * `horizonMs` of t1, earliest step-3 time within `horizonMs` of t2.
    * Beam's state-API funnel pattern (one `@StateId` cell per step,
    * `sdks/java/core/.../transforms/DoFn.java:516` vocabulary) on ONE
    * packed ValueState. Emits a (rev, t1, t2, t3) snapshot (-1 =
    * unset, rev strictly increasing per key) for each key in each
    * batch where its slots CHANGED — a changelog whose max-rev row per
    * key is the live funnel state, so downstream conversion counts are
    * a latest-per-key aggregate away.
    *
    * Ordering contract (same as Beam's arrival-order state pattern):
    * rows sort by ts within each micro-batch; under event-time-ordered
    * replay the final state equals the batch query's chained
    * window-mins EXACTLY (spec-asserted against the same sf table). A
    * cross-batch late row that lowers a slot cascades: a lower t1 can
    * push t2 past t1 + horizon, unsetting t2/t3 until later qualifying
    * events re-fill them — the bounded-state tradeoff (exact
    * out-of-order mins would buffer every step-2/3 candidate until the
    * watermark passes t1 + horizon). State is O(keys); write traffic
    * is one 3-slot put per key per batch that changed — the same
    * minimal shape as [[Scd2Processor]]. */
  class FunnelProcessor[K](horizonMs: Long)
      extends StatefulProcessor[K, (K, Long, Int), (K, Long, Long, Long, Long)] {

    @transient private var slots: ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      slots = getHandle.getValueState[(Long, Long, Long, Long)]("slots",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, Long, Int)],
        timers: TimerValues): Iterator[(K, Long, Long, Long, Long)] = {
      val (rev, t1, t2, t3) =
        if (slots.exists()) slots.get() else (0L, -1L, -1L, -1L)
      val before = (t1, t2, t3)
      // sort (ts, step): an equal-ts later step must see the earlier
      // step's slot first (batch window-mins allow ts >= t1 / >= t2,
      // so a click at the view's exact timestamp qualifies)
      val after = rows.toVector.sortBy(r => (r._2, r._3)).foldLeft(before) {
        case (st, (_, ts, step)) => funnelStep(st, ts, step, horizonMs)
      }
      if (after != before) {
        slots.update((rev + 1L, after._1, after._2, after._3))
        Iterator.single((key, rev + 1L, after._1, after._2, after._3))
      } else Iterator.empty
    }
  }

  /** Insert one timestamp into sorted disjoint gap-cluster intervals
    * (pure; property-tested against naive re-clustering in
    * RandomizedSpec): extends a neighbor within `gapMs`, merges the
    * two it bridges, or opens a new singleton — the same gap-connected
    * components a full re-sort produces, maintained incrementally in
    * O(log clusters) (+ O(clusters) on the rare structural patch). */
  private[graft] def insertCluster(cs: Vector[(Long, Long)], ts: Long,
      gapMs: Long): Vector[(Long, Long)] = {
    // idx = first cluster with min > ts
    var lo = 0; var hi = cs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cs(mid)._1 <= ts) lo = mid + 1 else hi = mid
    }
    val pred = lo - 1 // cluster with min <= ts, if any
    if (pred >= 0 && ts <= cs(pred)._2) return cs // inside an interval
    val joinsPred = pred >= 0 && ts <= cs(pred)._2 + gapMs
    val joinsSucc = lo < cs.length && cs(lo)._1 - ts <= gapMs
    if (joinsPred && joinsSucc)
      cs.patch(pred, Seq((cs(pred)._1, cs(lo)._2)), 2)
    else if (joinsPred)
      cs.updated(pred, (cs(pred)._1, math.max(cs(pred)._2, ts)))
    else if (joinsSucc)
      cs.updated(lo, (ts, cs(lo)._2))
    else
      cs.patch(lo, Seq((ts, ts)), 0)
  }

  /** One funnel slot transition (pure; property-tested against the
    * batch chained-window-min reference in RandomizedSpec): apply a
    * step event at `ts` to the (t1, t2, t3) slots, -1 = unset. */
  private[graft] def funnelStep(st: (Long, Long, Long), ts: Long,
      step: Int, horizonMs: Long): (Long, Long, Long) = {
    var (t1, t2, t3) = st
    step match {
      case 1 if t1 == -1L || ts < t1 =>
        t1 = ts
        // a lower t1 can push t2 past t1 + horizon — cascade (the
        // t2 >= t1 bound can't break: t1 only moved down)
        if (t2 != -1L && t2 > t1 + horizonMs) { t2 = -1L; t3 = -1L }
      case 2 if t1 != -1L && ts >= t1 && ts <= t1 + horizonMs &&
          (t2 == -1L || ts < t2) =>
        t2 = ts
        if (t3 != -1L && t3 > t2 + horizonMs) t3 = -1L
      case 3 if t2 != -1L && ts >= t2 && ts <= t2 + horizonMs &&
          (t3 == -1L || ts < t3) =>
        t3 = ts
      case _ => () // non-qualifying or unknown step: absorbed
    }
    (t1, t2, t3)
  }

  /** [[FunnelProcessor]] over a keyed step stream (key, ts, step ∈
    * 1..3; ts in any fixed unit consistent with `horizonMs`): per-key
    * funnel-slot changelog, latest row per key = max rev. */
  def funnelSteps[K: Encoder](ds: Dataset[(K, Long, Int)], horizonMs: Long)(
      implicit outEnc: Encoder[(K, Long, Long, Long, Long)]): Dataset[(K, Long, Long, Long, Long)] =
    ds.groupByKey(_._1).transformWithState(
      new FunnelProcessor[K](horizonMs),
      // no timers, no TTL → TimeMode.None (see scd2Changes)
      TimeMode.None(), OutputMode.Append())

  /** Streaming heavy hitters per key — a [[graft.functions.MisraGries]]
    * k-counter summary held in per-key state: counters in MapState
    * (≤ k entries, only CHANGED entries write back per batch — the
    * batch first folds into an exact in-memory count map, so a
    * million-row batch still writes ≤ k+1 state rows per key),
    * (rev, err, n) bookkeeping in one packed ValueState. Each batch
    * that touches a key emits a rev-stamped snapshot
    * (key, rev, n, err, top counters): est ≤ true ≤ est + err with
    * err ≤ n/(k+1), and every item with true count > err is present —
    * the deterministic streaming hot-items guarantee (Beam analog:
    * SketchFrequencies / Top.perKey over triggered panes; the
    * MERGEABLE shrink also lets per-shard summaries combine
    * downstream, Agarwal et al. PODS 2012). State is O(k) per key
    * FOREVER — the bounded-state contrast to exact streaming top-k,
    * whose state grows with distinct items. */
  class HeavyHittersProcessor[K, I](k: Int)(implicit iEnc: Encoder[I])
      extends StatefulProcessor[K, (K, I, Long), (K, Long, Long, Long, Seq[(I, Long)])] {
    require(k >= 1, s"k must be >= 1, got $k")

    @transient private var counters: MapState[I, Long] = _
    @transient private var mgMeta: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[I, Long]("mg", iEnc,
        Encoders.scalaLong, TTLConfig.NONE)
      mgMeta = getHandle.getValueState[(Long, Long, Long)]("mgMeta",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[(K, I, Long)],
        timers: TimerValues): Iterator[(K, Long, Long, Long, Seq[(I, Long)])] = {
      val (rev, err, n) =
        if (mgMeta.exists()) mgMeta.get() else (0L, 0L, 0L)
      val cur = scala.collection.mutable.Map[I, Long]()
      val it = counters.iterator()
      while (it.hasNext) { val e = it.next(); cur += (e._1 -> e._2) }
      // exact fold of this batch, then ONE summary merge. Weights are
      // validated RAW, before netting: a negative netted away by a
      // positive in the same batch would silently void the
      // est ≤ true ≤ est + err contract that MisraGries.addAll's own
      // require (which only sees the net sums) exists to protect.
      // Loud-failure policy as elsewhere (ANSI): non-positive weights
      // are upstream bugs to filter before this operator.
      val batch = scala.collection.mutable.Map[I, Long]()
      var any = false
      rows.foreach { case (_, i, w) =>
        require(w > 0,
          s"heavyHitters weights must be > 0, got $w for item $i")
        batch += (i -> (batch.getOrElse(i, 0L) + w)); any = true
      }
      if (!any) return Iterator.empty
      val before = graft.functions.MisraGries.Summary(cur.toMap, err, n)
      val after = graft.functions.MisraGries.addAll(before, batch, k)
      // write back only the delta: changed counters + shrunk-away keys
      after.counters.foreach { case (i, c) =>
        if (cur.getOrElse(i, -1L) != c) counters.updateValue(i, c)
      }
      cur.keysIterator.foreach { i =>
        if (!after.counters.contains(i)) counters.removeKey(i)
      }
      mgMeta.update((rev + 1L, after.err, after.n))
      Iterator.single((key, rev + 1L, after.n, after.err, after.topK(k)))
    }
  }

  /** Streaming per-key t-digest quantiles — the third mergeable
    * sketch in the streaming family (with [[HeavyHittersProcessor]]'s
    * Misra-Gries and native HLL): Beam's TDigestQuantiles
    * (sdks/java/extensions/sketching/src/main/java/org/apache/beam/
    * sdk/extensions/sketching/TDigestQuantiles.java:86) as a
    * `transformWithState` fold over the SAME [[graft.functions.TDigest]]
    * core the batch aggregates use — one estimator, two execution
    * modes, so batch and stream agree on the rank-error contract.
    * State per key is the compressed centroid list (O(compression)
    * doubles FOREVER, interleaved [mean, weight, …]), one ValueState
    * put per touched key per batch; each touched key emits a
    * rev-stamped (rev, n, quantile values at `qs`) snapshot — latest
    * row per key = max rev, as [[heavyHitters]]. */
  /** Shared per-key t-digest fold step: rebuild the digest from its
    * packed [mean, weight, …] state, fold the batch values in,
    * compact, and persist ONE ValueState put. Returns None when the
    * batch was empty, else (rev+1, n, packed centroids). The fold is
    * the load-bearing half of both the quantile-emitting per-key
    * processor and the sketch-emitting global stage 1 — a single copy
    * so they can never diverge. */
  private def tdigestFoldStep(st: ValueState[(Long, Long, Seq[Double])],
      compression: Double,
      values: Iterator[Double]): Option[(Long, Long, Seq[Double])] = {
    val (rev, n0, packed) =
      if (st.exists()) st.get() else (0L, 0L, Seq.empty[Double])
    val buf = new graft.functions.TDigest.Buf(compression)
    var i = 0
    while (i < packed.length) { buf.add(packed(i), packed(i + 1)); i += 2 }
    var n = n0
    values.foreach { v => buf.add(v, 1.0); n += 1 }
    if (n == n0) return None
    buf.compact()
    val out = new Array[Double](2 * buf.n)
    var j = 0
    while (j < buf.n) {
      out(2 * j) = buf.means(j); out(2 * j + 1) = buf.weights(j); j += 1
    }
    st.update((rev + 1L, n, out.toSeq))
    Some((rev + 1L, n, out.toSeq))
  }

  /** Quantiles at `qs` off a packed [mean, weight, …] centroid list. */
  private def packedQuantiles(packed: Seq[Double],
      qs: Seq[Double]): Seq[Double] = {
    val m = packed.length / 2
    val means = new Array[Double](m)
    val weights = new Array[Double](m)
    var i = 0
    while (i < m) {
      means(i) = packed(2 * i); weights(i) = packed(2 * i + 1); i += 1
    }
    qs.map(q => graft.functions.TDigest.quantile(means, weights, q))
  }

  private def requireQs(qs: Seq[Double]): Unit =
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), s"bad qs: $qs")

  class TDigestProcessor[K](compression: Double, qs: Seq[Double])
      extends StatefulProcessor[K, (K, Double), (K, Long, Long, Seq[Double])] {
    require(compression >= 20, s"compression too small: $compression")
    requireQs(qs)

    @transient private var st: ValueState[(Long, Long, Seq[Double])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Seq[Double])]("digest",
        Encoders.product[(Long, Long, Seq[Double])], TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, Double)],
        timers: TimerValues): Iterator[(K, Long, Long, Seq[Double])] =
      tdigestFoldStep(st, compression, rows.map(_._2)) match {
        case None => Iterator.empty
        case Some((rev, n, packed)) =>
          Iterator.single((key, rev, n, packedQuantiles(packed, qs)))
      }
  }

  /** [[TDigestProcessor]] over a keyed value stream: per-key
    * rev-stamped quantile snapshots at `qs`. */
  def tdigestQuantiles[K: Encoder](ds: Dataset[(K, Double)],
      compression: Double = 100.0, qs: Seq[Double] = Seq(0.5, 0.95, 0.99))(
      implicit outEnc: Encoder[(K, Long, Long, Seq[Double])]): Dataset[(K, Long, Long, Seq[Double])] =
    ds.groupByKey(_._1).transformWithState(
      new TDigestProcessor[K](compression, qs),
      // no timers, no TTL → TimeMode.None (see scd2Changes)
      TimeMode.None(), OutputMode.Append())

  /** Stage 1 of [[tdigestQuantilesGlobal]]: [[TDigestProcessor]]'s
    * fold, but the snapshot carries the packed CENTROIDS (the
    * mergeable summary) instead of evaluated quantiles — the merge
    * stage needs the digest, not its read-out. */
  class TDigestSketchProcessor[K](compression: Double)
      extends StatefulProcessor[K, (K, Double), (K, Long, Long, Seq[Double])] {
    require(compression >= 20, s"compression too small: $compression")

    @transient private var st: ValueState[(Long, Long, Seq[Double])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Seq[Double])]("digest",
        Encoders.product[(Long, Long, Seq[Double])], TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, Double)],
        timers: TimerValues): Iterator[(K, Long, Long, Seq[Double])] =
      tdigestFoldStep(st, compression, rows.map(_._2)) match {
        case None => Iterator.empty
        case Some((rev, n, packed)) => Iterator.single((key, rev, n, packed))
      }
  }

  /** Second stage of [[tdigestQuantilesGlobal]]: latest packed digest
    * per shard (MapState, ≤ shards × O(compression) doubles FOREVER),
    * one centroid-level merge + compact per batch — t-digests are
    * mergeable, so the union digest keeps the rank-error contract of
    * the per-shard folds. Emits rev-stamped (rev, n, quantiles). */
  class GlobalTDigestMergeProcessor(compression: Double, qs: Seq[Double])
      extends StatefulProcessor[Int, (Long, Long, Long, Seq[Double]), (Long, Long, Seq[Double])] {
    require(compression >= 20, s"compression too small: $compression")
    requireQs(qs) // same construction-time contract as the per-key form

    @transient private var perShard: MapState[Long, (Long, Seq[Double])] = _
    @transient private var rev: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perShard = getHandle.getMapState[Long, (Long, Seq[Double])](
        "shardDigest", Encoders.scalaLong,
        Encoders.product[(Long, Seq[Double])], TTLConfig.NONE)
      rev = getHandle.getValueState[Long]("rev", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Int,
        rows: Iterator[(Long, Long, Long, Seq[Double])],
        timers: TimerValues): Iterator[(Long, Long, Seq[Double])] = {
      val fresh = latestPerShard(rows.map { case (shard, srev, n, packed) =>
        (shard, srev, (n, packed))
      })
      if (fresh.isEmpty) return Iterator.empty
      fresh.foreach { case (shard, st) => perShard.updateValue(shard, st) }
      var nSum = 0L
      val buf = new graft.functions.TDigest.Buf(compression)
      val it = perShard.iterator()
      while (it.hasNext) {
        val (_, (n, packed)) = it.next()
        nSum += n
        var i = 0
        while (i < packed.length) { buf.add(packed(i), packed(i + 1)); i += 2 }
      }
      buf.compact()
      val means = java.util.Arrays.copyOf(buf.means, buf.n)
      val weights = java.util.Arrays.copyOf(buf.weights, buf.n)
      val r = (if (rev.exists()) rev.get() else 0L) + 1L
      rev.update(r)
      Iterator.single((r, nSum,
        qs.map(q => graft.functions.TDigest.quantile(means, weights, q))))
    }
  }

  /** GLOBAL (cross-key) streaming t-digest quantiles — Beam's
    * TDigestQuantiles.globally (sdks/java/extensions/sketching/src/
    * main/java/org/apache/beam/sdk/extensions/sketching/
    * TDigestQuantiles.java:86) in the same two-stage form as
    * [[heavyHittersGlobal]]: value-hash shards fold per-shard digests
    * in parallel (mergeable, so the partition is free to be anything
    * deterministic), a one-key stage merges the O(shards) digest
    * stream. Emits rev-stamped (rev, n, quantile values at `qs`). */
  def tdigestQuantilesGlobal(ds: Dataset[Double],
      compression: Double = 100.0, qs: Seq[Double] = Seq(0.5, 0.95, 0.99),
      shards: Int = 32)(
      implicit outEnc: Encoder[(Long, Long, Seq[Double])]): Dataset[(Long, Long, Seq[Double])] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val keyedEnc: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val midEnc: Encoder[(Long, Long, Long, Seq[Double])] =
      Encoders.product[(Long, Long, Long, Seq[Double])]
    ds.map(v => (shardOf(v, shards), v))
      .groupByKey(_._1)
      .transformWithState(new TDigestSketchProcessor[Long](compression),
        TimeMode.None(), OutputMode.Append())
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .transformWithState(new GlobalTDigestMergeProcessor(compression, qs),
        TimeMode.None(), OutputMode.Append())
  }

  /** Exact k-sample of the UNION of per-shard uniform reservoirs —
    * the merge half of [[sampleFixedGlobal]], pure and deterministic
    * in (seed, rev). Sequential sampling without replacement over the
    * shard POPULATION counts (multivariate-hypergeometric allocation:
    * draw d picks shard i with probability remaining_i / remainingΣ,
    * then a uniformly-drawn UNUSED element of i's reservoir —
    * Fisher-Yates partial shuffle; reservoir slots are NOT
    * exchangeable under Algorithm R, so popping sequentially would
    * bias toward early arrivals). Each shard's takes never exceed its
    * reservoir (takes_i ≤ min(k, n_i) = |reservoir_i|), and a uniform
    * sub-subset of a uniform subset is uniform over the shard — so
    * the result is an exact uniform k-subset of all n elements.
    * Property-tested for per-element selection uniformity in
    * RandomizedSpec. */
  private[graft] def mergeReservoirs[V](
      shards: Seq[(Long, Seq[V])], k: Int, seed: Long, rev: Long): Seq[V] = {
    // contract: each reservoir holds min(k, n_i) elements (the stage-1
    // Algorithm R invariant when both stages share k) — it guarantees
    // takes_i ≤ |reservoir_i| (shard i is drawn at most min(k, n_i)
    // times), so the merge never runs a reservoir dry
    shards.foreach { case (n, sample) =>
      require(sample.size >= math.min(k.toLong, n),
        s"reservoir underfull: ${sample.size} < min($k, $n)")
    }
    val pops = shards.map(_._1).toArray // remaining population per shard
    val bufs = shards.map(s => scala.collection.mutable.ArrayBuffer(s._2: _*))
    val avail = bufs.map(_.length).toArray
    var totalRemaining = pops.sum
    val take = math.min(k.toLong, totalRemaining).toInt
    val out = scala.collection.mutable.ArrayBuffer[V]()
    var d = 0
    while (d < take) {
      // shard choice ∝ remaining population
      var r = Math.floorMod(
        mix64(seed ^ (rev * 0x9e3779b97f4a7c15L) ^ (d.toLong << 1)),
        totalRemaining)
      var i = 0
      while (r >= pops(i)) { r -= pops(i); i += 1 }
      // uniform unused element of shard i's reservoir
      val j = Math.floorMod(
        mix64(seed ^ (rev * 0xbf58476d1ce4e5b9L) ^ ((d.toLong << 1) | 1L)),
        avail(i)).toInt
      out += bufs(i)(j)
      bufs(i)(j) = bufs(i)(avail(i) - 1)
      avail(i) -= 1
      pops(i) -= 1
      totalRemaining -= 1
      d += 1
    }
    out.toSeq
  }

  /** Second stage of [[sampleFixedGlobal]]: latest (n, reservoir) per
    * shard (MapState, ≤ shards × k values FOREVER), re-merged via
    * [[mergeReservoirs]] on each emit — the merge is STATELESS given
    * the shard reservoirs, so every snapshot is an exact uniform
    * k-sample of everything seen. */
  class GlobalReservoirMergeProcessor[V](k: Int, seed: Long)(
      implicit shardEnc: Encoder[(Long, Seq[V])])
      extends StatefulProcessor[Int, (Long, Long, Long, Seq[V]), (Long, Long, Seq[V])] {
    require(k >= 1, s"k must be >= 1, got $k")

    @transient private var perShard: MapState[Long, (Long, Seq[V])] = _
    @transient private var rev: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perShard = getHandle.getMapState[Long, (Long, Seq[V])](
        "shardRes", Encoders.scalaLong, shardEnc, TTLConfig.NONE)
      rev = getHandle.getValueState[Long]("rev", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Int,
        rows: Iterator[(Long, Long, Long, Seq[V])],
        timers: TimerValues): Iterator[(Long, Long, Seq[V])] = {
      val fresh = latestPerShard(rows.map { case (shard, srev, n, sample) =>
        (shard, srev, (n, sample))
      })
      if (fresh.isEmpty) return Iterator.empty
      fresh.foreach { case (shard, st) => perShard.updateValue(shard, st) }
      val states = scala.collection.mutable.ArrayBuffer[(Long, Seq[V])]()
      val it = perShard.iterator()
      while (it.hasNext) {
        val (_, st) = it.next()
        states += st
      }
      val r = (if (rev.exists()) rev.get() else 0L) + 1L
      rev.update(r)
      val nSum = states.iterator.map(_._1).sum
      Iterator.single((r, nSum, mergeReservoirs(states.toSeq, k, seed, r)))
    }
  }

  /** GLOBAL (cross-key) streaming fixed-size uniform sample — Beam's
    * Sample.fixedSizeGlobally (sdks/java/core/src/main/java/org/
    * apache/beam/sdk/transforms/Sample.java:47) in the two-stage
    * form: value-hash shards each hold a deterministic Algorithm R
    * reservoir ([[ReservoirProcessor]] — ANY deterministic partition
    * is valid, since hypergeometric merge allocation is exact over
    * disjoint shard populations), a one-key stage re-merges the
    * O(shards) reservoir snapshots into an exact uniform k-sample of
    * the whole stream. Emits rev-stamped (rev, n, sample). */
  def sampleFixedGlobal[V: Encoder](ds: Dataset[V], k: Int,
      seed: Long = 42L, shards: Int = 32)(
      implicit midEnc: Encoder[(Long, Long, Long, Seq[V])],
      shardEnc: Encoder[(Long, Seq[V])],
      // serves BOTH the per-shard packed state and the global output
      // (same shape (rev-or-n, n, sample))
      stEnc: Encoder[(Long, Long, Seq[V])]): Dataset[(Long, Long, Seq[V])] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val keyedEnc: Encoder[(Long, V)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[V]])
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    sampleFixedPerKey[Long, V](ds.map(v => (shardOf(v, shards), v)), k,
        seed)(longEnc, midEnc, stEnc)
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .transformWithState(new GlobalReservoirMergeProcessor[V](k, seed),
        TimeMode.None(), OutputMode.Append())(stEnc)
  }

  /** SplitMix64 finalizer — the deterministic pseudo-random mix behind
    * [[reservoirDraw]] (public-domain constant schedule; same mixer
    * the JDK's SplittableRandom uses). */
  private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit per-key draw-stream seed: value hash in the low word,
    * string-form hash in the high word, mixed through [[mix64]] — two
    * independent 32-bit hashes must BOTH collide before two keys share
    * a draw sequence (see [[ReservoirProcessor]]'s determinism note). */
  private[graft] def keyDrawHash(key: Any): Long =
    mix64(key.hashCode().toLong ^ (key.toString.hashCode.toLong << 32))

  /** Uniform draw in [0, n] for the (n+1)-th element of a key's
    * stream (Algorithm R's j) — a pure function of (seed, key hash,
    * element index), so the whole sample is REPLAYABLE: a pure
    * function of arrival order, exactly reproducible across runs and
    * spec-checkable against a reference fold. */
  private[graft] def reservoirDraw(seed: Long, keyHash: Long, n: Long): Long =
    Math.floorMod(mix64(seed ^ keyHash ^ (n * 0x632be59bd9b4e019L)), n + 1)

  /** Streaming fixed-size uniform sample per key — Beam's
    * Sample.fixedSizePerKey (sdks/java/core/src/main/java/org/apache/
    * beam/sdk/transforms/Sample.java:61) run continuously: classic
    * Algorithm R (Vitter) per key, state = ONE packed ValueState
    * (rev, n, k-slot reservoir — O(k) FOREVER). Each batch folds
    * locally into one state put; each TOUCHED key emits a rev-stamped
    * (rev, n, sample) snapshot — latest row per key = max rev, the
    * live uniform sample of everything that key has seen.
    * Draws come from [[reservoirDraw]] (deterministic in (seed, key,
    * index)), so two runs over the same arrival order produce
    * byte-identical samples — the reproducibility contract the batch
    * sampling queries keep via portable-hash ordering. The per-key
    * draw stream is seeded by [[keyDrawHash]]: a 64-bit combination
    * of the key's value hash and string form mixed through SplitMix64,
    * so two keys share a draw sequence only on a full 64-bit collision
    * (~2^-64, vs 2^-32 for raw hashCode). Determinism across runs
    * assumes value-stable `hashCode`/`toString` key types (primitives,
    * Strings, case classes — NOT raw arrays, which are also unsound as
    * groupByKey keys for the same identity-hash reason). */
  class ReservoirProcessor[K, V](k: Int, seed: Long)(
      implicit stEnc: Encoder[(Long, Long, Seq[V])])
      extends StatefulProcessor[K, (K, V), (K, Long, Long, Seq[V])] {
    require(k >= 1, s"k must be >= 1, got $k")

    // ONE packed ValueState (rev, n, reservoir) — one put per touched
    // key per batch, the repo's minimal-rowsUpdated idiom (the caller
    // supplies the Seq-bearing encoder, since V is generic here)
    @transient private var st: ValueState[(Long, Long, Seq[V])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Seq[V])]("reservoir",
        stEnc, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, V)],
        timers: TimerValues): Iterator[(K, Long, Long, Seq[V])] = {
      val (rev, n0, res0) =
        if (st.exists()) st.get() else (0L, 0L, Seq.empty[V])
      var n = n0
      val kh = keyDrawHash(key)
      val buf = scala.collection.mutable.ArrayBuffer[V](res0: _*)
      rows.foreach { case (_, v) =>
        if (n < k) buf += v
        else {
          val j = reservoirDraw(seed, kh, n)
          if (j < k) buf(j.toInt) = v
        }
        n += 1
      }
      if (n == n0) return Iterator.empty
      st.update((rev + 1L, n, buf.toSeq))
      Iterator.single((key, rev + 1L, n, buf.toSeq))
    }
  }

  /** [[ReservoirProcessor]] over a keyed value stream: per-key
    * rev-stamped (n, uniform k-sample) snapshots; latest row per key
    * = max rev. */
  def sampleFixedPerKey[K: Encoder, V](ds: Dataset[(K, V)],
      k: Int, seed: Long = 42L)(
      implicit outEnc: Encoder[(K, Long, Long, Seq[V])],
      stEnc: Encoder[(Long, Long, Seq[V])]): Dataset[(K, Long, Long, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new ReservoirProcessor[K, V](k, seed),
      // no timers, no TTL → TimeMode.None (see scd2Changes)
      TimeMode.None(), OutputMode.Append())

  /** Streaming per-key approximate distinct count — Beam's
    * ApproximateUnique.perKey (sdks/java/core/src/main/java/org/
    * apache/beam/sdk/transforms/ApproximateUnique.java:82) run
    * continuously under the global window: a DataSketches HllSketch
    * folds per key in ONE ValueState (compact bytes, O(2^lgK) FOREVER
    * — never O(distinct items)), one put per touched key per batch,
    * each touched key emitting a rev-stamped
    * (rev, n, estimate, sketch bytes) snapshot. The bytes are the
    * SAME library/format Spark's native `hll_sketch_agg` family uses
    * (org.apache.datasketches.hll), so downstream SQL can
    * `hll_sketch_estimate` an emitted sketch directly or
    * `hll_union_agg` the latest per-key sketches into group/global
    * distincts — stream state composes with batch analytics instead
    * of dead-ending (spec-asserted both ways). Standard HLL rsd
    * ≈ 1.04/√2^lgK (~1.6% at the lgK=12 default). */
  class ApproxDistinctProcessor[K](lgK: Int)
      extends StatefulProcessor[K, (K, String), (K, Long, Long, Long, Array[Byte])] {
    require(lgK >= 4 && lgK <= 21, s"lgK out of range: $lgK")

    @transient private var st: ValueState[(Long, Long, Array[Byte])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Array[Byte])]("hll",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.BINARY), TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, String)],
        timers: TimerValues): Iterator[(K, Long, Long, Long, Array[Byte])] = {
      val (rev, n0, bytes) =
        if (st.exists()) st.get() else (0L, 0L, Array.empty[Byte])
      val sk =
        if (bytes.isEmpty) new org.apache.datasketches.hll.HllSketch(lgK)
        else org.apache.datasketches.hll.HllSketch.heapify(bytes)
      var n = n0
      // null items are skipped AND excluded from n, matching
      // COUNT(DISTINCT x)'s NULL semantics (the sketch ignores them)
      rows.foreach { case (_, item) =>
        if (item != null) { sk.update(item); n += 1 }
      }
      if (n == n0) return Iterator.empty
      // compact image: smaller than the updatable form (no warm-up
      // coupon headroom / aux slack) and equally heapify-able by both
      // this processor and the native hll_* functions
      val out = sk.toCompactByteArray
      st.update((rev + 1L, n, out))
      Iterator.single((key, rev + 1L, n, Math.round(sk.getEstimate), out))
    }
  }

  /** [[ApproxDistinctProcessor]] over a keyed item stream: per-key
    * rev-stamped (n, distinct estimate, sketch bytes) snapshots;
    * latest row per key = max rev. */
  def approxDistinct[K: Encoder](ds: Dataset[(K, String)], lgK: Int = 12)(
      implicit outEnc: Encoder[(K, Long, Long, Long, Array[Byte])]): Dataset[(K, Long, Long, Long, Array[Byte])] =
    ds.groupByKey(_._1).transformWithState(
      new ApproxDistinctProcessor[K](lgK),
      // no timers, no TTL → TimeMode.None (see scd2Changes)
      TimeMode.None(), OutputMode.Append())

  /** The latest (max-srev) payload per shard from a merge-stage input
    * batch — the staleness rule every GLOBAL sketch's stage 2 applies
    * before folding shard snapshots into its MapState (≤ one snapshot
    * per shard per batch arrives by construction; the max-rev guard is
    * defensive). One copy so the rev-comparison logic can never
    * diverge across the merge processors. */
  private def latestPerShard[S](
      rows: Iterator[(Long, Long, S)]): scala.collection.mutable.Map[Long, S] = {
    val revs = scala.collection.mutable.Map[Long, Long]()
    val out = scala.collection.mutable.Map[Long, S]()
    rows.foreach { case (shard, srev, payload) =>
      if (revs.get(shard).forall(_ < srev)) {
        revs(shard) = srev; out(shard) = payload
      }
    }
    out
  }

  /** Shard assignment for the GLOBAL sketch forms: the item's own
    * value routes it — hash-sharding by item means an item's ENTIRE
    * count lands in exactly one shard, which is what lets per-shard
    * summaries compose without splitting any item's frequency. 64-bit
    * mixed ([[keyDrawHash]]) so shard skew is hash-collision-grade
    * only; same value-stable hashCode/toString caveat. */
  private[graft] def shardOf(item: Any, shards: Int): Long =
    Math.floorMod(keyDrawHash(item), shards.toLong)

  /** Second stage of [[heavyHittersGlobal]]: the O(shards)-row
    * snapshot stream merges under ONE grouping key. State is the
    * latest Misra-Gries summary per shard (MapState, ≤ `shards`
    * entries × k counters FOREVER; only shards that emitted this
    * batch rewrite). Because sharding is BY ITEM, shard summaries
    * cover disjoint item sets: the global summary is their plain
    * union, est(x) = its shard's est, and x's true undercount is
    * bounded by its own shard's err — so the published single bound
    * `err = max(shard errs)` is valid for every item (tighter than
    * [[graft.functions.MisraGries.merge]]'s general-case err sum,
    * which pays for overlapping summaries that cannot arise here),
    * and coverage holds: true(x) > err ≥ errShard(x) ⇒ x survives in
    * its shard. Emits one rev-stamped global snapshot per batch:
    * (rev, n, err, counters) — the FULL union (≤ shards × k entries,
    * est-descending), never truncated to k: a take(k) here would
    * silently break the coverage contract when more than k items
    * exceed err (consumers wanting exactly k take the prefix). */
  class GlobalHeavyHittersMergeProcessor[I](k: Int)(
      implicit shardEnc: Encoder[(Long, Long, Seq[(I, Long)])])
      extends StatefulProcessor[Int, (Long, Long, Long, Long, Seq[(I, Long)]), (Long, Long, Long, Seq[(I, Long)])] {
    require(k >= 1, s"k must be >= 1, got $k")

    // shard → (n, err, counters); rev in its own slot (one put each)
    @transient private var perShard: MapState[Long, (Long, Long, Seq[(I, Long)])] = _
    @transient private var rev: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perShard = getHandle.getMapState[Long, (Long, Long, Seq[(I, Long)])](
        "shardMg", Encoders.scalaLong, shardEnc, TTLConfig.NONE)
      rev = getHandle.getValueState[Long]("rev", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Int,
        rows: Iterator[(Long, Long, Long, Long, Seq[(I, Long)])],
        timers: TimerValues): Iterator[(Long, Long, Long, Seq[(I, Long)])] = {
      val fresh = latestPerShard(rows.map { case (shard, srev, n, err, cs) =>
        (shard, srev, (n, err, cs))
      })
      if (fresh.isEmpty) return Iterator.empty
      fresh.foreach { case (shard, st) => perShard.updateValue(shard, st) }
      // merge the full shard set (O(shards × k) — small by contract)
      var nSum = 0L; var errMax = 0L
      val union = scala.collection.mutable.ArrayBuffer[(I, Long)]()
      val it = perShard.iterator()
      while (it.hasNext) {
        val (_, (n, err, counters)) = it.next()
        nSum += n; errMax = math.max(errMax, err)
        union ++= counters
      }
      val r = (if (rev.exists()) rev.get() else 0L) + 1L
      rev.update(r)
      Iterator.single((r, nSum, errMax,
        union.sortBy { case (_, c) => -c }.toSeq))
    }
  }

  /** GLOBAL (cross-key) streaming heavy hitters — Beam's
    * SketchFrequencies / Top.largest over the whole stream
    * (sdks/java/extensions/sketching/src/main/java/org/apache/beam/
    * sdk/extensions/sketching/SketchFrequencies.java:90) in the
    * scale-safe two-stage form: stage 1 shards BY ITEM VALUE
    * (hash(item) % shards — parallel across the cluster, O(k) state
    * per shard) and runs the per-key [[HeavyHittersProcessor]]; stage
    * 2 merges the O(shards)-row snapshot stream under one key
    * ([[GlobalHeavyHittersMergeProcessor]] — a single-key stage is
    * only safe because its INPUT is summaries, never the event
    * stream). Emits rev-stamped global snapshots
    * (rev, n, err, counters est-descending, ≤ shards × k entries):
    * est ≤ true ≤ est + err deterministic, and EVERY item with true
    * count > err is present (which is why the list is not truncated
    * to k). Input: (item, weight); non-positive weights would void
    * the bounds and are rejected by the per-shard stage. */
  def heavyHittersGlobal[I: Encoder](ds: Dataset[(I, Long)], k: Int,
      shards: Int = 32)(
      implicit midEnc: Encoder[(Long, Long, Long, Long, Seq[(I, Long)])],
      shardEnc: Encoder[(Long, Long, Seq[(I, Long)])],
      outEnc: Encoder[(Long, Long, Long, Seq[(I, Long)])]): Dataset[(Long, Long, Long, Seq[(I, Long)])] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val keyedEnc: Encoder[(Long, I, Long)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[I]],
        Encoders.scalaLong)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val sharded = ds.map { case (i, w) => (shardOf(i, shards), i, w) }
    heavyHitters[Long, I](sharded, k)
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .transformWithState(new GlobalHeavyHittersMergeProcessor[I](k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming per-key top-K by comparator — Beam's Top.perKey
    * (sdks/java/core/src/main/java/org/apache/beam/sdk/transforms/
    * Top.java:58, the Top.of comparator form) run continuously under
    * the global window: the k GREATEST elements per key under `ord`,
    * held in ONE packed ValueState (rev, n, top-k descending — O(k)
    * FOREVER). Batches fold as buffer-and-compact (amortized
    * O(log k) per element, buffer bounded at k + 1024 regardless of
    * batch size), one state put and one rev-stamped
    * (key, rev, n, topK) snapshot per touched key per batch — latest
    * row per key = max rev. Top-k is a mergeable fold, so the result
    * is EXACT for any arrival order; tie order among ord-equal
    * elements is unspecified (pass a total order for replay-stable
    * output — same contract as Beam's comparator). */
  class TopKProcessor[K, V](k: Int, ord: Ordering[V])(
      implicit stEnc: Encoder[(Long, Long, Seq[V])])
      extends StatefulProcessor[K, (K, V), (K, Long, Long, Seq[V])] {
    require(k >= 1, s"k must be >= 1, got $k")

    @transient private var st: ValueState[(Long, Long, Seq[V])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Seq[V])]("topk", stEnc,
        TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, V)],
        timers: TimerValues): Iterator[(K, Long, Long, Seq[V])] = {
      val (rev, n0, top0) =
        if (st.exists()) st.get() else (0L, 0L, Seq.empty[V])
      var n = n0
      val desc = ord.reverse
      val buf = scala.collection.mutable.ArrayBuffer[V](top0: _*)
      rows.foreach { case (_, v) =>
        buf += v
        // periodic compaction keeps memory bounded on huge batches
        // while amortizing the sort across ~1024 arrivals
        if (buf.length >= k + 1024) {
          val keep = buf.sorted(desc).take(k)
          buf.clear(); buf ++= keep
        }
        n += 1
      }
      if (n == n0) return Iterator.empty
      val top = buf.sorted(desc).take(k).toSeq
      st.update((rev + 1L, n, top))
      Iterator.single((key, rev + 1L, n, top))
    }
  }

  /** [[TopKProcessor]] over a keyed value stream: per-key rev-stamped
    * (n, k greatest under `ord`, descending) snapshots; latest row per
    * key = max rev. */
  def topKPerKey[K: Encoder, V](ds: Dataset[(K, V)], k: Int)(
      implicit ord: Ordering[V],
      outEnc: Encoder[(K, Long, Long, Seq[V])],
      stEnc: Encoder[(Long, Long, Seq[V])]): Dataset[(K, Long, Long, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new TopKProcessor[K, V](k, ord),
      // no timers, no TTL → TimeMode.None (see scd2Changes)
      TimeMode.None(), OutputMode.Append())

  /** Second stage of [[topKGlobal]]: latest (n, top-k) per shard
    * (MapState, ≤ shards × k values FOREVER), re-merged on each emit
    * as union → sort desc → take k. The merge is STATELESS given the
    * shard snapshots and top-k is a mergeable fold, so every emitted
    * snapshot is the EXACT global top-k of everything seen: any
    * element of the true global top-k is, a fortiori, in the top-k of
    * whichever shard it landed in. */
  class GlobalTopKMergeProcessor[V](k: Int, ord: Ordering[V])(
      implicit shardEnc: Encoder[(Long, Seq[V])])
      extends StatefulProcessor[Int, (Long, Long, Long, Seq[V]), (Long, Long, Seq[V])] {
    require(k >= 1, s"k must be >= 1, got $k")

    @transient private var perShard: MapState[Long, (Long, Seq[V])] = _
    @transient private var rev: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perShard = getHandle.getMapState[Long, (Long, Seq[V])](
        "shardTop", Encoders.scalaLong, shardEnc, TTLConfig.NONE)
      rev = getHandle.getValueState[Long]("rev", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Int,
        rows: Iterator[(Long, Long, Long, Seq[V])],
        timers: TimerValues): Iterator[(Long, Long, Seq[V])] = {
      val fresh = latestPerShard(rows.map { case (shard, srev, n, top) =>
        (shard, srev, (n, top))
      })
      if (fresh.isEmpty) return Iterator.empty
      fresh.foreach { case (shard, st) => perShard.updateValue(shard, st) }
      var nSum = 0L
      val union = scala.collection.mutable.ArrayBuffer[V]()
      val it = perShard.iterator()
      while (it.hasNext) {
        val (_, (n, top)) = it.next()
        nSum += n
        union ++= top
      }
      val r = (if (rev.exists()) rev.get() else 0L) + 1L
      rev.update(r)
      Iterator.single((r, nSum, union.sorted(ord.reverse).take(k).toSeq))
    }
  }

  /** GLOBAL (cross-key) streaming top-K by comparator — Beam's
    * Top.of/largest/smallest on unbounded input (sdks/java/core/src/
    * main/java/org/apache/beam/sdk/transforms/Top.java:58) in the same
    * two-stage form as [[heavyHittersGlobal]]: value-hash shards each
    * keep a bounded k-heap in parallel (unlike the heavy-hitter
    * summaries, top-k is mergeable under ANY partition — hashing is
    * purely for balance), then a one-key stage re-merges the
    * O(shards × k) snapshot stream. Emits rev-stamped (rev, n, topK
    * descending) — EXACT, not approximate: each element survives in
    * its own shard iff it can survive globally. */
  def topKGlobal[V: Encoder](ds: Dataset[V], k: Int, shards: Int = 32)(
      implicit ord: Ordering[V],
      midEnc: Encoder[(Long, Long, Long, Seq[V])],
      shardEnc: Encoder[(Long, Seq[V])],
      outEnc: Encoder[(Long, Long, Seq[V])]): Dataset[(Long, Long, Seq[V])] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val keyedEnc: Encoder[(Long, V)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[V]])
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    // outEnc doubles as the packed-state encoder (same
    // (Long, Long, Seq[V]) shape) — passed explicitly to avoid
    // same-type implicit ambiguity
    topKPerKey[Long, V](ds.map(v => (shardOf(v, shards), v)), k)(
        implicitly[Encoder[Long]], ord, midEnc, outEnc)
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .transformWithState(new GlobalTopKMergeProcessor[V](k, ord),
        TimeMode.None(), OutputMode.Append())(outEnc)
  }

  /** Second stage of [[approxDistinctGlobal]]: latest HLL sketch bytes
    * per shard (MapState, ≤ `shards` compact images FOREVER), one
    * DataSketches union over the shard set per batch. Item-value
    * sharding makes shard item sets disjoint, but HLL union is exact
    * under ANY overlap — the bound is the plain union-sketch rsd. */
  class GlobalApproxDistinctMergeProcessor(lgK: Int)
      extends StatefulProcessor[Int, (Long, Long, Long, Long, Array[Byte]), (Long, Long, Long, Array[Byte])] {

    @transient private var perShard: MapState[Long, (Long, Array[Byte])] = _
    @transient private var rev: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      perShard = getHandle.getMapState[Long, (Long, Array[Byte])](
        "shardHll", Encoders.scalaLong,
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY), TTLConfig.NONE)
      rev = getHandle.getValueState[Long]("rev", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Int,
        rows: Iterator[(Long, Long, Long, Long, Array[Byte])],
        timers: TimerValues): Iterator[(Long, Long, Long, Array[Byte])] = {
      val fresh = latestPerShard(rows.map { case (shard, srev, n, _, bytes) =>
        (shard, srev, (n, bytes))
      })
      if (fresh.isEmpty) return Iterator.empty
      fresh.foreach { case (shard, st) => perShard.updateValue(shard, st) }
      var nSum = 0L
      val union = new org.apache.datasketches.hll.Union(lgK)
      val it = perShard.iterator()
      while (it.hasNext) {
        val (_, (n, bytes)) = it.next()
        nSum += n
        union.update(org.apache.datasketches.hll.HllSketch.heapify(bytes))
      }
      val sk = union.getResult
      val r = (if (rev.exists()) rev.get() else 0L) + 1L
      rev.update(r)
      Iterator.single((r, nSum, Math.round(sk.getEstimate),
        sk.toCompactByteArray))
    }
  }

  /** GLOBAL (cross-key) streaming approximate distinct count — Beam's
    * ApproximateUnique.globally (sdks/java/core/src/main/java/org/
    * apache/beam/sdk/transforms/ApproximateUnique.java:82) in the same
    * two-stage form as [[heavyHittersGlobal]]: per-shard
    * [[ApproxDistinctProcessor]] HLLs, then a one-key DataSketches
    * union over the O(shards) snapshot stream. Emits rev-stamped
    * (rev, n, estimate, union sketch bytes) — the bytes compose with
    * the native hll_* SQL functions exactly like the per-key form. */
  def approxDistinctGlobal(ds: Dataset[String], lgK: Int = 12,
      shards: Int = 32)(
      implicit outEnc: Encoder[(Long, Long, Long, Array[Byte])]): Dataset[(Long, Long, Long, Array[Byte])] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    implicit val keyedEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    implicit val midEnc: Encoder[(Long, Long, Long, Long, Array[Byte])] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.BINARY)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    val sharded = ds.filter((i: String) => i != null)
      .map(i => (shardOf(i, shards), i))
    approxDistinct[Long](sharded, lgK)
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .transformWithState(new GlobalApproxDistinctMergeProcessor(lgK),
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming per-key z-score anomaly detection — the continuous
    * form of the batch `anomaly_zscore` fit-and-flag (reference:
    * sdks/python/apache_beam/ml/anomaly/detectors/zscore.py over the
    * incremental univariate trackers): ONE packed ValueState per key
    * holds the landmark Welford (n, mean, M2); each arriving value
    * scores PREQUENTIALLY — z against the statistics of the values
    * before it — then folds in (so an extreme value never masks
    * itself by inflating the variance it is judged against). Emits
    * (key, value, z) for |z| > threshold once the tracker has seen
    * `minN` values (the warm-up gate every online detector needs;
    * sd = sample stddev, sqrt(M2/(n-1))). A deviation from a
    * CONSTANT warm-up (sd == 0, v != mean) is the clearest possible
    * anomaly, not a blind spot: it flags with the sentinel
    * z = ±Infinity (signed toward the deviation) — mathematically
    * honest (the value is unboundedly many sample-sds away) and
    * trivially past any finite threshold. State is O(keys) × 3
    * numbers, one put per touched key per batch — nothing buffers. */
  class ZScoreProcessor[K](threshold: Double, minN: Long)
      extends StatefulProcessor[K, (K, Double), (K, Double, Double)] {
    require(minN >= 2, s"minN must be >= 2 (sample stddev), got $minN")

    @transient private var st: ValueState[(Long, Double, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double, Double)]("welford",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
          Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[(K, Double)],
        timers: TimerValues): Iterator[(K, Double, Double)] = {
      var cur = if (st.exists()) st.get() else (0L, 0.0, 0.0)
      val out = scala.collection.mutable.ArrayBuffer[(K, Double, Double)]()
      var any = false
      rows.foreach { case (_, v) =>
        val (n, mean, m2) = cur
        if (n >= minN) {
          val sd = math.sqrt(m2 / (n - 1))
          if (sd > 0) {
            val z = (v - mean) / sd
            if (math.abs(z) > threshold) out += ((key, v, z))
          } else if (v != mean) {
            // constant-valued warm-up broken: infinitely many sds away
            out += ((key, v, math.signum(v - mean) * Double.PositiveInfinity))
          }
        }
        cur = welfordAdd(cur, v)
        any = true
      }
      if (any) st.update(cur)
      out.iterator
    }
  }

  /** One Welford accumulation step (pure; property-tested against the
    * exact two-pass mean/variance in RandomizedSpec). */
  private[graft] def welfordAdd(st: (Long, Double, Double),
      v: Double): (Long, Double, Double) = {
    val (n0, mean0, m20) = st
    val n = n0 + 1
    val d = v - mean0
    val mean = mean0 + d / n
    (n, mean, m20 + d * (v - mean))
  }

  /** [[ZScoreProcessor]] over a keyed value stream: per-key online
    * anomaly flags (key, value, z). */
  def anomalyZScore[K: Encoder](ds: Dataset[(K, Double)],
      threshold: Double = 2.5, minN: Long = 30L)(
      implicit outEnc: Encoder[(K, Double, Double)]): Dataset[(K, Double, Double)] =
    ds.groupByKey(_._1).transformWithState(
      new ZScoreProcessor[K](threshold, minN),
      // no timers, no TTL → TimeMode.None (see scd2Changes)
      TimeMode.None(), OutputMode.Append())

  /** [[HeavyHittersProcessor]] over a keyed item stream
    * (key, item, weight): per-key rev-stamped frequent-items
    * snapshots; latest row per key = max rev. */
  def heavyHitters[K: Encoder, I: Encoder](ds: Dataset[(K, I, Long)], k: Int)(
      implicit outEnc: Encoder[(K, Long, Long, Long, Seq[(I, Long)])]): Dataset[(K, Long, Long, Long, Seq[(I, Long)])] =
    ds.groupByKey(_._1).transformWithState(
      new HeavyHittersProcessor[K, I](k),
      // no timers, no TTL → TimeMode.None (see scd2Changes)
      TimeMode.None(), OutputMode.Append())

  /** Beam's event-time timer (`@TimerId` in TimeDomain.EVENT_TIME — the
    * domain Beam windows/GC run on): buffer values per key, register a
    * timer at (max seen event time + gapMs), re-arming as later events
    * arrive; when the WATERMARK passes the timer, flush the buffer as
    * one batch. This is ReduceFnRunner's end-of-window firing rebuilt
    * on transformWithState — a custom session-ish window with the
    * default (AfterWatermark.pastEndOfWindow) trigger.
    *
    * Input (key, eventTime, value); output = `flushFn(key, values)` per
    * flushed session, values in event-time order ((key, values)
    * identity for the plain flush).
    *
    * Sessions are EVENT-TIME clusters, not arrival-time ones: rows
    * sorted by event time split wherever the next row starts more than
    * `gapMs` past the cluster's max — so an event arriving (in
    * processing time) before an older session's timer fires, but
    * carrying an event time a full gap later, opens a NEW session
    * instead of silently extending the old one. ONE timer chain per
    * key aims at the earliest pending close; a chain timer whose
    * cluster merged away or extended (a late within-watermark row
    * bridged two clusters) fires as a no-op and re-arms. */
  class EventTimeGapProcessor[K, V, O](gapMs: Long,
      flushFn: (K, Seq[V]) => Iterator[O])(implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, java.sql.Timestamp, V), O] {

    // State layout (r13, the [[SessionLog]] design applied here): the
    // row log is APPEND-ONLY (pos, ts, value) — a flush no longer
    // clears+rewrites the surviving buffer (the r12 breakdown's last
    // ~6x-per-event write amplifier); flushed rows die LAZILY behind a
    // (pos, cutTs) fence and the one O(log) rewrite runs when dead
    // rows reach half the log (amortized O(1)/append). All scalar and
    // small-vector bookkeeping — next position, row/garbage counts,
    // the sorted disjoint cluster summaries, the fences — packs into
    // ONE ValueState row, so a batch writes one meta put per key
    // instead of the old sums clear + per-cluster re-appends. Timers
    // collapse from one-per-cluster-end (the old `armed` ListState,
    // rewritten on prune) to ONE chain per key aimed at the earliest
    // pending close; a chain timer left early by a since-extended
    // cluster fires as a cheap no-op and re-arms.
    //   meta = (nextPos, total, garbage, clusters, fences)
    //     clusters: (minTs, maxTs) sorted, pairwise > gapMs apart
    //     fences:   (fencePos, cutTs) — a row (pos, ts) is dead iff
    //               some fence has pos < fencePos && ts <= cutTs (the
    //               pos guard keeps a LATE row landing under an old
    //               cut alive; it reflushes as its own session)
    private type Meta =
      (Long, Long, Long, Seq[(Long, Long)], Seq[(Long, Long)])

    @transient private var log: ListState[(Long, Long, V)] = _
    @transient private var meta: ValueState[Meta] = _
    @transient private var nextTimer: ValueState[Long] = _
    // The pre-r13 "buf" ((ts, value), no positions) migration shim was
    // retired in r14 once no pre-r13 checkpoint could survive a round
    // boundary — dropping the variable relies on removed-state-tolerant
    // restore, the same contract the r11 sessions→sessions2 rename
    // shipped on (see SCALE.md's state-evolution playbook).

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      log = getHandle.getListState[(Long, Long, V)]("log",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, vEnc),
        TTLConfig.NONE)
      meta = getHandle.getValueState[Meta]("gapMeta",
        Encoders.product[Meta], TTLConfig.NONE)
      nextTimer = getHandle.getValueState[Long]("nextTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    private def insert(cs: Vector[(Long, Long)], ts: Long): Vector[(Long, Long)] =
      insertCluster(cs, ts, gapMs)

    private def loadMeta(): Meta =
      if (meta.exists()) meta.get() else (0L, 0L, 0L, Nil, Nil)

    /** Dead iff flushed behind some fence: appended before it
      * (pos < fencePos) at or below its cut. */
    private def live(pos: Long, ts: Long, fences: Seq[(Long, Long)]): Boolean =
      !fences.exists { case (fp, fc) => pos < fp && ts <= fc }

    /** Add a flush fence, dropping the ones it dominates (covers both
      * coordinates) — with in-order data every flush's fence dominates
      * all before it, so the list stays at ONE entry; only a late row
      * reflushed under an old cut leaves an extra behind (pruned at
      * the next dominating flush or compaction). */
    private def addFence(fences: Seq[(Long, Long)],
        fp: Long, fc: Long): Seq[(Long, Long)] =
      fences.filterNot { case (p, c) => p <= fp && c <= fc } :+ ((fp, fc))

    /** Re-aim the key's single timer chain at the earliest pending
      * close (first cluster's max + gap — ends increase across the
      * sorted disjoint clusters). Only ever moves EARLIER: a chain
      * timer left early by a since-extended cluster fires as a no-op
      * and re-arms here, avoiding a delete+register write per batch on
      * a steadily growing session. `consumed` = the expiry of the
      * timer this invocation is firing for, already spent. */
    private def armChain(cs: Vector[(Long, Long)], consumed: Long = 0L): Unit = {
      val have0 = if (nextTimer.exists()) nextTimer.get() else 0L
      val have = if (have0 == consumed) 0L else have0
      if (cs.isEmpty) {
        if (have != 0L) getHandle.deleteTimer(have)
        if (have0 != 0L) nextTimer.clear()
        return
      }
      val need = cs.head._2 + gapMs
      if (have == 0L || need < have) {
        if (have != 0L) getHandle.deleteTimer(have)
        getHandle.registerTimer(need)
        nextTimer.update(need)
      }
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, V)],
        timers: TimerValues): Iterator[O] = {
      var (nextPos, total, garbage, cs0, fences) = loadMeta()
      var cs = cs0.toVector
      // ONE appendList per key per batch, not one appendValue per row:
      // per-value appendValue pays a per-call store overhead that the
      // ScaleProbe measured as O(batch-appends) per key — a 20k-row
      // batch ran ~13x slower PER EVENT than a 2k-row batch on the
      // same accumulated state (O(batch²) per invocation); batching
      // the rows into one call restores O(batch)
      val batch = scala.collection.mutable.ArrayBuffer[(Long, Long, V)]()
      rows.foreach { case (_, ts, v) =>
        val t = ts.getTime
        batch += ((nextPos, t, v))
        cs = insert(cs, t)
        nextPos += 1; total += 1
      }
      if (batch.nonEmpty) log.appendList(batch.toArray)
      meta.update((nextPos, total, garbage, cs, fences))
      armChain(cs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[O] = {
      // flush by the WATERMARK, not the firing timer's own expiry: all
      // clusters whose end the watermark passed are equally final (no
      // row below the watermark can arrive to extend them), so the
      // batch's FIRST fire flushes every due cluster and later fires
      // no-op — one log scan per key per batch instead of one per
      // cluster.
      val expiry = timer.getExpiryTimeInMs()
      val cutTs = math.max(expiry, timers.getCurrentWatermarkInMs())
      val (nextPos, total, garbage0, cs0, fences0) = loadMeta()
      val cs = cs0.toVector
      // clusters are disjoint and sorted, so ends are increasing and
      // the due set is a PREFIX — a stale timer (its cluster merged
      // away or extended) is a pure no-op that never reads the log
      val (due, pending) = cs.partition(_._2 + gapMs <= cutTs)
      if (due.isEmpty) { armChain(cs, consumed = expiry); return Iterator.empty }
      val cut = due.last._2
      // ONE log read: split live rows at the cut; dead rows (behind a
      // fence) stay in the log untouched — they fall out at compaction
      val dueRows = scala.collection.mutable.ArrayBuffer[(Long, Long, V)]()
      val pendRows = scala.collection.mutable.ArrayBuffer[(Long, Long, V)]()
      val it = log.get()
      while (it.hasNext) {
        val e = it.next()
        if (live(e._1, e._2, fences0)) {
          if (e._2 <= cut) dueRows += e else pendRows += e
        }
      }
      val garbage = garbage0 + dueRows.length
      if (garbage * 2 >= total) {
        // threshold compaction — the ONLY log rewrite, amortized O(1)
        // per append: keep the still-pending live rows, drop fences
        // (every survivor is live)
        if (pendRows.isEmpty) log.clear() else log.put(pendRows.toArray)
        meta.update((nextPos, pendRows.length.toLong, 0L, pending, Nil))
      } else {
        meta.update((nextPos, total, garbage, pending,
          addFence(fences0, nextPos, cut)))
      }
      armChain(pending.toVector, consumed = expiry)
      // sort ONLY the flushed rows (ties by pos = arrival order, as
      // the old stable ts-sort of the arrival-ordered buffer did),
      // then split them across the due clusters
      val sorted = dueRows.sortInPlaceBy(e => (e._2, e._1))
      var rest: Seq[(Long, Long, V)] = sorted.toSeq
      due.iterator.flatMap { case (_, mx) =>
        val (rs, later) = rest.span(_._2 <= mx)
        rest = later
        flushFn(key, rs.map(_._3))
      }
    }
  }

  /** Gap-flush on the event-time watermark: values buffer per key into
    * event-time session clusters, each emitted as one batch (in
    * event-time order) when the watermark passes its last-event + gap.
    * `ds` must carry a watermark on its timestamp column
    * (`.withWatermark("_2", …)` upstream — EventTime mode requires it). */
  def eventTimeGapFlush[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], gapMs: Long)(
      implicit outEnc: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new EventTimeGapProcessor[K, V, (K, Seq[V])](gapMs,
        (k, vs) => Iterator((k, vs))),
      TimeMode.EventTime(), OutputMode.Append())

  /** [[eventTimeGapFlush]] with the group transform applied INSIDE the
    * stateful processor at flush time — avoids materializing a
    * `(K, Seq[V])` dataset (and its Seq encoder) when the caller only
    * wants the per-session result, e.g. the streaming MATCH_RECOGNIZE
    * front door running its NFA on each watermark-closed session. */
  def eventTimeGapApply[K: Encoder, V: Encoder, O](
      ds: Dataset[(K, java.sql.Timestamp, V)], gapMs: Long)(
      f: (K, Seq[V]) => Iterator[O])(
      implicit outEnc: Encoder[O]): Dataset[O] =
    ds.groupByKey(_._1).transformWithState(
      new EventTimeGapProcessor[K, V, O](gapMs, f),
      TimeMode.EventTime(), OutputMode.Append())

  /** FIXED (tumbling) event-time windows with an apply at close —
    * Beam's per-key-AND-window grouping under the default
    * AfterWatermark trigger: rows buffer per (key, windowStart), ONE
    * timer arms at window end, and `f(key, windowStart, rows)` runs
    * when the watermark passes it (rows in event-time order). The
    * fixed-window sibling of [[eventTimeGapApply]]'s sessions. */
  def eventTimeWindowApply[K: Encoder, V: Encoder, O](
      ds: Dataset[(K, java.sql.Timestamp, V)], windowMs: Long)(
      f: (K, Long, Seq[V]) => Iterator[O])(
      implicit outEnc: Encoder[O]): Dataset[O] = {
    // fail at plan time, not as an executor-side floorDiv / by zero
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    implicit val keyEnc: Encoder[(K, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaLong)
    ds.groupByKey { case (k, ts, _) =>
      (k, Math.floorDiv(ts.getTime, windowMs) * windowMs)
    }.transformWithState(
      new EventTimeWindowProcessor[K, K, V, O](windowMs, f),
      TimeMode.EventTime(), OutputMode.Append())
  }

  /** SLIDING event-time windows with an apply at close — rows are
    * replicated to every covering window (one per `slideMs` step, the
    * Beam SlidingWindows assignment), each (key, windowStart) group
    * buffers independently and flushes via `f` when the watermark
    * passes ITS window end. windowMs must be a multiple of slideMs'
    * granularity in spirit; any positive pair works (assignment is
    * start ∈ {…, floor(t/slide)·slide} with start > t − window). */
  def eventTimeSlidingApply[K: Encoder, V: Encoder, O](
      ds: Dataset[(K, java.sql.Timestamp, V)], windowMs: Long,
      slideMs: Long)(f: (K, Long, Seq[V]) => Iterator[O])(
      implicit outEnc: Encoder[O]): Dataset[O] = {
    require(windowMs > 0 && slideMs > 0 && slideMs <= windowMs,
      s"bad sliding windows: window=$windowMs slide=$slideMs")
    implicit val keyEnc: Encoder[(K, Long)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaLong)
    implicit val expEnc: Encoder[((K, Long), java.sql.Timestamp, V)] =
      Encoders.tuple(keyEnc, Encoders.TIMESTAMP, implicitly[Encoder[V]])
    val exploded = ds.flatMap { case (k, ts, v) =>
      val t = ts.getTime
      Iterator.iterate(Math.floorDiv(t, slideMs) * slideMs)(_ - slideMs)
        .takeWhile(s => s > t - windowMs)
        .map(s => ((k, s), ts, v))
    }
    exploded.groupByKey(_._1).transformWithState(
      new EventTimeWindowProcessor[(K, Long), K, V, O](windowMs, f),
      TimeMode.EventTime(), OutputMode.Append())
  }

  /** Processor behind [[eventTimeWindowApply]] / [[eventTimeSlidingApply]]:
    * key = (user key, windowStart); buffer + one end-of-window
    * event-time timer. `A` is the input row's first slot (the bare key
    * for fixed windows, the composite for pre-exploded sliding ones) —
    * only the timestamp and value slots are read. */
  class EventTimeWindowProcessor[A, K, V, O](windowMs: Long,
      flushFn: (K, Long, Seq[V]) => Iterator[O])(implicit vEnc: Encoder[V])
      extends StatefulProcessor[(K, Long), (A, java.sql.Timestamp, V), O] {

    @transient private var buf: ListState[(Long, V)] = _
    @transient private var armed: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[(Long, V)]("buf",
        Encoders.tuple(Encoders.scalaLong, vEnc), TTLConfig.NONE)
      armed = getHandle.getValueState[Boolean]("armed",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(key: (K, Long),
        rows: Iterator[(A, java.sql.Timestamp, V)],
        timers: TimerValues): Iterator[O] = {
      // ONE appendList per key per batch — see SessionLog.flush
      val local = scala.collection.mutable.ArrayBuffer[(Long, V)]()
      rows.foreach { case (_, ts, v) => local += ((ts.getTime, v)) }
      if (local.nonEmpty) buf.appendList(toArr(local))
      if (!armed.exists()) {
        getHandle.registerTimer(key._2 + windowMs)
        armed.update(true)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: (K, Long), timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[O] = {
      val rows = buf.get().toSeq.sortBy(_._1).map(_._2)
      buf.clear(); armed.clear()
      if (rows.nonEmpty) flushFn(key._1, key._2, rows) else Iterator.empty
    }
  }

  /** Compositional element-count trigger language — the combinator
    * shapes of Beam's trigger API (`Repeatedly.java:38`,
    * `AfterFirst.java:31`, `AfterAll.java:30`) over the
    * `AfterPane.elementCountAtLeast` primitive (`AfterPane.java:33`).
    * A trigger is asked, after each element, whether the current pane
    * should fire given `sinceLastFire`; firing resets the count (our
    * panes always re-arm, i.e. every composite is implicitly wrapped in
    * Beam's `Repeatedly.forever`). Processing-time primitives are out
    * of scope (a transformWithState processor runs in ONE time mode). */
  sealed trait CountTrigger {
    def shouldFire(sinceLastFire: Long): Boolean
    /** Stateless shapes (evaluable from `sinceLastFire` alone) — the
      * stateful composites below may only nest these, so one Long can
      * encode the whole per-window trigger state. */
    def isPure: Boolean = true
    /** Stateful contract: given the opaque per-window trigger state
      * (0 at window open and after the on-time reset) and the count
      * since the last firing, decide (fire?, nextState). Pure shapes
      * ignore the state. */
    def onElement(state: Long, since: Long): (Boolean, Long) =
      (shouldFire(since), state)
    /** A finished composite never fires again in this window (the
      * on-time / close panes are AfterWatermark's and still fire). */
    def finished(state: Long): Boolean = false
    /** Combine the trigger states of two MERGING windows (sessions) —
      * Beam's onMerge trigger-state merge (ReduceFnRunner.java:97 over
      * Sessions.java:57-66). Progress composites join at the furthest
      * point; [[OrFinallyOf]] overrides to SUM the until-counts (Beam
      * merges AfterPane element counts by summing the combining
      * state). Pure shapes carry no state. */
    def mergeState(a: Long, b: Long): Long = math.max(a, b)
  }
  /** AfterPane.elementCountAtLeast(n). */
  final case class AfterCount(n: Int) extends CountTrigger {
    require(n >= 1)
    def shouldFire(since: Long): Boolean = since >= n
  }
  /** Fires when ANY sub-trigger would (Beam AfterFirst). */
  final case class AfterFirstOf(ts: CountTrigger*) extends CountTrigger {
    require(ts.forall(_.isPure), "AfterFirstOf nests pure triggers only")
    def shouldFire(since: Long): Boolean = ts.exists(_.shouldFire(since))
  }
  /** Fires when ALL sub-triggers would (Beam AfterAll). */
  final case class AfterAllOf(ts: CountTrigger*) extends CountTrigger {
    require(ts.forall(_.isPure), "AfterAllOf nests pure triggers only")
    def shouldFire(since: Long): Boolean = ts.forall(_.shouldFire(since))
  }
  /** Never fires on elements — only the watermark pane (Beam Never /
    * the pure default trigger). */
  case object NeverCount extends CountTrigger {
    def shouldFire(since: Long): Boolean = false
  }
  /** Beam AfterEach.inOrder (AfterEach.java:43): run the children in
    * SEQUENCE — child i must fire before child i+1 starts being
    * evaluated; after the last child fires the composite is finished
    * for the window. Each child sees the element count since the
    * composite's previous firing (its own fresh pane). State = index
    * of the active child. */
  final case class AfterEachOf(children: CountTrigger*) extends CountTrigger {
    require(children.nonEmpty && children.forall(_.isPure),
      "AfterEachOf needs >= 1 pure children")
    override def isPure: Boolean = false
    def shouldFire(since: Long): Boolean = children.head.shouldFire(since)
    override def onElement(state: Long, since: Long): (Boolean, Long) =
      if (state >= children.size) (false, state)
      else if (children(state.toInt).shouldFire(since)) (true, state + 1)
      else (false, state)
    override def finished(state: Long): Boolean = state >= children.size
  }
  /** Beam OrFinallyTrigger (OrFinallyTrigger.java:31;
    * `Repeatedly.forever(main).orFinally(until)`): behaves as `main`,
    * but when `until` fires the composite fires ONE last pane and is
    * finished for the window. Beam resets only the repeated `main` on
    * each firing while `until` keeps its state — mirrored here by
    * evaluating `until` against the element count since WINDOW start
    * (carried in the trigger state), while `main` sees the pane-local
    * count. State = (untilCount << 1) | finishedBit. */
  final case class OrFinallyOf(main: CountTrigger, until: CountTrigger)
      extends CountTrigger {
    require(main.isPure && until.isPure,
      "OrFinallyOf nests pure triggers only")
    override def isPure: Boolean = false
    def shouldFire(since: Long): Boolean = main.shouldFire(since)
    override def onElement(state: Long, since: Long): (Boolean, Long) =
      if ((state & 1L) == 1L) (false, state)
      else {
        val untilCount = (state >> 1) + 1
        if (until.shouldFire(untilCount)) (true, 1L) // fire, then finish
        else (main.shouldFire(since), untilCount << 1)
      }
    override def finished(state: Long): Boolean = (state & 1L) == 1L
    override def mergeState(a: Long, b: Long): Long =
      (((a >> 1) + (b >> 1)) << 1) | ((a | b) & 1L)
  }

  /** One fired pane of [[TriggeredWindowProcessor]]:
    * (key, windowStart, paneIndex, timing, isFinal, values). Timing ∈
    * EARLY / ON_TIME / LATE — Beam's PaneInfo.Timing
    * (windowing/PaneInfo.java:45); paneIndex increments per firing of
    * the same window; isFinal marks the window-closing (GC) pane. */
  type Pane[K, V] = (K, Long, Long, String, Boolean, Seq[V])

  /** Beam's trigger/pane state machine — a reduced ReduceFnRunner
    * (runners/core-java/.../ReduceFnRunner.java:97) for fixed windows
    * with the canonical compound trigger
    * `AfterWatermark.pastEndOfWindow()                    // AfterWatermark.java:60
    *    .withEarlyFirings(AfterPane.elementCountAtLeast(earlyFireEvery))
    *    .withLateFirings(AfterPane.elementCountAtLeast(lateFireEvery))`
    * (AfterPane.java:33), in either accumulation mode:
    *
    *  - EARLY panes: before the watermark passes the window end, every
    *    `earlyFireEvery` buffered elements fire a pane (0 = no early
    *    firings — the pure default trigger).
    *  - ON_TIME pane: fired exactly once when the (conceptual) Beam
    *    watermark passes the window end; fired even if no new elements
    *    arrived since the last early pane (Beam's default
    *    OnTimeBehavior.FIRE_ALWAYS).
    *  - LATE panes: elements arriving after the on-time firing but
    *    within `allowedLatenessMs` fire every `lateFireEvery` elements.
    *  - At window end + allowed lateness the window is CLOSED: a final
    *    pane (isFinal=true) flushes any unfired remainder and state is
    *    GC'd — ReduceFnRunner's onGarbageCollection.
    *  - `accumulating=true` ⇒ each pane carries ALL window values so
    *    far (Beam accumulatingFiredPanes); false ⇒ only values since
    *    the previous pane (discardingFiredPanes).
    *  - `retractions=true` (requires accumulating) ⇒ before each
    *    non-first pane, a RETRACT pane re-emits the PREVIOUS pane's
    *    contents so downstream consumers can subtract it — Beam's
    *    accumulatingAndRetractingFiredPanes
    *    (`Window.java:259-270` / the retraction region of
    *    beam_runner_api.proto; Beam itself never shipped runner
    *    support — the mode exists here end-to-end).
    *
    * Watermark mapping: Spark has ONE watermark (max event − delay),
    * Beam two concepts (watermark + allowed lateness beyond it). The
    * caller MUST set the upstream watermark delay to `allowedLatenessMs`
    * (`.withWatermark(ts, s"$allowedLatenessMs milliseconds")`); the
    * conceptual Beam watermark is then Spark's + allowedLateness, so
    * the on-time timer arms at (windowEnd − allowedLateness) and the GC
    * timer at windowEnd in Spark's domain. Spark drops rows below its
    * watermark by ELEMENT time where Beam drops by WINDOW end — rows
    * early in their window arriving near the lateness horizon can be
    * dropped slightly sooner than Beam would; same bounded-staleness
    * contract, documented difference.
    *
    * Constraint: `allowedLatenessMs < windowMs` (enforced). The
    * on-time timer arms at (windowEnd − allowedLateness) in Spark's
    * domain; with lateness ≥ the window size that expiry lands at or
    * before the window START, so the timer could fire below the
    * registration watermark and rows conceptually on-time/late would
    * be mis-classified EARLY. Larger lateness horizons want a wider
    * window or a two-level (window, horizon) state design — rejected
    * here rather than silently mis-labelled. */
  class TriggeredWindowProcessor[K, V](windowMs: Long, allowedLatenessMs: Long,
      earlyTrigger: CountTrigger, lateTrigger: CountTrigger,
      accumulating: Boolean, retractions: Boolean = false)(
      implicit stEnc: Encoder[(Seq[V], Long, Long, Boolean, Long)])
      extends StatefulProcessor[K, (K, java.sql.Timestamp, V), (K, Long, Long, String, Boolean, Seq[V])] {
    require(windowMs > 0 && allowedLatenessMs >= 0)
    require(allowedLatenessMs < windowMs,
      s"allowedLatenessMs ($allowedLatenessMs) must be < windowMs " +
        s"($windowMs): the on-time timer arms at windowEnd - lateness, " +
        "which must fall strictly inside the window (see scaladoc)")
    require(!retractions || accumulating,
      "retractions require accumulating mode (a discarding pane has nothing to retract)")

    // per-window pane state: (buffer, countSinceLastFire, paneIndex,
    // onTimeFired, triggerState) — buffer holds the whole window when
    // accumulating, else only values since the previous pane;
    // triggerState is the active trigger's opaque composite state
    // (AfterEachOf child index / OrFinallyOf finished+count), reset to
    // 0 at the on-time transition so the late trigger starts fresh
    @transient private var windows: MapState[Long, (Seq[V], Long, Long, Boolean, Long)] = _
    // ONE event-time timer chain per key (see the session processor's
    // nextTimer): the fire sweeps EVERY window the watermark passed,
    // replacing two timers per window whose fires each iterated the
    // whole window map — O(windows²) reads per batch on a busy key
    @transient private var nextTimer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      windows = getHandle.getMapState[Long, (Seq[V], Long, Long, Boolean, Long)](
        "windows", Encoders.scalaLong, stEnc, TTLConfig.NONE)
      nextTimer = getHandle.getValueState[Long]("nextTimer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Re-aim the chain at the earliest pending need: (end − lateness)
      * for an unfired window, (end) for a fired one awaiting GC — both
      * in Spark's watermark domain. Fixed windows never extend, so the
      * chain only ever needs to move earlier (a new window can open
      * below existing needs). */
    private def armNext(): Unit = {
      val pending = if (nextTimer.exists()) nextTimer.get() else 0L
      val it = windows.iterator()
      var need = Long.MaxValue
      while (it.hasNext) {
        val (w, st) = it.next()
        val n = if (!st._4) w + windowMs - allowedLatenessMs else w + windowMs
        if (n < need) need = n
      }
      if (need == Long.MaxValue) {
        if (pending != 0L) { getHandle.deleteTimer(pending); nextTimer.clear() }
      } else if (pending == 0L || need < pending) {
        if (pending != 0L) getHandle.deleteTimer(pending)
        getHandle.registerTimer(need)
        nextTimer.update(need)
      }
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, V)],
        timers: TimerValues): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      // per-element state writes deferred: the pane state (including
      // the whole window buffer) serializes into the MapState ONCE per
      // touched window per batch, not once per row — a B-row batch
      // into one window was O(B²) serialized bytes otherwise (the r10
      // breakdown's rowsUpdated ≈ 2× events on this op)
      val touched = scala.collection.mutable.Map[Long, (Seq[V], Long, Long, Boolean, Long)]()
      rows.foreach { case (_, ts, v) =>
        val w = Math.floorDiv(ts.getTime, windowMs) * windowMs
        val opening = !touched.contains(w) && !windows.containsKey(w)
        var (buf, since, pane, fired, trigSt) =
          if (opening) (Seq.empty[V], 0L, 0L, false, 0L)
          else touched.getOrElse(w, windows.getValue(w))
        buf :+= v
        since += 1
        val trig = if (fired) lateTrigger else earlyTrigger
        val (fire, nextSt) = trig.onElement(trigSt, since)
        trigSt = nextSt
        if (fire) {
          if (retractions && pane > 0) {
            val prevPane = buf.take(buf.size - since.toInt)
            if (prevPane.nonEmpty)
              out += ((key, w, pane - 1, "RETRACT", false, prevPane))
          }
          out += ((key, w, pane, if (fired) "LATE" else "EARLY", false, buf))
          pane += 1; since = 0
          if (!accumulating) buf = Seq.empty
        }
        touched(w) = (buf, since, pane, fired, trigSt)
      }
      touched.foreach { case (w, st) => windows.updateValue(w, st) }
      armNext()
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val expiry = timer.getExpiryTimeInMs()
      if (nextTimer.exists() && nextTimer.get() == expiry) nextTimer.clear()
      // sweep by the WATERMARK: one fire drains every due window (the
      // timer was aimed at the earliest need; all windows the
      // watermark passed this batch are equally final)
      val cut = math.max(expiry, timers.getCurrentWatermarkInMs())
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      val openWindows = {
        val it = windows.keys(); val b = scala.collection.mutable.ArrayBuffer[Long]()
        while (it.hasNext) b += it.next()
        b.sorted
      }
      openWindows.foreach { w =>
        // on-time firing: conceptual watermark passed the window end
        var closedHere = false
        if (w + windowMs - allowedLatenessMs <= cut) {
          val (buf, since, pane, fired, _) = windows.getValue(w)
          if (!fired) {
            if (retractions && pane > 0) {
              val prevPane = buf.take(buf.size - since.toInt)
              if (prevPane.nonEmpty)
                out += ((key, w, pane - 1, "RETRACT", false, prevPane))
            }
            val closing = allowedLatenessMs == 0
            // trigger state resets to 0: the late trigger starts fresh
            out += ((key, w, pane, "ON_TIME", closing, buf))
            if (closing) { windows.removeKey(w); closedHere = true }
            else windows.updateValue(w,
              (if (accumulating) buf else Seq.empty, 0L, pane + 1, true, 0L))
          }
        }
        // window close + GC: lateness horizon passed
        if (!closedHere && w + windowMs <= cut && allowedLatenessMs > 0) {
          val (buf, since, pane, fired, _) = windows.getValue(w)
          if (since > 0) {
            if (retractions && pane > 0) {
              val prevPane = buf.take(buf.size - since.toInt)
              if (prevPane.nonEmpty)
                out += ((key, w, pane - 1, "RETRACT", false, prevPane))
            }
            out += ((key, w, pane, if (fired) "LATE" else "ON_TIME", true, buf))
          }
          windows.removeKey(w)
        }
      }
      armNext()
      out.iterator
    }
  }

  /** Nexmark Q3's incremental join (nexmark/.../queries/Query3.java —
    * THE Beam state+timers showcase): per key, one LEFT ("person") value
    * arrives at some point; RIGHT ("auction") values arriving BEFORE it
    * buffer in BagState and flush the moment the person appears; rights
    * arriving after join immediately against the ValueState. First
    * person wins (Q3's semantics — person records are immutable).
    *
    * Input rows carry exactly one side: (key, Some(l), None) or
    * (key, None, Some(r)). Output: one (key, l, r) per joined pair. */
  class IncrementalJoinProcessor[K, L, R](ttl: TTLConfig = TTLConfig.NONE)(
      implicit lEnc: Encoder[L], rEnc: Encoder[R])
      extends StatefulProcessor[K, (K, Option[L], Option[R]), (K, L, R)] {

    @transient private var person: ValueState[L] = _
    @transient private var pending: ListState[R] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // the GC story: with a TTL, a person (and any never-joined
      // buffered rights) ages out `ttl` after its last update — bounded
      // state for keys that stop arriving. NONE matches Beam Q3's
      // forever-persons exactly.
      person = getHandle.getValueState[L]("person", lEnc, ttl)
      pending = getHandle.getListState[R]("pending", rEnc, ttl)
    }

    override def handleInputRows(key: K, rows: Iterator[(K, Option[L], Option[R])],
        timers: TimerValues): Iterator[(K, L, R)] = {
      val out = scala.collection.mutable.ArrayBuffer[(K, L, R)]()
      // rights buffer locally; ONE appendList persists the batch's
      // still-unjoined remainder — see SessionLog.flush
      val local = scala.collection.mutable.ArrayBuffer[R]()
      rows.foreach {
        case (_, Some(l), _) if !person.exists() =>
          person.update(l)
          val buffered = pending.get().toSeq ++ local
          pending.clear(); local.clear()
          buffered.foreach(r => out += ((key, l, r)))
        case (_, Some(_), _) => // duplicate person: first wins
        case (_, None, Some(r)) =>
          if (person.exists()) out += ((key, person.get(), r))
          else local += r
        case _ => // (None, None): ignore
      }
      if (local.nonEmpty) pending.appendList(toArr(local))
      out.iterator
    }
  }

  /** Streaming Nexmark-Q3 join — see [[IncrementalJoinProcessor]].
    * Pass a `ttl` to bound state for keys that never complete
    * (TTL requires ProcessingTime mode). */
  def incrementalJoin[K: Encoder, L: Encoder, R: Encoder](
      ds: Dataset[(K, Option[L], Option[R])],
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit outEnc: Encoder[(K, L, R)]): Dataset[(K, L, R)] =
    ds.groupByKey(_._1).transformWithState(
      new IncrementalJoinProcessor[K, L, R](ttl),
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime(),
      OutputMode.Append())

  /** Streaming TEMPORAL (as-of) join — enrich each left event with the
    * right-side version in effect at the event's timestamp (greatest
    * version ts <= event ts): the streaming form of `Joins.asofJoin`,
    * Flink's temporal-table join, and the keyed state+timers pattern
    * Beam users hand-build over CoGBK for CDC-dimension enrichment.
    *
    * Correctness under out-of-order arrival: event e can only resolve
    * once no version with ts' <= e.ts can still arrive — i.e. once the
    * event-time WATERMARK (Spark takes the min across both unioned
    * inputs) has passed e.ts. Events buffer per key and resolve inside
    * an event-time timer armed at the earliest pending event ts; a
    * version arriving before the watermark passes an already-buffered
    * event is therefore SEEN by that event, which a naive lookup-join
    * against "current" state would miss. Rows older than the watermark
    * are dropped by the engine's late-row filter before reaching the
    * processor (allowed lateness 0 — tune via the watermark delay).
    *
    * GC: after each flush, every version strictly older than the newest
    * version <= watermark is superseded for all future events and
    * drops; state per key stays O(unresolved events + live versions).
    *
    * Input rows carry exactly one side: (k, ts, Some(v), None) = event,
    * (k, ts, None, Some(r)) = version. Output: (k, ts, v, Option[r]) —
    * left-outer as-of (None when no version predates the event). */
  class TemporalJoinProcessor[K, V, R](
      implicit vEnc: Encoder[V], rEnc: Encoder[R])
      extends StatefulProcessor[K, (K, java.sql.Timestamp, Option[V], Option[R]),
        (K, java.sql.Timestamp, V, Option[R])] {

    @transient private var versions: MapState[Long, R] = _
    @transient private var pending: ListState[(Long, V)] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      versions = getHandle.getMapState[Long, R]("versions",
        Encoders.scalaLong, rEnc, TTLConfig.NONE)
      pending = getHandle.getListState[(Long, V)]("pending",
        Encoders.tuple(Encoders.scalaLong, vEnc), TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    /** Re-register the wake-up timer. `firedTs`: the timestamp of a
      * timer currently mid-expiry — the engine rejects re-registering
      * that exact ts during the callback (it still exists) and then
      * deletes it afterwards, so aim one ms past it (resolution needs
      * the watermark strictly beyond the event anyway). */
    private def rearm(firedTs: Long = Long.MinValue): Unit = {
      var minTs = Long.MaxValue
      pending.get().foreach(p => if (p._1 < minTs) minTs = p._1)
      val targetRaw =
        if (minTs != Long.MaxValue) minTs
        else {
          // versions-only key (no pending events): arm at the SECOND-
          // smallest version ts, so the superseded older version GCs
          // when the watermark passes it — without this, a dimension
          // key that updates but is never probed accumulates state
          // forever (the #1 long-running-stream failure mode).
          var lo = Long.MaxValue
          var lo2 = Long.MaxValue
          versions.keys().foreach { t =>
            if (t < lo) { lo2 = lo; lo = t } else if (t < lo2) lo2 = t
          }
          lo2
        }
      val target =
        if (targetRaw != Long.MaxValue && targetRaw <= firedTs) firedTs + 1
        else targetRaw
      if (target == Long.MaxValue) {
        if (armed.exists()) { getHandle.deleteTimer(armed.get()); armed.clear() }
      } else if (!armed.exists() || armed.get() != target) {
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        getHandle.registerTimer(target)
        armed.update(target)
      }
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, Option[V], Option[R])],
        timers: TimerValues): Iterator[(K, java.sql.Timestamp, V, Option[R])] = {
      // events buffer locally, ONE appendList — see SessionLog.flush
      val local = scala.collection.mutable.ArrayBuffer[(Long, V)]()
      rows.foreach {
        case (_, ts, Some(v), _) => local += ((ts.getTime, v))
        case (_, ts, _, Some(r)) => versions.updateValue(ts.getTime, r)
        case _ => // (None, None): ignore
      }
      if (local.nonEmpty) pending.appendList(toArr(local))
      rearm()
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, java.sql.Timestamp, V, Option[R])] = {
      val wm = timers.getCurrentWatermarkInMs()
      // ts == wm could still gain a version at exactly wm → only < wm
      // is safe to resolve; the rest re-arm.
      val (ready, rest) = pending.get().toSeq.partition(_._1 < wm)
      val vers = versions.iterator().map(p => (p._1, p._2)).toArray.sortBy(_._1)
      val out = ready.sortBy(_._1).map { case (ts, v) =>
        // floor lookup: newest version at-or-before the event
        var floor: Option[R] = None
        var i = 0
        while (i < vers.length && vers(i)._1 <= ts) { floor = Some(vers(i)._2); i += 1 }
        (key, new java.sql.Timestamp(ts), v, floor)
      }
      if (ready.nonEmpty) {
        if (rest.isEmpty) pending.clear()
        else pending.put(rest.toArray)
      }
      // GC: the newest version <= wm stays (floor candidate for every
      // future on-time event); all strictly older ones are unreachable
      val live = vers.filter(_._1 <= wm)
      if (live.length > 1) live.iterator.take(live.length - 1)
        .foreach(p => versions.removeKey(p._1))
      // the engine DELETES the fired timer after this callback (and
      // rejects re-registering its exact ts during it) — clear `armed`
      // unconditionally and aim past the fired ts, or the key stalls
      // permanently when the watermark lands exactly on the earliest
      // pending event.
      armed.clear()
      rearm(firedTs = timer.getExpiryTimeInMs())
      out.iterator
    }
  }

  /** Streaming as-of join — see [[TemporalJoinProcessor]]. Tags, unions
    * and watermarks the two inputs (`delay` on both sides; the engine
    * runs on the min watermark), then resolves per key at watermark
    * passage. */
  def temporalJoin[K: Encoder, V: Encoder, R: Encoder](
      events: Dataset[(K, java.sql.Timestamp, V)],
      versions: Dataset[(K, java.sql.Timestamp, R)],
      delay: String = "0 seconds")(
      implicit unionEnc: Encoder[(K, java.sql.Timestamp, Option[V], Option[R])],
      outEnc: Encoder[(K, java.sql.Timestamp, V, Option[R])])
      : Dataset[(K, java.sql.Timestamp, V, Option[R])] = {
    val l = events
      .map { case (k, ts, v) => (k, ts, Option(v), Option.empty[R]) }
      .withWatermark("_2", delay)
    val r = versions
      .map { case (k, ts, rr) => (k, ts, Option.empty[V], Option(rr)) }
      .withWatermark("_2", delay)
    l.union(r).groupByKey(_._1).transformWithState(
      new TemporalJoinProcessor[K, V, R](),
      TimeMode.EventTime(), OutputMode.Append())
  }

  /** Nexmark Q9 "winning bids" (nexmark/.../queries/Query9.java): per
    * key, an auction row opens a window of `durationMs`; bid rows
    * compete by (price desc, time asc, id asc); when the WATERMARK
    * passes the auction close, the winning bid emits and state clears.
    * Bids arriving before their auction buffer and replay once it opens
    * (out-of-order arrival, Beam's Q9 join contract); bids outside the
    * auction window drop at replay/arrival time.
    *
    * Input: (key, eventTime, isAuction, id, value).
    * Output: (key, auctionId, bidId, price).
    *
    * GC story: auction state clears at the close timer. Bids buffered
    * for a key whose auction NEVER arrives would leak — when
    * `orphanTtlMs` > 0, the first orphan bid arms a cleanup timer at
    * (bidTime + orphanTtlMs); if no auction has opened by then, the
    * buffer drops (bounded state under key churn). */
  class WinningBidProcessor[K](durationMs: Long, orphanTtlMs: Long = 0L)
      extends StatefulProcessor[K, (K, java.sql.Timestamp, Boolean, Long, Double), (K, Long, Long, Double)] {

    @transient private var auction: ValueState[(Long, Long)] = _      // (openMs, auctionId)
    @transient private var best: ValueState[(Double, Long, Long)] = _ // (value, tsMs, bidId)
    @transient private var early: ListState[(Long, Long, Double)] = _ // (tsMs, bidId, value)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      auction = getHandle.getValueState[(Long, Long)]("auction",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
      best = getHandle.getValueState[(Double, Long, Long)]("best",
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)
      early = getHandle.getListState[(Long, Long, Double)]("early",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaDouble), TTLConfig.NONE)
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, Boolean, Long, Double)],
        timers: TimerValues): Iterator[(K, Long, Long, Double)] = {
      // best/early fold into LOCALS, persisted once at the end —
      // per-row ValueState get/update and ListState appendValue pay a
      // per-call store overhead that grows within a batch (see
      // SessionLog.flush)
      var bestLocal: (Double, Long, Long) = null
      var bestLoaded = false
      var bestDirty = false
      def offer(openMs: Long, tsMs: Long, bidId: Long, value: Double): Unit =
        if (tsMs >= openMs && tsMs < openMs + durationMs) {
          if (!bestLoaded) {
            bestLocal = if (best.exists()) best.get() else null
            bestLoaded = true
          }
          val better = bestLocal == null || {
            val (bv, bts, bid) = bestLocal
            value > bv || (value == bv && (tsMs < bts ||
              (tsMs == bts && bidId < bid)))
          }
          if (better) { bestLocal = (value, tsMs, bidId); bestDirty = true }
        }
      val localEarly = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
      var storeProbed = false
      var storeNonEmpty = false
      def storeHasRows: Boolean = {
        if (!storeProbed) { storeNonEmpty = early.get().hasNext; storeProbed = true }
        storeNonEmpty
      }
      rows.foreach { case (_, ts, isAuction, id, value) =>
        if (isAuction) {
          if (!auction.exists()) {
            val openMs = ts.getTime
            auction.update((openMs, id))
            getHandle.registerTimer(openMs + durationMs)
            early.get().foreach { case (bts, bid, bv) => offer(openMs, bts, bid, bv) }
            localEarly.foreach { case (bts, bid, bv) => offer(openMs, bts, bid, bv) }
            early.clear(); localEarly.clear()
          }
        } else {
          if (auction.exists()) offer(auction.get()._1, ts.getTime, id, value)
          else {
            if (orphanTtlMs > 0 && localEarly.isEmpty && !storeHasRows)
              getHandle.registerTimer(ts.getTime + orphanTtlMs)
            localEarly += ((ts.getTime, id, value))
          }
        }
      }
      if (localEarly.nonEmpty) early.appendList(localEarly.toArray)
      if (bestDirty) best.update(bestLocal)
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Long, Long, Double)] = {
      if (!auction.exists()) {
        // orphan-bid horizon passed with no auction: drop only the
        // bids whose OWN horizon this expiry covers. A stale timer (its
        // cohort was consumed by an auction that itself already closed)
        // must not clear bids buffered for the NEXT auction — those
        // keep their buffer and a re-armed timer at the earliest
        // survivor's horizon.
        val expiry = timer.getExpiryTimeInMs()
        val keep =
          if (orphanTtlMs <= 0) Seq.empty // unreachable defensively
          else early.get().filter(_._1 + orphanTtlMs > expiry).toSeq
        if (keep.isEmpty) early.clear()
        else {
          early.put(keep.toArray)
          getHandle.registerTimer(keep.iterator.map(_._1).min + orphanTtlMs)
        }
        Iterator.empty
      } else if (timer.getExpiryTimeInMs() ==
          auction.get()._1 + durationMs) {
        val out =
          if (best.exists()) {
            val (_, auctionId) = auction.get()
            val (value, _, bidId) = best.get()
            Iterator((key, auctionId, bidId, value))
          } else Iterator.empty
        auction.clear(); best.clear(); early.clear()
        out
      } else Iterator.empty // stale orphan timer; the auction did open
    }
  }

  /** Streaming Nexmark-Q9 winning bids — see [[WinningBidProcessor]].
    * `ds` must carry a watermark on the timestamp column. */
  def winningBid[K: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, Boolean, Long, Double)],
      durationMs: Long, orphanTtlMs: Long = 0L)(
      implicit outEnc: Encoder[(K, Long, Long, Double)]): Dataset[(K, Long, Long, Double)] =
    ds.groupByKey(_._1).transformWithState(
      new WinningBidProcessor[K](durationMs, orphanTtlMs),
      TimeMode.EventTime(), OutputMode.Append())

  /** Fixed windows with Beam's early/on-time/late trigger panes — see
    * [[TriggeredWindowProcessor]]. `ds` must carry
    * `.withWatermark(tsCol, s"$allowedLatenessMs milliseconds")`. */
  def triggeredWindows[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], windowMs: Long,
      allowedLatenessMs: Long = 0L, earlyFireEvery: Int = 0,
      lateFireEvery: Int = 1, accumulating: Boolean = false,
      retractions: Boolean = false)(
      implicit stEnc: Encoder[(Seq[V], Long, Long, Boolean, Long)],
      outEnc: Encoder[(K, Long, Long, String, Boolean, Seq[V])]): Dataset[(K, Long, Long, String, Boolean, Seq[V])] =
    triggeredWindowsWith(ds, windowMs, allowedLatenessMs,
      earlyTrigger = if (earlyFireEvery > 0) AfterCount(earlyFireEvery)
                     else NeverCount,
      lateTrigger = AfterCount(lateFireEvery),
      accumulating = accumulating, retractions = retractions)

  /** [[triggeredWindows]] with compositional [[CountTrigger]]s, e.g.
    * `earlyTrigger = AfterFirstOf(AfterCount(100), AfterAllOf(...))`. */
  def triggeredWindowsWith[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], windowMs: Long,
      allowedLatenessMs: Long = 0L,
      earlyTrigger: CountTrigger = NeverCount,
      lateTrigger: CountTrigger = AfterCount(1),
      accumulating: Boolean = false,
      retractions: Boolean = false)(
      implicit stEnc: Encoder[(Seq[V], Long, Long, Boolean, Long)],
      outEnc: Encoder[(K, Long, Long, String, Boolean, Seq[V])]): Dataset[(K, Long, Long, String, Boolean, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new TriggeredWindowProcessor[K, V](windowMs, allowedLatenessMs,
        earlyTrigger, lateTrigger, accumulating, retractions),
      TimeMode.EventTime(), OutputMode.Append())

  /** The trigger/pane state machine over MERGING windows — Beam's
    * ReduceFnRunner (runners/core-java/.../ReduceFnRunner.java:97)
    * running the compound trigger
    * `AfterWatermark.pastEndOfWindow().withEarlyFirings(..).withLateFirings(..)`
    * over `Sessions` (Sessions.java:42,57-66), the interplay SURVEY
    * §7.4 names as Beam's single most intricate behavior. Sessions are
    * per-key gap-merged event-time clusters; each carries its OWN pane
    * state, and when a bridging element merges two sessions their
    * state merges too (Window.java:259-270 accumulation semantics):
    *
    *  - buffers concatenate; counts-since-last-fire SUM; pane index
    *    continues from the furthest part (max); composite trigger
    *    state joins via [[CountTrigger.mergeState]] — an early pane
    *    fired pre-merge keeps its place in the merged lineage
    *  - `fired` (on-time emitted) merges with OR: a merged session one
    *    of whose parts already fired its ON_TIME pane is post-on-time
    *    — subsequent firings are LATE (at most one ON_TIME pane per
    *    session lineage; when fired-ness differs the fired part's
    *    trigger state wins, since the merged session continues under
    *    the late trigger)
    *  - a merged session's later panes can carry an EARLIER
    *    windowStart than its early panes — window identity itself
    *    evolves under merging, exactly Beam's merging-window model
    *
    * EARLY panes fire per `earlyTrigger` before the conceptual Beam
    * watermark passes the session end (= maxTs + gap); the ON_TIME
    * pane fires exactly once when it does (FIRE_ALWAYS — even with
    * nothing new buffered); LATE panes fire per `lateTrigger` for rows
    * within `allowedLatenessMs` beyond that; at end + lateness the
    * session closes with a final pane (isFinal=true) flushing any
    * unfired remainder, and state is GC'd (onGarbageCollection). Pane
    * values are event-time sorted (stable for ties). Accumulating
    * mode re-emits the whole session per pane; discarding emits only
    * values since the previous pane. `retractions=true` (requires
    * accumulating) re-emits the stale pane as a RETRACT before each
    * replacement — and on MERGE retracts each part's last pane under
    * its OWN window start (downstream subtracts the per-window results
    * the merge just invalidated), with the merged lineage starting
    * clean.
    *
    * Watermark mapping as in [[TriggeredWindowProcessor]]: the caller
    * MUST set the upstream watermark delay to `allowedLatenessMs`, so
    * the conceptual Beam watermark = Spark's + lateness; the on-time
    * timer arms at (end − lateness), the GC timer at end, in Spark's
    * domain. `allowedLatenessMs < gapMs` is enforced for the same
    * reason as the fixed-window `lateness < window` constraint: the
    * on-time expiry must land strictly after the session's max element
    * timestamp. Timers whose session end moved (extension or merge)
    * fire as no-ops.
    *
    * Scale: summaries + pane state per OPEN session per key (sessions
    * per key are bounded by the gap structure); the buffer is
    * append-only between panes; all state RocksDB-backed. */
  /** Shared session-pane plumbing for the two merging-window trigger
    * processors ([[TriggeredSessionProcessor]] count-trigger,
    * [[MixedTriggerSessionProcessor]] mixed-clock): the state shape,
    * TreeMap load, pane value ordering, and the four-way
    * gap-connectivity locate/extend/rekey/merge for a new element —
    * parameterized on how slot 5 (composite trigger state vs
    * wall-clock anchor) combines at a merge. A fix to merge semantics
    * lands ONCE here. */
  private[graft] object SessionPanes {
    /** (cuts(tsLo, cutoffPos), countSinceLastFire, paneIndex,
      * onTimeFired, slot5, maxTs, lastFirePos).
      *
      * The row buffer is NOT here: rows live in a per-key APPEND-ONLY
      * log ([[SessionLog]]) and the session state holds only summaries
      * + offsets — Beam's BagState-append shape
      * (runners/core-java/.../ReduceFnRunner.java:97 never rewrites the
      * bag), so a session alive across B micro-batches serializes
      * O(batch) per batch through RocksDB, not O(B·n).
      *
      * `cuts` is the piecewise-constant liveness cutoff over the
      * session's event-time span: a log row (pos, ts) is LIVE for
      * session [min..maxTs] iff min ≤ ts ≤ maxTs and
      * pos ≥ cutoff(cuts, ts). Segments are sorted by tsLo with
      * cuts.head.tsLo == min; one segment is added per downward rekey
      * and per merge part (bounded by merges since the last clear), and
      * a discarding-mode clear collapses them to the single segment
      * (min, currentLogPos). `lastFirePos` = the log position fence of
      * the last EMITTED (un-retracted) pane — the retraction baseline
      * (0 = none): that pane's content is exactly the live rows with
      * pos < lastFirePos, because cutoffs are monotone per ts within a
      * session and appends are monotone in pos. */
    type St = (Seq[(Long, Long)], Long, Long, Boolean, Long, Long, Long)

    /** The WHOLE per-key bookkeeping row (r14 packed-meta layout): log
      * counters (nextPos, total, garbage), the single timer-chain slot,
      * and every open session's summary, sorted by session min ts.
      * Open sessions per key are bounded by the gap structure (disjoint
      * spans > gap apart inside the lateness horizon) and a summary is
      * ~10 numbers, so the row stays small — and packing it means a
      * batch writes ONE ValueState put per touched key instead of
      * logMeta + timer slot + one MapState put per dirty session (+ a
      * removeKey per close): the r13 gap-processor discipline
      * (6× → 1.9× rowsUpdated/event there) applied to the session-pane
      * family. A key whose sessions all closed and whose log compacted
      * empty CLEARS the row — zero resident state for idle keys. */
    type Packed = (Long, Long, Long, Long, Seq[(Long, St)])

    /** V-free state shape → one static encoder, no caller plumbing. */
    val packedEnc: Encoder[Packed] = Encoders.product[Packed]

    /** Liveness cutoff for a row at `ts`: the segment with the
      * greatest tsLo ≤ ts (head's cutoff below the first — defensive;
      * such rows do not arise while the invariant head.tsLo == min
      * holds). Binary search — segments are tsLo-sorted, and a
      * many-merge accumulating session carries one segment per merge
      * part since its last fence collapse. */
    def cutoff(cuts: Seq[(Long, Long)], ts: Long): Long = {
      val cs: IndexedSeq[(Long, Long)] = cuts match {
        case i: IndexedSeq[(Long, Long)] @unchecked => i
        case s => s.toIndexedSeq
      }
      var lo = 0; var hi = cs.length // first segment with tsLo > ts
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cs(mid)._1 <= ts) lo = mid + 1 else hi = mid
      }
      if (lo == 0) cs.head._2 else cs(lo - 1)._2
    }

    /** Collapse adjacent segments carrying the same cutoff — the
      * lookup is piecewise-constant, so a run of equal fences is one
      * segment. Keeps `cuts` at O(distinct live fences) across merge
      * chains whose parts share a fence (e.g. parts cleared at the
      * same compaction). */
    def compact(cuts: Seq[(Long, Long)]): Seq[(Long, Long)] =
      if (cuts.length < 2) cuts
      else {
        val b = Vector.newBuilder[(Long, Long)]
        var last = cuts.head
        b += last
        cuts.iterator.drop(1).foreach { seg =>
          if (seg._2 != last._2) { b += seg; last = seg }
        }
        b.result()
      }

    /** Is log row (pos, ts) live for the session keyed at `min`? */
    def live(min: Long, st: St, pos: Long, ts: Long): Boolean =
      ts >= min && ts <= st._6 && pos >= cutoff(st._1, ts)

    def paneValues[V](buf: Seq[(Long, V)]): Seq[V] =
      buf.sortBy(_._1).map(_._2)

    /** Locate the session for an element at `t` under gap
      * connectivity, mutating `m`: extend the predecessor, move a
      * successor's start down (REKEY), bridge-merge both, or open a
      * singleton. Returns (sessionKey, state-before-append). `nextPos`
      * = the log position the element will be appended at; a new or
      * rekeyed span's cutoff starts there so stale log rows from
      * since-closed sessions in the same ts range can never resurrect.
      *
      * `retract(windowStart, partState)` runs for every pane a
      * window-IDENTITY change invalidates — both parts of a two-sided
      * merge AND the old start of a downward rekey (the session's
      * windowStart changes, so a pane published under the old start
      * must be retracted before panes appear under the new one); the
      * invalidated lineage restarts with lastFirePos = 0. */
    def upsert(m: scala.collection.mutable.TreeMap[Long, St],
        t: Long, gapMs: Long, nextPos: Long,
        combine5: (Boolean, Long, Boolean, Long) => Long,
        retract: (Long, St) => Unit): (Long, St) = {
      val predKey = m.rangeTo(t).lastOption.map(_._1)
      val succKey = m.rangeFrom(t + 1).headOption.map(_._1)
      val joinsPred = predKey.exists(p => t <= m(p)._6 + gapMs)
      val joinsSucc = succKey.exists(s => s - t <= gapMs)
      (joinsPred, joinsSucc) match {
        case (true, true) =>
          val p = predKey.get; val s = succKey.get
          val a = m(p); val b = m(s)
          val (ac, asn, ap, af, a5, amx, _) = a
          val (bc, bsn, bp, bf, b5, bmx, _) = b
          m.remove(s)
          retract(p, a)
          retract(s, b)
          // cuts concatenate in key order (part spans are disjoint,
          // all of a's tsLo < s ≤ b's tsLo) — each part keeps its own
          // liveness fence across the merge; equal adjacent fences
          // collapse, and a log compaction collapses ALL fences to 0
          // (see SessionLog.maybeRewrite), bounding cuts length
          (p, (compact(ac ++ bc), asn + bsn, math.max(ap, bp), af || bf,
            combine5(af, a5, bf, b5), math.max(amx, bmx), 0L))
        case (true, false) =>
          val p = predKey.get
          val (c, sn, pn, f, s5, mx, pl) = m(p)
          (p, (c, sn, pn, f, s5, math.max(mx, t), pl))
        case (false, true) =>
          val s = succKey.get
          val st = m(s)
          m.remove(s) // start moves down to t — new window identity
          retract(s, st)
          (t, st.copy(_1 = (t, nextPos) +: st._1, _7 = 0L))
        case (false, false) =>
          (t, (Seq((t, nextPos)), 0L, 0L, false, 0L, t, 0L))
      }
    }
  }

  /** Per-invocation view over a key's append-only row log — the state
    * half of [[SessionPanes]]. Entries are (pos, ts, value) with
    * monotone virtual positions (a ValueState counter), so cutoffs and
    * pane fences in session summaries survive log rewrites. Appends go
    * straight to the ListState (O(batch) serialization per batch); the
    * full log is READ at most once per invocation (to build the
    * ts-sorted index), and each pane fire/retraction then reads ONLY
    * its session's ts-span through a binary-searched slice — a hot key
    * with many live sessions pays O(its own span) per fire, not
    * O(whole log). `garbage` counts rows dead to every session
    * (discarding-mode clears AND closed sessions — a closed span can
    * never be re-covered: new sessions and downward rekeys fence at
    * the append position, and the gap-separation + lateness-drop
    * arithmetic keeps any live neighbor from ever extending over a
    * closed span, so close-purge is safely lazy); the one O(log)
    * rewrite runs when garbage reaches half the log — classic
    * amortized-O(1)-per-append compaction. */
  private[graft] final class SessionLog[V](
      log: ListState[(Long, Long, V)],
      nextPos0: Long = 0L, total0: Long = 0L, garbage0: Long = 0L) {
    // counters arrive from (and return to) the caller's packed meta
    // row — the log itself persists no scalar state of its own
    var nextPos: Long = nextPos0
    var total: Long = total0
    var garbage: Long = garbage0
    private var cache: scala.collection.mutable.ArrayBuffer[(Long, Long, V)] = null
    // cache[0, baseLen) sorted by (ts, pos); appends after index build
    // land past baseLen and are scanned linearly (O(this batch))
    private var baseSorted: scala.collection.mutable.ArrayBuffer[(Long, Long, V)] = null
    private var baseLen = 0
    // this invocation's appends, persisted by flush() in ONE
    // appendList call: per-row appendValue pays a per-call store
    // overhead that GROWS with the calls already made this batch —
    // the ScaleProbe measured O(batch²) per invocation (a 20k-row
    // batch ~13× slower PER EVENT than a 2k-row batch on identical
    // accumulated state; one appendList restored the 60× loss)
    private val pending = scala.collection.mutable.ArrayBuffer[(Long, Long, V)]()

    def rows(): scala.collection.mutable.ArrayBuffer[(Long, Long, V)] = {
      if (cache == null) {
        cache = scala.collection.mutable.ArrayBuffer[(Long, Long, V)]()
        val it = log.get()
        while (it.hasNext) cache += it.next()
        cache ++= pending // appends made before the first read
      }
      cache
    }

    private def ensureIndex(): Unit = if (baseSorted == null) {
      val r = rows()
      baseLen = r.length
      val b = new scala.collection.mutable.ArrayBuffer[(Long, Long, V)](baseLen)
      var i = 0
      while (i < baseLen) { b += r(i); i += 1 }
      b.sortInPlaceBy(e => (e._2, e._1))
      baseSorted = b
    }

    def append(t: Long, v: V): Unit = {
      val e = (nextPos, t, v)
      pending += e
      if (cache != null) cache += e
      nextPos += 1; total += 1
    }

    /** Persist this invocation's appends — ONE appendList call; must
      * run before the invocation returns (a compaction that already
      * folded them into its rewrite empties `pending` first). */
    def flush(): Unit = if (pending.nonEmpty) {
      log.appendList(pending.toArray)
      pending.clear()
    }

    /** The live rows of the session keyed at `min`, below `beforePos`:
      * a binary-searched slice of the (ts, pos)-sorted index plus this
      * invocation's unindexed appends. Equal-ts rows come out in pos
      * (= arrival) order, so paneValues' stable ts-sort keeps ties
      * stable, as the old in-state buffers did. */
    def content(min: Long, st: SessionPanes.St,
        beforePos: Long = Long.MaxValue): Seq[(Long, V)] = {
      ensureIndex()
      val out = scala.collection.mutable.ArrayBuffer[(Long, V)]()
      var lo = 0; var hi = baseLen // first index with ts >= min
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (baseSorted(mid)._2 < min) lo = mid + 1 else hi = mid
      }
      val mx = st._6
      var i = lo
      while (i < baseLen && baseSorted(i)._2 <= mx) {
        val e = baseSorted(i)
        if (e._1 < beforePos && e._1 >= SessionPanes.cutoff(st._1, e._2))
          out += ((e._2, e._3))
        i += 1
      }
      val c = cache
      var j = baseLen
      while (j < c.length) {
        val e = c(j)
        if (e._1 < beforePos && SessionPanes.live(min, st, e._1, e._2))
          out += ((e._2, e._3))
        j += 1
      }
      out.toSeq
    }

    /** Threshold-driven compaction: rewrite the log keeping only rows
      * live for some open session — when garbage (closed-session and
      * cleared-pane rows; callers account closes via `garbage +=`)
      * reaches half the log, or any session's fence list outgrew
      * `maxCuts` (a long accumulating merge chain). On rewrite, every
      * surviving row is live, so each session's fence list in `m` is
      * COLLAPSED here to the trivial (min, 0) segment — which is what
      * bounds cuts length at O(merges since last compaction), i.e.
      * O(1) amortized. Returns true when it rewrote: the caller must
      * then write back EVERY entry of `m` (the fences changed). */
    def maybeRewrite(m: scala.collection.mutable.TreeMap[Long, SessionPanes.St],
        maxCuts: Int = 32): Boolean = {
      val overflow = m.valuesIterator.exists(_._1.length > maxCuts)
      // the (m.isEmpty && total > 0) arm is defensive: the last close
      // pushes garbage to total anyway, but an undercount must never
      // strand dead rows under an empty session map forever
      if (garbage * 2 < total && !overflow && !(m.isEmpty && total > 0))
        return false
      val keep = rows().filter { case (p, t, _) =>
        m.rangeTo(t).lastOption.exists { case (min, st) =>
          SessionPanes.live(min, st, p, t)
        }
      }
      // rows() includes this invocation's pending appends, so the
      // rewrite persists them too — drop the buffer, then ONE put
      pending.clear()
      if (keep.isEmpty) log.clear() else log.put(keep.toArray)
      cache = keep
      baseSorted = null; baseLen = 0
      total = keep.size.toLong
      garbage = 0L
      m.keys.toSeq.foreach { k => m(k) = m(k).copy(_1 = Seq((k, 0L))) }
      true
    }

    /** Loud detector for a pre-r14 (separate logMeta/MapState layout)
      * checkpoint restore: the caller found NO packed meta row for this
      * key, so the log must be physically empty — rows under an absent
      * meta mean the key's state was written by the r11-r13 layout
      * (sessions2 + logMeta + timer slot), whose summaries restore
      * empty under the renamed variable. Fail fast instead of silently
      * dropping every in-flight session. Cheap: for a genuinely new key
      * the iterator is empty and this is one O(1) probe. */
    def checkFreshLayout(): Unit =
      if (rows().nonEmpty)
        throw new IllegalStateException(
          "session state layout mismatch: row log is non-empty but the " +
            "packed session meta is absent — this checkpoint was written " +
            "by a pre-r14 state layout and cannot be restored; restart " +
            "from a fresh checkpoint")
  }

  class TriggeredSessionProcessor[K, V](gapMs: Long, allowedLatenessMs: Long,
      earlyTrigger: CountTrigger, lateTrigger: CountTrigger,
      accumulating: Boolean, retractions: Boolean = false)(
      implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, java.sql.Timestamp, V), (K, Long, Long, String, Boolean, Seq[V])] {
    require(gapMs > 0 && allowedLatenessMs >= 0)
    require(allowedLatenessMs < gapMs,
      s"allowedLatenessMs ($allowedLatenessMs) must be < gapMs ($gapMs): " +
        "the on-time timer arms at sessionEnd - lateness, which must " +
        "fall strictly after the session's max element timestamp")
    require(!retractions || accumulating,
      "retractions require accumulating mode (a discarding pane has nothing to retract)")

    // per-session pane SUMMARIES, keyed by session MIN ts — see
    // [[SessionPanes.St]]; slot 5 = composite trigger state. Rows live
    // in the per-key append-only [[SessionLog]]; lastFirePos (slot 7)
    // fences the last EMITTED (un-retracted) pane, the retraction
    // baseline. A window-identity change (merge or rekey) retracts the
    // stale panes under their own window starts (downstream must
    // subtract the now-stale per-window results, Beam's
    // accumulatingAndRetractingFiredPanes rule over merging windows)
    // and rebases the lineage to lastFirePos = 0.
    //
    // r14 packed layout ([[SessionPanes.Packed]]): the summaries, the
    // log counters, and the single timer-chain slot all live in ONE
    // ValueState row — one put per touched key per batch, replacing
    // the r11-r13 sessions2 MapState + logMeta + nextTimer trio (one
    // put per DIRTY SESSION per batch plus two scalar puts plus a
    // removeKey per close: the engine's worst remaining write
    // amplifier at ~3.4 state rows/event in the r13 breakdown). The
    // variable is NAMED "panes3" so an r11-r13 checkpoint can never
    // be decoded as the new schema; a renamed variable legally
    // restores EMPTY under state evolution, so emptiness alone is not
    // loud — the paired SessionLog.checkFreshLayout makes it loud for
    // any checkpoint that carried this processor's log (rows under an
    // absent meta are impossible in this layout); a pre-log r9
    // checkpoint degrades to a clean start, documented data loss
    // rather than silent corruption.
    //
    // The timer-chain slot (Packed._4): ONE event-time timer per key,
    // aimed at the earliest pending session need — the fire sweeps
    // EVERY session the watermark has passed (not just the one whose
    // end matched), then re-arms. The r10 layout armed one timer per
    // session end (an `armed` ListState): a session-heavy key paid one
    // fire per closing session per batch, each fire re-reading the
    // session map and rewriting the armed list — O(sessions²) state
    // traffic per batch where this chain pays O(sessions).
    private type SessState = SessionPanes.St
    @transient private var packed: ValueState[SessionPanes.Packed] = _
    @transient private var log: ListState[(Long, Long, V)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      packed = getHandle.getValueState[SessionPanes.Packed]("panes3",
        SessionPanes.packedEnc, TTLConfig.NONE)
      log = getHandle.getListState[(Long, Long, V)]("log",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, vEnc),
        TTLConfig.NONE)
    }

    /** (log view, timer slot, session summaries) off the packed row. */
    private def loadPacked(): (SessionLog[V], Long,
        scala.collection.mutable.TreeMap[Long, SessState]) =
      if (packed.exists()) {
        val (np, tot, gb, slot, ss) = packed.get()
        (new SessionLog[V](log, np, tot, gb), slot,
          scala.collection.mutable.TreeMap.from(ss))
      } else {
        val lv = new SessionLog[V](log)
        lv.checkFreshLayout() // pre-r14 checkpoint → loud, not data loss
        (lv, 0L, scala.collection.mutable.TreeMap.empty)
      }

    /** ONE meta put per touched key per batch — or a full clear when
      * the key went idle (no sessions, compacted-empty log, no timer):
      * zero resident state for dead keys. */
    private def savePacked(lv: SessionLog[V], slot: Long,
        m: scala.collection.mutable.TreeMap[Long, SessState]): Unit =
      if (m.isEmpty && lv.total == 0L && slot == 0L) packed.clear()
      else packed.update((lv.nextPos, lv.total, lv.garbage, slot, m.toSeq))

    private def paneValues(buf: Seq[(Long, V)]): Seq[V] =
      SessionPanes.paneValues(buf)

    /** Re-aim the key's single timer chain at the earliest pending
      * need: (end − lateness) for a not-yet-fired session, end for a
      * fired one awaiting GC. Only ever moves EARLIER — a timer left
      * too early by a since-extended session fires as a cheap no-op
      * and re-arms itself. Returns the new slot value (0 = no timer);
      * `consumed` = the expiry this invocation is firing for, already
      * spent. The slot persists inside the packed meta row. */
    private def armNext(m: scala.collection.mutable.TreeMap[Long, SessState],
        slot: Long, consumed: Long = 0L): Long = {
      val pending = if (slot == consumed) 0L else slot
      if (m.isEmpty) {
        if (pending != 0L) getHandle.deleteTimer(pending)
        return 0L
      }
      val need = m.valuesIterator.map { st =>
        if (!st._4) st._6 + gapMs - allowedLatenessMs
        else st._6 + gapMs
      }.min
      if (pending == 0L || need < pending) {
        if (pending != 0L) getHandle.deleteTimer(pending)
        getHandle.registerTimer(need)
        need
      } else pending
    }

    /** RETRACT pane for a session's last emitted content, if any. */
    private def retractionOf(key: K, skey: Long, st: SessState,
        lv: SessionLog[V],
        out: scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]): Unit =
      if (retractions && st._7 > 0)
        out += ((key, skey, st._3 - 1, "RETRACT", false,
          paneValues(lv.content(skey, st, beforePos = st._7))))

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, V)],
        timers: TimerValues): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      val (lv, slot, m) = loadPacked()
      rows.foreach { case (_, ts, v) =>
        val t = ts.getTime
        // locate/extend/rekey/merge under gap-connectivity — shared
        // with the mixed-clock processor; merge/rekey retract the
        // invalidated panes under their own window starts
        val (skey, st0) = SessionPanes.upsert(m, t, gapMs, lv.nextPos,
          combine5 = (af, a5, bf, b5) => {
            val trig = if (af || bf) lateTrigger else earlyTrigger
            if (af == bf) trig.mergeState(a5, b5)
            else if (af) a5 else b5
          },
          retract = (w, st) => retractionOf(key, w, st, lv, out))
        var (cuts, since, pane, fired, trigSt, mx, lastFire) = st0
        lv.append(t, v)
        since += 1
        val trig = if (fired) lateTrigger else earlyTrigger
        val (fire, nextSt) = trig.onElement(trigSt, since)
        trigSt = nextSt
        if (fire) {
          val stNow = (cuts, since, pane, fired, trigSt, mx, lastFire)
          retractionOf(key, skey, stNow, lv, out)
          val vals = paneValues(lv.content(skey, stNow))
          out += ((key, skey, pane, if (fired) "LATE" else "EARLY", false,
            vals))
          pane += 1; since = 0
          lastFire = lv.nextPos
          if (!accumulating) {
            lv.garbage += vals.size // cleared rows stay in the log, dead
            cuts = Seq((skey, lv.nextPos))
          }
        }
        m(skey) = (cuts, since, pane, fired, trigSt, mx, lastFire)
      }
      lv.maybeRewrite(m) // collapses fences in m itself; m persists below
      lv.flush() // ONE appendList for this batch's rows
      savePacked(lv, armNext(m, slot), m)
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val expiry = timer.getExpiryTimeInMs()
      // sweep by the WATERMARK, not the firing expiry: every session
      // the watermark has passed is equally final, so one fire drains
      // all of them and the chain re-arms at the next future need —
      // identical per-batch output to per-end timers, at one fire
      val cut = math.max(expiry, timers.getCurrentWatermarkInMs())
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      val (lv, slot, m) = loadPacked()
      m.toSeq.foreach { case (min, st0) =>
        var st = st0
        var open = true
        if (!st._4 && st._6 + gapMs - allowedLatenessMs <= cut) {
          // conceptual Beam watermark passed the session end
          val closing = allowedLatenessMs == 0
          retractionOf(key, min, st, lv, out)
          val vals = paneValues(lv.content(min, st))
          out += ((key, min, st._3, "ON_TIME", closing, vals))
          if (closing) {
            m.remove(min); open = false
            lv.garbage += vals.size // closed-span rows purge lazily
          } else {
            val cuts = if (accumulating) st._1
                       else { lv.garbage += vals.size; Seq((min, lv.nextPos)) }
            st = (cuts, 0L, st._3 + 1, true, 0L, st._6, lv.nextPos)
            m(min) = st
          }
        }
        // GC need is (end) in Spark's watermark domain — the upstream
        // delay already embodies the lateness horizon
        if (open && st._4 && st._6 + gapMs <= cut && allowedLatenessMs > 0) {
          // lateness horizon passed: close + GC
          val live = lv.content(min, st)
          if (st._2 > 0) {
            retractionOf(key, min, st, lv, out)
            out += ((key, min, st._3, if (st0._4) "LATE" else "ON_TIME",
              true, paneValues(live)))
          }
          m.remove(min)
          lv.garbage += live.size
        }
        // anything else: the chain fired early (session since
        // extended) — pure no-op, re-armed below
      }
      lv.maybeRewrite(m)
      lv.flush()
      savePacked(lv, armNext(m, slot, consumed = expiry), m)
      out.iterator
    }
  }

  /** Session windows with early/late count firings + pane metadata —
    * see [[TriggeredSessionProcessor]]. `ds` must carry
    * `.withWatermark(tsCol, s"$allowedLatenessMs milliseconds")`.
    * `earlyFireEvery` 0 = no early firings (the default trigger). */
  def triggeredSessions[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], gapMs: Long,
      allowedLatenessMs: Long = 0L, earlyFireEvery: Int = 0,
      lateFireEvery: Int = 1, accumulating: Boolean = false,
      retractions: Boolean = false)(
      implicit outEnc: Encoder[(K, Long, Long, String, Boolean, Seq[V])]): Dataset[(K, Long, Long, String, Boolean, Seq[V])] =
    triggeredSessionsWith(ds, gapMs, allowedLatenessMs,
      earlyTrigger = if (earlyFireEvery > 0) AfterCount(earlyFireEvery)
                     else NeverCount,
      lateTrigger = AfterCount(lateFireEvery),
      accumulating = accumulating, retractions = retractions)

  /** [[triggeredSessions]] with compositional [[CountTrigger]]s. */
  def triggeredSessionsWith[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], gapMs: Long,
      allowedLatenessMs: Long = 0L,
      earlyTrigger: CountTrigger = NeverCount,
      lateTrigger: CountTrigger = AfterCount(1),
      accumulating: Boolean = false,
      retractions: Boolean = false)(
      implicit outEnc: Encoder[(K, Long, Long, String, Boolean, Seq[V])]): Dataset[(K, Long, Long, String, Boolean, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new TriggeredSessionProcessor[K, V](gapMs, allowedLatenessMs,
        earlyTrigger, lateTrigger, accumulating, retractions),
      TimeMode.EventTime(), OutputMode.Append())

  /** Beam's MIXED time-mode compound trigger — the one trigger shape a
    * single-time-mode processor can't express:
    *
    * `AfterWatermark.pastEndOfWindow()                 // event time
    *    .withEarlyFirings(AfterProcessingTime          // WALL CLOCK
    *       .pastFirstElementInPane().plusDelayOf(earlyDelay))
    *    .withLateFirings(AfterProcessingTime
    *       .pastFirstElementInPane().plusDelayOf(lateDelay))`
    * (AfterWatermark.java:60 + AfterProcessingTime.java:39 — Beam's
    * most common production trigger: "emit a preview every N seconds of
    * wall time, the real answer at the watermark, corrections for late
    * data").
    *
    * HOW the two clocks coexist on one `transformWithState` processor:
    * the processor runs in TimeMode.ProcessingTime (wall-clock timers
    * drive early/late panes), while the EVENT-time machinery reads
    * `TimerValues.getCurrentWatermarkInMs()` — Spark propagates the
    * event-time watermark of the upstream `.withWatermark` into every
    * invocation regardless of the processor's own time mode, and (unlike
    * TimeMode.EventTime) the operator applies NO late-row filter, so
    * lateness policy is entirely ours:
    *
    *  - rows land in their event-time fixed window; rows whose
    *    window end + allowedLateness < watermark are dropped — by
    *    WINDOW end, Beam's exact drop rule (TriggeredWindowProcessor
    *    documents its element-time approximation; this processor has
    *    the faithful semantics, and no `lateness < window` restriction)
    *  - EARLY panes: `earlyDelayMs` of wall time after the first
    *    element buffered since the last firing (pastFirstElementInPane
    *    anchoring — later arrivals never push the deadline out)
    *  - ON_TIME pane: fired when the watermark passes the window end
    *    (FIRE_ALWAYS, even if no elements arrived since the last early
    *    pane); observed on the next timer/input invocation after the
    *    watermark advances — a heartbeat timer guarantees one within
    *    `heartbeatMs` even on an idle key
    *  - LATE panes: elements within allowed lateness fire
    *    `lateDelayMs` after the first late element of the pane
    *  - window close at watermark ≥ end + lateness: unfired remainder
    *    flushes as a final pane (isFinal=true), state GC'd
    *  - accumulating / discarding / accumulating-and-retracting modes
    *    as in [[TriggeredWindowProcessor]].
    *
    * Scale: state is one MapState entry per OPEN window per key (bounded
    * by the lateness horizon); each firing drains or snapshots the
    * buffer; timers are O(open windows) per key. RocksDB-backed as the
    * rest of this file. */
  class MixedTriggerWindowProcessor[K, V](
      windowMs: Long, allowedLatenessMs: Long,
      earlyDelayMs: Long, lateDelayMs: Long,
      accumulating: Boolean, retractions: Boolean = false,
      heartbeatMs: Long = 200L, maxSweepLagMs: Long = 5000L)(
      implicit stEnc: Encoder[(Seq[V], Long, Long, Boolean, Long)])
      extends StatefulProcessor[K, (K, java.sql.Timestamp, V), (K, Long, Long, String, Boolean, Seq[V])] {
    require(windowMs > 0 && allowedLatenessMs >= 0)
    require(earlyDelayMs > 0 && lateDelayMs > 0 && heartbeatMs > 0)
    require(maxSweepLagMs >= heartbeatMs)
    require(!retractions || accumulating,
      "retractions require accumulating mode (a discarding pane has nothing to retract)")

    // per-window pane state: (buffer, countSinceLastFire, paneIndex,
    // onTimeFired, anchorDeadlineMs) — anchorDeadline 0 = no pending
    // wall-clock pane; buffer holds the whole window when accumulating,
    // else only values since the previous pane
    @transient private var windows: MapState[Long, (Seq[V], Long, Long, Boolean, Long)] = _
    @transient private var sweepAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      windows = getHandle.getMapState[Long, (Seq[V], Long, Long, Boolean, Long)](
        "windows", Encoders.scalaLong, stEnc, TTLConfig.NONE)
      sweepAt = getHandle.getValueState[Long]("sweepAt",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    /** One sweep-timer chain per key, aimed at the nearest pending
      * event-time need (on-time at window end, GC at end + lateness)
      * mapped to wall clock — same self-pacing estimate as
      * [[MixedTriggerSessionProcessor.armSweep]]; replaces the fixed
      * per-invocation heartbeat that grew one timer chain per input
      * batch. */
    private def armSweep(now: Long, wm: Long): Unit = {
      val pending = if (sweepAt.exists()) sweepAt.get() else 0L
      val it = windows.iterator()
      var need = Long.MaxValue
      // anchor-coinciding timer slots are shared, never deleted — see
      // MixedTriggerSessionProcessor.armSweep
      val anchors = scala.collection.mutable.Set[Long]()
      while (it.hasNext) {
        val (w, st) = it.next()
        if (st._5 != 0L) anchors += st._5
        val n = if (!st._4) w + windowMs else w + windowMs + allowedLatenessMs
        if (n < need) need = n
      }
      if (need == Long.MaxValue) { // no open windows
        if (pending != 0L) { getHandle.deleteTimer(pending); sweepAt.clear() }
        return
      }
      val target = now + math.max(heartbeatMs, math.min(need - wm, maxSweepLagMs))
      if (pending == 0L || pending <= now || target < pending) {
        if (pending > now && !anchors.contains(pending))
          getHandle.deleteTimer(pending)
        if (!anchors.contains(target)) getHandle.registerTimer(target)
        sweepAt.update(target)
      }
    }

    private def openWindows(): Seq[Long] = {
      val it = windows.keys(); val b = scala.collection.mutable.ArrayBuffer[Long]()
      while (it.hasNext) b += it.next()
      b.sorted.toSeq
    }

    private def retractionOf(key: K, buf: Seq[V], since: Long, pane: Long,
        out: scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])],
        w: Long): Unit =
      if (retractions && pane > 0) {
        val prevPane = buf.take(buf.size - since.toInt)
        if (prevPane.nonEmpty) out += ((key, w, pane - 1, "RETRACT", false, prevPane))
      }

    /** Watermark-driven transitions (on-time firing, window close/GC)
      * for every open window; runs before wall-clock pane firing in
      * both handlers so elements pending when the watermark passes the
      * end land in the ON_TIME pane, as in Beam. */
    private def sweep(key: K, wm: Long,
        out: scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]): Unit =
      openWindows().foreach { w =>
        var (buf, since, pane, fired, anchor) = windows.getValue(w)
        var closed = false
        if (!fired && wm >= w + windowMs) {
          retractionOf(key, buf, since, pane, out, w)
          val closing = allowedLatenessMs == 0
          out += ((key, w, pane, "ON_TIME", closing, buf))
          if (closing) { windows.removeKey(w); closed = true }
          else {
            buf = if (accumulating) buf else Seq.empty
            since = 0; pane += 1; fired = true; anchor = 0
            windows.updateValue(w, (buf, since, pane, fired, anchor))
          }
        }
        if (!closed && fired && wm >= w + windowMs + allowedLatenessMs) {
          if (since > 0) {
            retractionOf(key, buf, since, pane, out, w)
            out += ((key, w, pane, "LATE", true, buf))
          }
          windows.removeKey(w)
        }
      }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, V)],
        timers: TimerValues): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val wm = timers.getCurrentWatermarkInMs()
      val now = timers.getCurrentProcessingTimeInMs()
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      // state writes deferred to one per touched window per batch (see
      // TriggeredWindowProcessor.handleInputRows)
      val touched = scala.collection.mutable.Map[Long, (Seq[V], Long, Long, Boolean, Long)]()
      rows.foreach { case (_, ts, v) =>
        val w = Math.floorDiv(ts.getTime, windowMs) * windowMs
        if (wm < w + windowMs + allowedLatenessMs) { // else: expired window, drop
          var (buf, since, pane, fired, anchor) =
            touched.getOrElse(w,
              if (windows.containsKey(w)) windows.getValue(w)
              else (Seq.empty[V], 0L, 0L, false, 0L))
          buf :+= v
          since += 1
          if (anchor == 0L) { // first element of this pane anchors the delay
            anchor = now + (if (fired) lateDelayMs else earlyDelayMs)
            getHandle.registerTimer(anchor)
          }
          touched(w) = (buf, since, pane, fired, anchor)
        }
      }
      touched.foreach { case (w, st) => windows.updateValue(w, st) }
      sweep(key, wm, out)
      // idle-key progress: keep exactly one sweep chain alive so the
      // on-time/GC sweep runs again even with no further input
      armSweep(now, wm)
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val wm = timers.getCurrentWatermarkInMs()
      val now = timers.getCurrentProcessingTimeInMs()
      val expiry = timer.getExpiryTimeInMs()
      if (sweepAt.exists() && sweepAt.get() == expiry) sweepAt.clear()
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      sweep(key, wm, out)
      openWindows().foreach { w =>
        var (buf, since, pane, fired, anchor) = windows.getValue(w)
        if (anchor != 0L && anchor <= expiry && since > 0) {
          retractionOf(key, buf, since, pane, out, w)
          out += ((key, w, pane, if (fired) "LATE" else "EARLY", false, buf))
          if (!accumulating) buf = Seq.empty
          since = 0; pane += 1; anchor = 0
          windows.updateValue(w, (buf, since, pane, fired, anchor))
        }
      }
      armSweep(now, wm)
      out.iterator
    }
  }

  /** Fixed windows with Beam's mixed-clock compound trigger — wall-
    * clock early/late panes inside event-time windows; see
    * [[MixedTriggerWindowProcessor]]. `ds` must carry a watermark on
    * its timestamp column (any delay; the processor reads the
    * watermark but does its own window-end lateness drops).
    *
    * `maxSweepLagMs` is the EMISSION-LATENCY BOUND for on-time/GC
    * panes on idle keys: the sweep chain assumes the watermark
    * advances at wall-clock rate, so in replay/backfill where it
    * outpaces wall time, an idle key's on-time pane can trail the
    * watermark by up to this long (default 5 s). Replay-heavy callers
    * should lower it (at the cost of more sweep ticks). */
  def mixedTriggerWindows[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], windowMs: Long,
      allowedLatenessMs: Long = 0L,
      earlyDelayMs: Long = 1000L, lateDelayMs: Long = 1000L,
      accumulating: Boolean = false, retractions: Boolean = false,
      heartbeatMs: Long = 200L, maxSweepLagMs: Long = 5000L)(
      implicit stEnc: Encoder[(Seq[V], Long, Long, Boolean, Long)],
      outEnc: Encoder[(K, Long, Long, String, Boolean, Seq[V])]): Dataset[(K, Long, Long, String, Boolean, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new MixedTriggerWindowProcessor[K, V](windowMs, allowedLatenessMs,
        earlyDelayMs, lateDelayMs, accumulating, retractions, heartbeatMs,
        maxSweepLagMs),
      TimeMode.ProcessingTime(), OutputMode.Append())

  /** Beam's mixed-clock compound trigger over MERGING windows — the
    * composition of [[MixedTriggerWindowProcessor]] (wall-clock
    * early/late panes inside event-time windows) and
    * [[TriggeredSessionProcessor]] (pane state that merges when
    * sessions merge):
    *
    * `Window.into(Sessions.withGapDuration(gap))
    *    .triggering(AfterWatermark.pastEndOfWindow()
    *      .withEarlyFirings(AfterProcessingTime
    *         .pastFirstElementInPane().plusDelayOf(earlyDelay))
    *      .withLateFirings(...))`
    *
    * Mechanics: runs in TimeMode.ProcessingTime — wall-clock timers
    * drive early/late panes (`pastFirstElementInPane` anchoring: the
    * FIRST element buffered since the last firing sets the deadline;
    * later arrivals never push it out) — while the event-time
    * machinery reads the propagated watermark for on-time/close/GC.
    * No engine late-row filter applies in this mode, so drops happen
    * by the element's proto-window end (ts + gap + lateness < wm),
    * Beam's exact rule. On MERGE: buffers concatenate, counts sum,
    * pane index continues, `fired` ORs, the anchor deadline takes the
    * EARLIEST pending one (a pane already promised keeps its
    * deadline), and with retractions each part's last pane retracts
    * under its own window start (as in [[TriggeredSessionProcessor]]).
    * Session ends move as elements arrive/merge, so on-time/GC are
    * evaluated against the CURRENT end in the sweep rather than a
    * pre-armed end timer — a heartbeat guarantees sweep progress on
    * idle keys, and an idle key (no open sessions) holds zero state
    * and zero timers. */
  class MixedTriggerSessionProcessor[K, V](
      gapMs: Long, allowedLatenessMs: Long,
      earlyDelayMs: Long, lateDelayMs: Long,
      accumulating: Boolean, retractions: Boolean = false,
      heartbeatMs: Long = 200L, maxSweepLagMs: Long = 5000L)(
      implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, java.sql.Timestamp, V), (K, Long, Long, String, Boolean, Seq[V])] {
    require(gapMs > 0 && allowedLatenessMs >= 0)
    require(earlyDelayMs > 0 && lateDelayMs > 0 && heartbeatMs > 0)
    require(maxSweepLagMs >= heartbeatMs)
    require(!retractions || accumulating,
      "retractions require accumulating mode (a discarding pane has nothing to retract)")

    // per-session pane SUMMARIES, keyed by session MIN ts — see
    // [[SessionPanes.St]]; slot 5 = anchorDeadlineMs (0 = no pending
    // wall-clock pane); lastFirePos = the retraction baseline and rows
    // live in the per-key append-only [[SessionLog]], both as in
    // TriggeredSessionProcessor — including the r14 packed layout
    // ([[SessionPanes.Packed]], Packed._4 = the sweep-chain slot): ONE
    // ValueState put per touched key per batch, named "panes3" so an
    // r11-r13 (sessions2 + logMeta + sweepAt) checkpoint can never be
    // decoded as the new schema; SessionLog.checkFreshLayout makes a
    // pre-r14 restore loud (see the TriggeredSessionProcessor note).
    private type SessState = SessionPanes.St
    @transient private var packed: ValueState[SessionPanes.Packed] = _
    @transient private var log: ListState[(Long, Long, V)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      packed = getHandle.getValueState[SessionPanes.Packed]("panes3",
        SessionPanes.packedEnc, TTLConfig.NONE)
      log = getHandle.getListState[(Long, Long, V)]("log",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, vEnc),
        TTLConfig.NONE)
    }

    /** (log view, sweep slot, session summaries) off the packed row. */
    private def loadPacked(): (SessionLog[V], Long,
        scala.collection.mutable.TreeMap[Long, SessState]) =
      if (packed.exists()) {
        val (np, tot, gb, slot, ss) = packed.get()
        (new SessionLog[V](log, np, tot, gb), slot,
          scala.collection.mutable.TreeMap.from(ss))
      } else {
        val lv = new SessionLog[V](log)
        lv.checkFreshLayout() // pre-r14 checkpoint → loud, not data loss
        (lv, 0L, scala.collection.mutable.TreeMap.empty)
      }

    private def savePacked(lv: SessionLog[V], slot: Long,
        m: scala.collection.mutable.TreeMap[Long, SessState]): Unit =
      if (m.isEmpty && lv.total == 0L && slot == 0L) packed.clear()
      else packed.update((lv.nextPos, lv.total, lv.garbage, slot, m.toSeq))

    private def paneValues(buf: Seq[(Long, V)]): Seq[V] =
      SessionPanes.paneValues(buf)

    private def retractionOf(key: K, skey: Long, st: SessState,
        lv: SessionLog[V],
        out: scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]): Unit =
      if (retractions && st._7 > 0)
        out += ((key, skey, st._3 - 1, "RETRACT", false,
          paneValues(lv.content(skey, st, beforePos = st._7))))

    /** Watermark transitions (on-time, close/GC) against each
      * session's CURRENT end; mutates `m` in place, tracking dirty
      * sessions (closed-span rows are accounted as log garbage and
      * purge lazily at the compaction threshold). */
    private def sweep(key: K, wm: Long, lv: SessionLog[V],
        m: scala.collection.mutable.TreeMap[Long, SessState],
        out: scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]): Unit =
      m.keys.toSeq.foreach { min =>
        var st = m(min)
        val (_, _, _, fired0, _, mx, _) = st
        val end = mx + gapMs
        var closed = false
        if (!fired0 && wm >= end) {
          retractionOf(key, min, st, lv, out)
          val closing = allowedLatenessMs == 0
          val vals = paneValues(lv.content(min, st))
          out += ((key, min, st._3, "ON_TIME", closing, vals))
          if (closing) {
            m.remove(min); closed = true
            lv.garbage += vals.size // closed-span rows purge lazily
          } else {
            val cuts = if (accumulating) st._1
                       else { lv.garbage += vals.size; Seq((min, lv.nextPos)) }
            st = (cuts, 0L, st._3 + 1, true, 0L, mx, lv.nextPos)
            m(min) = st
          }
        }
        if (!closed && st._4 && wm >= end + allowedLatenessMs) {
          val live = lv.content(min, st)
          if (st._2 > 0) {
            retractionOf(key, min, st, lv, out)
            out += ((key, min, st._3, "LATE", true, paneValues(live)))
          }
          m.remove(min)
          lv.garbage += live.size
        }
      }

    /** Fire any due wall-clock pane anchors; mutates `m` in place. */
    private def fireDueAnchors(key: K, now: Long, lv: SessionLog[V],
        m: scala.collection.mutable.TreeMap[Long, SessState],
        out: scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]): Unit =
      m.keys.toSeq.foreach { min =>
        val st = m(min)
        val (_, since, pane, fired, anchor, mx, _) = st
        if (anchor != 0L && anchor <= now && since > 0) {
          retractionOf(key, min, st, lv, out)
          val vals = paneValues(lv.content(min, st))
          out += ((key, min, pane, if (fired) "LATE" else "EARLY", false,
            vals))
          val cuts = if (accumulating) st._1
                     else { lv.garbage += vals.size; Seq((min, lv.nextPos)) }
          m(min) = (cuts, 0L, pane + 1, fired, 0L, mx, lv.nextPos)
        }
      }

    /** One sweep-timer chain per key, aimed at the nearest pending
      * event-time need (on-time at end, GC at end + lateness), mapped
      * to the wall clock under the steady-state assumption that the
      * watermark advances at wall rate: delay = clamp(nearestNeed − wm,
      * heartbeatMs, maxSweepLagMs). A stalled watermark self-paces
      * (the deficit stays put, so so does the polling interval); a
      * watermark racing ahead of wall time is observed within
      * maxSweepLagMs; every input batch re-aims the chain at the fresh
      * estimate. Replaces the fixed per-invocation heartbeat that
      * accumulated one timer chain per input batch.
      *
      * Timer-slot sharing: per-key timers are keyed by expiry, so the
      * pending sweep slot can COINCIDE with a session's wall-clock
      * anchor (now + delay). Deleting such a slot would silence the
      * anchor until the next sweep tick — so an anchor-coinciding slot
      * is never deleted, and a target landing on an anchor reuses that
      * timer as the sweep tick (the expiry handler runs the sweep on
      * every firing regardless of which role armed it). */
    private def armSweep(now: Long, wm: Long,
        m: scala.collection.mutable.TreeMap[Long, SessState],
        slot: Long): Long = {
      val pending = slot
      if (m.isEmpty) {
        if (pending != 0L) getHandle.deleteTimer(pending)
        return 0L
      }
      val anchors = m.valuesIterator.map(_._5).filter(_ != 0L).toSet
      val need = m.valuesIterator.map { st =>
        if (!st._4) st._6 + gapMs else st._6 + gapMs + allowedLatenessMs
      }.min
      val target = now + math.max(heartbeatMs, math.min(need - wm, maxSweepLagMs))
      if (pending == 0L || pending <= now || target < pending) {
        if (pending > now && !anchors.contains(pending))
          getHandle.deleteTimer(pending)
        if (!anchors.contains(target)) getHandle.registerTimer(target)
        target
      } else pending
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, V)],
        timers: TimerValues): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val wm = timers.getCurrentWatermarkInMs()
      val now = timers.getCurrentProcessingTimeInMs()
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      val (lv, slot, m) = loadPacked()
      rows.foreach { case (_, ts, v) =>
        val t = ts.getTime
        if (wm < t + gapMs + allowedLatenessMs) { // else: expired proto-window
          val (skey, st0) = SessionPanes.upsert(m, t, gapMs, lv.nextPos,
            combine5 = (_, a5, _, b5) => (a5, b5) match {
              case (0L, x) => x
              case (x, 0L) => x
              case (x, y) => math.min(x, y) // earliest promised pane
            },
            retract = (w, st) => retractionOf(key, w, st, lv, out))
          var (cuts, since, pane, fired, anchor, mx, lastFire) = st0
          lv.append(t, v)
          since += 1
          if (anchor == 0L) { // first element of this pane anchors the delay
            anchor = now + (if (fired) lateDelayMs else earlyDelayMs)
            getHandle.registerTimer(anchor)
          }
          m(skey) = (cuts, since, pane, fired, anchor, mx, lastFire)
        }
      }
      sweep(key, wm, lv, m, out)
      lv.maybeRewrite(m) // collapses fences in m itself; m persists below
      lv.flush() // ONE appendList for this batch's rows
      savePacked(lv, armSweep(now, wm, m, slot), m)
      out.iterator
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Long, Long, String, Boolean, Seq[V])] = {
      val wm = timers.getCurrentWatermarkInMs()
      val now = timers.getCurrentProcessingTimeInMs()
      val expiry = timer.getExpiryTimeInMs()
      val out = scala.collection.mutable.ArrayBuffer[(K, Long, Long, String, Boolean, Seq[V])]()
      val (lv, slot0, m) = loadPacked()
      val slot = if (slot0 == expiry) 0L else slot0 // sweep slot consumed
      sweep(key, wm, lv, m, out)
      fireDueAnchors(key, math.max(now, expiry), lv, m, out)
      lv.maybeRewrite(m)
      lv.flush()
      savePacked(lv, armSweep(now, wm, m, slot), m)
      out.iterator
    }
  }

  /** Session windows with Beam's mixed-clock compound trigger — see
    * [[MixedTriggerSessionProcessor]]. `ds` must carry a watermark on
    * its timestamp column (any delay; the processor reads the
    * watermark but does its own proto-window-end lateness drops).
    *
    * `maxSweepLagMs` bounds on-time/GC emission latency on idle keys
    * when the watermark outpaces wall time (replay/backfill) — see
    * the note on [[mixedTriggerWindows]]. */
  def mixedTriggerSessions[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], gapMs: Long,
      allowedLatenessMs: Long = 0L,
      earlyDelayMs: Long = 1000L, lateDelayMs: Long = 1000L,
      accumulating: Boolean = false, retractions: Boolean = false,
      heartbeatMs: Long = 200L, maxSweepLagMs: Long = 5000L)(
      implicit outEnc: Encoder[(K, Long, Long, String, Boolean, Seq[V])]): Dataset[(K, Long, Long, String, Boolean, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new MixedTriggerSessionProcessor[K, V](gapMs, allowedLatenessMs,
        earlyDelayMs, lateDelayMs, accumulating, retractions, heartbeatMs,
        maxSweepLagMs),
      TimeMode.ProcessingTime(), OutputMode.Append())
}
