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
      var n = if (cnt.exists()) cnt.get() else 0L
      var sizeFlushed = false
      rows.foreach { case (_, v) =>
        buf.appendValue(v)
        n += 1
        if (n >= maxSize) {
          out += ((key, buf.get().toSeq))
          buf.clear(); n = 0
          sizeFlushed = true
        }
      }
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

  /** Beam's event-time timer (`@TimerId` in TimeDomain.EVENT_TIME — the
    * domain Beam windows/GC run on): buffer values per key, register a
    * timer at (max seen event time + gapMs), re-arming as later events
    * arrive; when the WATERMARK passes the timer, flush the buffer as
    * one batch. This is ReduceFnRunner's end-of-window firing rebuilt
    * on transformWithState — a custom session-ish window with the
    * default (AfterWatermark.pastEndOfWindow) trigger.
    *
    * Input (key, eventTime, value); output (key, flushedValues). */
  class EventTimeGapFlushProcessor[K, V](gapMs: Long)(
      implicit vEnc: Encoder[V])
      extends StatefulProcessor[K, (K, java.sql.Timestamp, V), (K, Seq[V])] {

    @transient private var buf: ListState[V] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[V]("buf", vEnc, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: K,
        rows: Iterator[(K, java.sql.Timestamp, V)],
        timers: TimerValues): Iterator[(K, Seq[V])] = {
      var maxTs = if (armed.exists()) armed.get() - gapMs else Long.MinValue
      rows.foreach { case (_, ts, v) =>
        buf.appendValue(v)
        if (ts.getTime > maxTs) maxTs = ts.getTime
      }
      // re-arm: drop the previous event-time timer, set end-of-gap
      if (armed.exists()) getHandle.deleteTimer(armed.get())
      val fireAt = maxTs + gapMs
      getHandle.registerTimer(fireAt)
      armed.update(fireAt)
      Iterator.empty
    }

    override def handleExpiredTimer(key: K, timers: TimerValues,
        timer: ExpiredTimerInfo): Iterator[(K, Seq[V])] = {
      val pending = buf.get().toSeq
      buf.clear(); armed.clear()
      if (pending.nonEmpty) Iterator((key, pending)) else Iterator.empty
    }
  }

  /** Gap-flush on the event-time watermark: values buffer per key and
    * emit as one batch when the watermark passes last-event + gap.
    * `ds` must carry a watermark on its timestamp column
    * (`.withWatermark("_2", …)` upstream — EventTime mode requires it). */
  def eventTimeGapFlush[K: Encoder, V: Encoder](
      ds: Dataset[(K, java.sql.Timestamp, V)], gapMs: Long)(
      implicit outEnc: Encoder[(K, Seq[V])]): Dataset[(K, Seq[V])] =
    ds.groupByKey(_._1).transformWithState(
      new EventTimeGapFlushProcessor[K, V](gapMs),
      TimeMode.EventTime(), OutputMode.Append())
}
