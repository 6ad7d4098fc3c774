package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key stateful processing — the Spark expression of Beam's
  * State/Timer API (SURVEY §2.10).
  *
  * Reference surface: DoFn `@StateId`/`@TimerId`
  * (sdks/java/core/.../transforms/DoFn.java:516,561),
  * ValueState/BagState/CombiningState (state/ValueState.java:27,
  * BagState.java:31, CombiningState.java:34), GroupIntoBatches
  * (transforms/GroupIntoBatches.java:108), ordered processing
  * (extensions/ordered/.../OrderedEventProcessor.java).
  *
  * Implementation: `flatMapGroupsWithState` — per-key durable state in
  * the state store plus a timeout callback, which covers Beam's
  * value/bag state + one timer. The state store is partitioned by the
  * grouping key, so state scales horizontally with executors and is
  * checkpointed per micro-batch — the same fault-tolerance contract as
  * Beam's runner-managed state. Works identically over batch Datasets
  * (state spans the whole group; timeouts never fire) — matching Beam's
  * bounded/unbounded unification.
  */
object Stateful {

  /** Beam GroupIntoBatches: emit batches of `maxSize` elements per key,
    * flushing the remainder on timeout (streaming) or end-of-group
    * (batch). Returns (key, batch) pairs.
    *
    * Why state: element counts must survive micro-batch boundaries; the
    * buffered elements live in the store until size or timeout flush —
    * exactly Beam's BagState + count ValueState + flush timer design.
    */
  def groupIntoBatches[K: Encoder, V: Encoder](
      ds: Dataset[(K, V)], maxSize: Int,
      flushTimeoutMs: Long = -1L)(
      implicit kvE: Encoder[(K, Seq[V])],
      sE: Encoder[Seq[V]]): Dataset[(K, Seq[V])] = {

    val isStreamingMode = ds.isStreaming // captured: Datasets must not enter closures
    val timeoutConf =
      if (flushTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def fn(key: K, rows: Iterator[(K, V)],
        state: GroupState[Seq[V]]): Iterator[(K, Seq[V])] = {
      if (rows.isEmpty && state.hasTimedOut) {
        // timer fired: flush the partial batch
        val pending = state.getOption.getOrElse(Seq.empty)
        state.remove()
        if (pending.nonEmpty) Iterator((key, pending)) else Iterator.empty
      } else {
        val buf = scala.collection.mutable.ArrayBuffer[V]()
        buf ++= state.getOption.getOrElse(Seq.empty)
        val out = scala.collection.mutable.ArrayBuffer[(K, Seq[V])]()
        rows.foreach { case (_, v) =>
          buf += v
          if (buf.size >= maxSize) { out += ((key, buf.toSeq)); buf.clear() }
        }
        if (buf.isEmpty) state.remove()
        else {
          state.update(buf.toSeq)
          if (flushTimeoutMs > 0) state.setTimeoutDuration(flushTimeoutMs)
        }
        // batch datasets see the whole group at once: flush remainder
        if (!isStreamingMode && buf.nonEmpty) { out += ((key, buf.toSeq)); state.remove() }
        out.iterator
      }
    }

    ds.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf)(fn)
  }

  /** General stateful map — the `@StateId` ValueState pattern: thread a
    * user accumulator through each key's elements, emitting zero or more
    * outputs per element. `onTimeout` handles Beam's event/processing
    * timer by mapping it to a state-timeout flush.
    */
  def statefulFlatMap[K: Encoder, V: Encoder, S: Encoder, O: Encoder](
      ds: Dataset[(K, V)],
      init: S,
      process: (K, V, S) => (S, Iterator[O]),
      onTimeout: (K, S) => Iterator[O] = (_: K, _: S) => Iterator.empty[O],
      timeoutMs: Long = -1L): Dataset[O] = {

    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def fn(key: K, rows: Iterator[(K, V)], state: GroupState[S]): Iterator[O] = {
      if (rows.isEmpty && state.hasTimedOut) {
        val s = state.getOption.getOrElse(init)
        state.remove()
        onTimeout(key, s)
      } else {
        var s = state.getOption.getOrElse(init)
        val out = scala.collection.mutable.ArrayBuffer[O]()
        rows.foreach { case (_, v) =>
          val (s2, emitted) = process(key, v, s)
          s = s2
          out ++= emitted
        }
        state.update(s)
        if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
        out.iterator
      }
    }

    ds.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf)(fn)
  }

  /** Ordered per-key processing (extensions/ordered/): buffer
    * out-of-sequence events per key, release contiguous runs in
    * sequence-number order. Events arriving before their predecessor
    * wait in state; duplicates of already-emitted sequence numbers drop.
    */
  /** @param staleTimeoutMs when > 0, a processing-time timeout fires for
    *   keys with no arrivals for this long: permanently-gapped sequences
    *   are force-flushed in order (skipping the gap), then a tombstone
    *   (advanced nextSeq, empty buffer) holds for one more timeout
    *   period so late duplicates of flushed seqs still drop; a second
    *   idle timeout drops the state entirely — bounding the store for
    *   quiescent keys, like Beam's ordered-processing status/TTL
    *   handling. Exactly-once dedup of emitted seqs therefore holds
    *   until one full idle timeout beyond the flush. <= 0 keeps state
    *   forever (batch, or callers managing lifecycle themselves). */
  def processInOrder[K: Encoder, V: Encoder](
      ds: Dataset[(K, Long, V)],
      staleTimeoutMs: Long = -1L)(
      implicit oE: Encoder[(K, Long, V)],
      sE: Encoder[(Long, Map[Long, V])]): Dataset[(K, Long, V)] = {

    val timeoutConf =
      if (staleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    def fn(key: K, rows: Iterator[(K, Long, V)],
        state: GroupState[(Long, Map[Long, V])]): Iterator[(K, Long, V)] = {
      if (rows.isEmpty && state.hasTimedOut) {
        // stale key: flush whatever is buffered, in sequence order
        // (acknowledging the gap will never fill). A TOMBSTONE — the
        // advanced nextSeq with an empty buffer — survives one more
        // timeout period, so duplicates of already-emitted or
        // force-flushed sequence numbers still drop after the flush;
        // only a second fully-idle timeout removes the key's state.
        val (nextSeq, pending) = state.getOption.getOrElse((0L, Map.empty[Long, V]))
        if (pending.isEmpty) {
          state.remove()
          Iterator.empty
        } else {
          val flushed = pending.toSeq.sortBy(_._1)
          state.update((flushed.last._1 + 1, Map.empty[Long, V]))
          state.setTimeoutDuration(staleTimeoutMs)
          flushed.iterator.map { case (seq, v) => (key, seq, v) }
        }
      } else {
        var (nextSeq, pending) = state.getOption.getOrElse((0L, Map.empty[Long, V]))
        val out = scala.collection.mutable.ArrayBuffer[(K, Long, V)]()
        rows.foreach { case (_, seq, v) =>
          if (seq >= nextSeq) pending += (seq -> v)
          while (pending.contains(nextSeq)) {
            out += ((key, nextSeq, pending(nextSeq)))
            pending -= nextSeq
            nextSeq += 1
          }
        }
        // state survives while the key is active (nextSeq guards against
        // re-emitting duplicates); only the timeout path drops it.
        state.update((nextSeq, pending))
        if (staleTimeoutMs > 0) state.setTimeoutDuration(staleTimeoutMs)
        out.iterator
      }
    }

    ds.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf)(fn)
  }
}
