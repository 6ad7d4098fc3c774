package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Asynchronous per-element execution and completion barriers.
  *
  * Reference surface:
  *  - `AsyncWrapper` (sdks/java/core/.../transforms/AsyncWrapper.java:70):
  *    wraps a DoFn so element processing overlaps I/O — bounded
  *    in-flight futures per bundle, results joined before the bundle
  *    finishes.
  *  - `Wait.on` (transforms/Wait.java:79): a barrier making one
  *    PCollection's processing wait for another's completion (per
  *    window) — used to order side effects (e.g. write-then-read).
  *
  * Spark mapping: a bundle IS a partition. [[asyncMap]] runs the user
  * function through a bounded pool of futures inside `mapPartitions` —
  * up to `maxInFlight` elements of the partition overlap their I/O,
  * results emit in INPUT ORDER (Beam's AsyncWrapper contract: output
  * order within a bundle is preserved; completion interleaving is an
  * executor-internal detail). [[Async.waitOn]] forces the signal's
  * materialization before returning the main dataset — Spark's jobs
  * are driver-ordered, so an action on the signal IS the barrier.
  */
object Async {

  /** Apply `fn` with up to `maxInFlight` concurrent evaluations per
    * partition, preserving input order in the output. The sliding
    * window of futures gives async-I/O overlap with bounded memory
    * (never more than `maxInFlight` outstanding results per task).
    * Failures surface as task failures at the offending element, like
    * a synchronous DoFn throw (compose with [[Relational.tryMap]] for
    * dead-lettering). */
  def asyncMap[T, O](ds: Dataset[T], fn: T => O, maxInFlight: Int = 8)(
      implicit enc: Encoder[O]): Dataset[O] = {
    require(maxInFlight >= 1)
    ds.mapPartitions { rows =>
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      // per-task pool: DoFn.setup; shut down by a completion listener
      val pool = java.util.concurrent.Executors.newFixedThreadPool(maxInFlight)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdown()))
      val inFlight = scala.collection.mutable.Queue.empty[Future[O]]
      new Iterator[O] {
        private def fill(): Unit =
          while (inFlight.size < maxInFlight && rows.hasNext) {
            val t = rows.next()
            inFlight.enqueue(Future(fn(t)))
          }
        override def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        override def next(): O = {
          fill()
          Await.result(inFlight.dequeue(), Duration.Inf)
        }
      }
    }
  }

  /** Beam `Wait.on`: return `main` only after `signals` fully
    * materialize — the driver-side barrier that orders side effects
    * (Spark actions run sequentially from the driver, so forcing the
    * signal datasets IS Beam's wait-for-window-close in batch; in
    * streaming, use `StreamingQuery.awaitTermination`/`processAllAvailable`
    * between queries instead). */
  def waitOn[T](main: Dataset[T], signals: Dataset[_]*): Dataset[T] = {
    signals.foreach(_.count())
    main
  }
}
