package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}

/** Row-pattern matching (SQL MATCH_RECOGNIZE) over keyed, time-sorted
  * data — the one relational operator Spark lacks entirely.
  *
  * Reference: `BeamMatchRel` (extensions/sql/.../rel/BeamMatchRel.java:76)
  * compiles a MATCH_RECOGNIZE pattern into CEP classes (impl/cep/) and
  * runs an NFA (impl/nfa/NFA.java:55) over per-key, timestamp-sorted
  * input. We re-express the same semantics Spark-first: the pattern is a
  * sequence of quantified steps matched by a backtracking regex engine
  * inside `KeyValueGroupedDataset.flatMapSortedGroups` — the runner
  * shuffles once on the key and sort-merges each group (spill-safe,
  * codegen'd sort), and the per-group matcher is a tight JVM loop.
  *
  * Scale: one shuffle on the key; group size is bounded by per-key
  * activity (not dataset size), which is the same contract as Beam's
  * per-key-and-window NFA state. For streaming, the identical matcher
  * runs inside flatMapGroupsWithState on window-closed groups.
  *
  * Semantics implemented (the MATCH_RECOGNIZE core):
  *  - quantifiers `{min,max}` per step (greedy, with backtracking — a
  *    step prefers the longest run that still lets the remainder match);
  *  - AFTER MATCH SKIP PAST LAST ROW (matches never overlap);
  *  - unmatched rows are skipped one at a time (match start slides).
  */
object MatchRecognize {

  /** One quantified pattern step: matches `pred`-satisfying rows
    * between `min` and `max` times (greedy). `Step("A", p)` ≡ `A`,
    * `Step("A", p, 1, Int.MaxValue)` ≡ `A+`, `(0, MaxValue)` ≡ `A*`,
    * `(0, 1)` ≡ `A?`. */
  final case class Step[T](name: String, pred: T => Boolean,
      min: Int = 1, max: Int = 1)

  /** One complete match: the per-key ordinal (1-based, in row order) and
    * the rows captured by each step, in order. */
  final case class Match[K, T](key: K, matchSeq: Long,
      captured: Map[String, Seq[T]])

  /** Backtracking matcher over one key's sorted rows. Greedy: each
    * quantifier tries its longest feasible run first, backing off until
    * the remaining steps match. Returns end-exclusive index on success. */
  private def tryMatch[T](rows: IndexedSeq[T], start: Int,
      steps: Seq[Step[T]]): Option[(Int, Map[String, Seq[T]])] = {

    def go(pos: Int, si: Int,
        acc: List[(String, Seq[T])]): Option[(Int, List[(String, Seq[T])])] = {
      if (si == steps.length) Some((pos, acc))
      else {
        val st = steps(si)
        // longest run of pred-rows available here, capped at max
        var hi = pos
        while (hi < rows.length && (hi - pos) < st.max && st.pred(rows(hi))) hi += 1
        var take = hi - pos
        var res: Option[(Int, List[(String, Seq[T])])] = None
        while (res.isEmpty && take >= st.min) {
          res = go(pos + take, si + 1, (st.name, rows.slice(pos, pos + take)) :: acc)
          take -= 1
        }
        res
      }
    }
    go(start, 0, Nil).map { case (end, acc) =>
      (end, acc.reverse.groupBy(_._1).map { case (n, xs) => n -> xs.flatMap(_._2) })
    }
  }

  /** Run the pattern over one key's already-sorted rows — the reusable
    * core for streaming composition: feed it window-closed groups (e.g.
    * the output of [[graft.streaming.StatefulV2.eventTimeGapFlush]]) to
    * get MATCH_RECOGNIZE over unbounded input, which is exactly Beam's
    * per-key-and-window NFA execution model. */
  def matchRows[K, T, O](key: K, rows: IndexedSeq[T], steps: Seq[Step[T]])(
      measure: Match[K, T] => O): Seq[O] = {
    val out = scala.collection.mutable.ArrayBuffer[O]()
    var pos = 0
    var matchSeq = 1L
    while (pos < rows.length) {
      tryMatch(rows, pos, steps) match {
        case Some((end, captured)) if end > pos =>
          out += measure(Match(key, matchSeq, captured))
          matchSeq += 1
          pos = end // AFTER MATCH SKIP PAST LAST ROW
        case _ =>
          pos += 1
      }
    }
    out.toSeq
  }

  /** Run the pattern over every key group of `ds`, sorted by `sortCols`
    * within the group (Beam's @RequiresTimeSortedInput contract — the
    * sort rides the shuffle via Spark's spill-safe group sort, not an
    * in-memory comparator), and map each match through `measure`.
    *
    * @param sortCols ORDER BY clause of MATCH_RECOGNIZE (e.g. ts, id)
    * @param measure  MEASURES clause: builds the output row from a Match
    */
  def matchRecognize[K: Encoder, T: Encoder, O: Encoder](
      ds: Dataset[T], key: T => K,
      sortCols: Seq[org.apache.spark.sql.Column],
      steps: Seq[Step[T]])(measure: Match[K, T] => O): Dataset[O] = {
    ds.groupByKey(key).flatMapSortedGroups(sortCols: _*) {
      (k: K, it: Iterator[T]) =>
        matchRows(k, it.toIndexedSeq, steps)(measure).iterator
    }
  }
}
