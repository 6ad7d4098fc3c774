package graft.operators

import org.apache.spark.sql.{Column, DataFrame, RelationalGroupedDataset}
import org.apache.spark.sql.functions._

/** Event-time windowing helpers — Beam's windowing strategies mapped to
  * Spark's native `window()` / `session_window()` (SURVEY §2.10).
  *
  * Reference semantics:
  *  - FixedWindows  (windowing/FixedWindows.java:38)   → tumbling
  *  - SlidingWindows (windowing/SlidingWindows.java:42) → hopping
  *  - Sessions      (windowing/Sessions.java:42)        → session_window
  *  - CalendarWindows (windowing/CalendarWindows.java:47) → date_trunc keys
  *
  * The same expressions work on batch and streaming DataFrames —
  * matching Beam's bounded/unbounded unification. For streaming, add
  * `withWatermark` before grouping (allowed lateness ≈ watermark delay).
  */
object Windowing {

  /** Tumbling (fixed) windows of `duration`, e.g. "1 hour". */
  def tumbling(df: DataFrame, tsCol: String, duration: String,
      keys: Column*): RelationalGroupedDataset =
    df.groupBy(window(col(tsCol), duration) +: keys: _*)

  /** Tumbling windows with a shifted origin — Beam's
    * `FixedWindows.withOffset` (windowing/FixedWindows.java:60) /
    * `SlidingWindows.withOffset` (windowing/SlidingWindows.java:82):
    * boundaries land at epoch-multiples of `duration` PLUS `offset`
    * (e.g. hourly windows starting at :15). Spark's `window()` takes
    * the same origin shift as its 4th `startTime` argument. */
  def tumblingOffset(df: DataFrame, tsCol: String, duration: String,
      offset: String, keys: Column*): RelationalGroupedDataset =
    df.groupBy(window(col(tsCol), duration, duration, offset) +: keys: _*)

  /** Hopping (sliding) windows: each element lands in size/slide windows. */
  def sliding(df: DataFrame, tsCol: String, size: String, slide: String,
      keys: Column*): RelationalGroupedDataset =
    df.groupBy(window(col(tsCol), size, slide) +: keys: _*)

  /** Session windows with a static gap; per-key merge semantics match
    * Beam's Sessions/MergeOverlappingIntervalWindows. */
  def sessions(df: DataFrame, tsCol: String, gap: String,
      keys: Column*): RelationalGroupedDataset =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*)

  /** Calendar windows (months/years are variable-length; `window()` can't
    * express them) — group by `date_trunc` of the unit instead. */
  def calendar(df: DataFrame, tsCol: String, unit: String,
      keys: Column*): RelationalGroupedDataset =
    df.groupBy(date_trunc(unit, col(tsCol)).as("window_start") +: keys: _*)

  /** Epoch-seconds of a window-struct start/end — engine-portable output
    * (avoids cross-engine timezone/precision drift in golden tests). */
  def windowStartSec(windowCol: Column): Column =
    unix_timestamp(windowCol.getField("start"))
  def windowEndSec(windowCol: Column): Column =
    unix_timestamp(windowCol.getField("end"))

  /** Beam TimestampCombiner (windowing/TimestampCombiner.java): the
    * OUTPUT timestamp of a windowed aggregate. `END_OF_WINDOW` (Beam's
    * default) is the window-struct end; `EARLIEST`/`LATEST` are the
    * min/max input event time, computed as one extra agg column in the
    * same pass (zero additional shuffles). Usage:
    * `tumbling(df, "ts", "1 hour").agg(outputTimestamp(Latest, "ts")
    * +: aggs: _*)`. */
  sealed trait TimestampCombiner
  case object EndOfWindow extends TimestampCombiner
  case object Earliest extends TimestampCombiner
  case object Latest extends TimestampCombiner
  def outputTimestamp(mode: TimestampCombiner, tsCol: String,
      windowCol: Column = col("window")): Column = (mode match {
    case EndOfWindow => windowCol.getField("end")
    case Earliest => min(col(tsCol))
    case Latest => max(col(tsCol))
  }).as("output_ts")

  /** CUSTOM MERGING WindowFn (windowing/WindowFn.java `mergeWindows` /
    * `MergeOverlappingIntervalWindows` — the general contract behind
    * Sessions): each row carries its OWN interval [startCol, endCol)
    * (any per-row window assignment — variable gaps, data-dependent
    * spans); overlapping or touching intervals per key MERGE into one
    * window. Returns one row per merged window with
    * (key, win_start, win_end, n_rows).
    *
    * Declarative gaps-and-islands: one shuffle on the key, a running
    * cumulative max of window ends in (start, end) order marks where a
    * new island begins (start > max end so far), a running sum of those
    * marks is the merged-window id. Same plan shape as Catalyst's own
    * session_window rewrite — sort-based merge after a single exchange,
    * no per-row state, spill-safe at 100 TB. */
  def mergeIntervals(df: DataFrame, keys: Seq[Column], startCol: Column,
      endCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(startCol.asc, endCol.asc)
    val prevMaxEnd = max(endCol)
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val marked = df
      .withColumn("__new_win",
        when(prevMaxEnd.isNull || startCol > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__win_id",
        sum(col("__new_win")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    marked.groupBy(keys :+ col("__win_id"): _*)
      .agg(min(startCol).as("win_start"), max(endCol).as("win_end"),
        count(lit(1)).as("n_rows"))
      .drop("__win_id")
  }
}
