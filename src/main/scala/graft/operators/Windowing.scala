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
}
