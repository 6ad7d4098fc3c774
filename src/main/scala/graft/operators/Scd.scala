package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build — the CDC/warehouse
  * "dimension ingestion" shape: a per-key attribute change stream is
  * compressed to its change points, each carrying [valid_from,
  * valid_to) and an is_current flag.
  *
  * Reference semantics: the reference ecosystem expresses this with
  * per-key stateful logic (state API + timers,
  * sdks/java/core/src/main/java/org/apache/beam/sdk/state/State.java);
  * Spark-first it is two window passes sharing ONE hash partitioning
  * on the key — a single shuffle, no state store in batch. The
  * streaming form applies the SAME compression per micro-batch over
  * (the touched keys' existing change points ∪ the new rows) — a
  * Delta/Iceberg MERGE at warehouse scale; see StreamingSpec's
  * CDC-apply test. Compression is idempotent over already-compressed
  * prefixes as long as delivery respects (ts, tie) order per key (the
  * CDC-log commit-order contract), so incremental == full rebuild.
  */
object Scd {

  /** Collapse consecutive identical `state` values per `key` (ordered
    * by (`ts`, `tie`) — the tie column makes same-timestamp change
    * sequences deterministic); each surviving change row gains
    * valid_to = next change's `ts` (NULL = still current) and an
    * is_current flag. Input columns pass through.
    */
  def history(df: DataFrame, key: String, state: String, ts: String,
      tie: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(tie).asc)
    df.withColumn("prev_state", lag(col(state), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col(state))
      .drop("prev_state")
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
  }

  /** One CDC micro-batch applied to the stored change points: keys
    * absent from `batch` pass through untouched (left-anti); touched
    * keys re-compress their existing change points together with the
    * new rows (left-semi ∪ batch). Only touched keys shuffle — at
    * warehouse scale this is the MERGE working set, O(batch keys), not
    * O(dimension). Returns the updated change-point set (same columns
    * as `batch`); read the serving view with [[history]].
    */
  def applyCdcBatch(store: DataFrame, batch: DataFrame, key: String,
      state: String, ts: String, tie: String): DataFrame = {
    val cols = batch.columns.map(col).toSeq
    val touched = batch.select(key).distinct()
    val untouched = store.join(touched, Seq(key), "left_anti")
    val rebuilt = history(
      store.join(touched, Seq(key), "left_semi").unionByName(batch),
      key, state, ts, tie)
    untouched.unionByName(rebuilt.select(cols: _*))
  }
}
