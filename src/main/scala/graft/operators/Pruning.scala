package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Membership-sketch scan pruning: build a bloom filter over a small
  * key set in one partial-agg pass (only sketch bytes cross the
  * exchange), then prune a huge scan with a codegen'd membership test —
  * no join, no shuffle or broadcast hash table on the big side. Zero
  * false negatives by construction; false positives bounded by sizing.
  *
  * This is the user-level form of Spark's internal runtime bloom
  * filter (`spark.sql.optimizer.runtime.bloomFilter.*`), for when the
  * filter must cross a stage/query/job boundary — e.g. built nightly
  * from a dimension table and applied inside a streaming query.
  */
object Pruning {

  /** Bits for a target false-positive rate: the standard
    * m = -n·ln(p)/ln(2)² sizing (public bloom-filter analysis). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    math.ceil(-expectedItems * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
  }

  /** Build the sketch over `keys` (cast to long): one distributed
    * aggregate, collected once as a fit artifact (a few hundred KB for
    * millions of keys at 1% fpp). */
  def bloomFit(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    graft.functions.GraftFunctions.register(keys.sparkSession)
    keys.agg(call_function("bloom_agg", col(keyCol).cast("long"),
        lit(expectedItems), lit(optimalNumBits(expectedItems, fpp)))
      .as("bf")).head().getAs[Array[Byte]]("bf") // bounded: 1-row sketch agg
  }

  /** Membership predicate over a fitted sketch — a plain codegen'd
    * filter expression, usable in batch or streaming plans. */
  def bloomContains(sketch: Array[Byte], key: Column): Column = {
    call_function("bloom_contains", lit(sketch), key.cast("long"))
  }

  /** Prune `df` to rows whose `keyCol` might be in the fitted set
    * (keeps all true members plus ≤ fpp false positives). */
  def bloomPrune(df: DataFrame, keyCol: String,
      sketch: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.filter(bloomContains(sketch, col(keyCol)))
  }
}
