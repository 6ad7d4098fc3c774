package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** User-facing CombineFn facade — Beam's user-aggregation contract on
  * Spark's `Aggregator[IN, BUF, OUT]`.
  *
  * Reference: `CombineFn` (sdks/java/core/.../transforms/Combine.java:88
  * — createAccumulator / addInput / mergeAccumulators / extractOutput)
  * maps 1:1 onto `Aggregator.zero / reduce / merge / finish`; the SQL
  * registration path mirrors Beam SQL's `UdafImpl`
  * (extensions/sql/.../impl/UdafImpl.java), which wraps a user CombineFn
  * as a Calcite aggregate — here `spark.udf.register(functions.udaf(...))`
  * wraps the Aggregator as a Catalyst aggregate usable from SQL text.
  *
  * Scale: an Aggregator runs as a partial-then-final hash aggregation —
  * per-partition combine before the exchange, merge after — identical
  * exchange volume to Beam's lifted CombineFn (one BUF per key per
  * partition crosses the wire).
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    (b._1 + math.log(a), b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object UserAggregators {
  /** Register the demo user aggregates for SQL-text use (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("geo_mean",
      org.apache.spark.sql.functions.udaf(GeoMean))
}
