package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver-generated star schema
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * Mirrors the role of beam's `ParquetIO`
  * (reference: sdks/java/io/parquet/.../ParquetIO.java:245) — but on
  * Spark the DataSource V2 parquet reader already provides predicate
  * pushdown, column pruning and partition planning, so these are thin
  * wrappers that only normalize types.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** Parquet files written without the UTC-adjusted flag (pandas/arrow
    * default) surface as TIMESTAMP_NTZ on Spark ≥3.4 when
    * `spark.sql.parquet.inferTimestampNTZ.enabled` is on (the default).
    * Event-time ops (`unix_micros`, `withWatermark`, `window`) require
    * TIMESTAMP_LTZ, so normalize every NTZ column to TimestampType —
    * with the UTC session this engine pins everywhere, the cast is
    * value-preserving (wall-clock == epoch), and the DuckDB oracle
    * reads the same naive micros. Defensive even though our own
    * sessions also disable the inference conf: the driver's smoke-check
    * session is not ours to configure. */
  def normalizeNtz(df: DataFrame): DataFrame = {
    val hasNtz = df.schema.fields.exists(_.dataType == TimestampNTZType)
    if (!hasNtz) df
    else df.select(df.schema.fields.map { f =>
      if (f.dataType == TimestampNTZType) col(f.name).cast(TimestampType).as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events` is written with parquet TIMESTAMP(NANOS) which Spark's
    * vectorized reader surfaces as either TimestampType or (with the
    * legacy flag) LongType nanos; normalize to micros TimestampType so
    * downstream event-time ops (`withWatermark`, `window`) are uniform.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Parquet TIMESTAMP(NANOS) is not directly readable; read as long
    // nanos (legacy flag is runtime-settable) and downcast to micros.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // integer division: `/` would be double division, which at
        // epoch-nanos magnitude (~1.7e18, ulp=256ns) truncates to the
        // wrong microsecond for ~1.5% of rows.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
