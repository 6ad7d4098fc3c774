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
    spark.read.parquet(s"$dir/$name.parquet")

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
