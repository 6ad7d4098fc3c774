package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Builders for the degenerate testdata variants the robustness sweeps
  * run against (one definition — EmptyProbe and RegistrySpec both call
  * these, so the per-round sweep and the CI guard cannot silently
  * diverge in coverage). */
object DegenerateTables {

  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** `events` carries parquet TIMESTAMP(NANOS); set before reading. */
  def enableNanos(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Schema-identical empty copies (the empty-partition case). */
  def writeEmpty(spark: SparkSession, src: String, dst: String): Unit =
    for (t <- tables)
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

  /** Single-row copies (n=1 fits: zero stddev/MAD/range paths). */
  def writeSingleRow(spark: SparkSession, src: String, dst: String): Unit =
    for (t <- tables)
      spark.read.parquet(s"$src/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

  /** Every string column nulled on ~1/3 of rows (dirty-corpus case;
    * numeric keys stay intact). */
  def writeNullInjected(spark: SparkSession, src: String, dst: String): Unit =
    for (t <- tables) {
      var df = spark.read.parquet(s"$src/$t.parquet")
      for (f <- df.schema.fields if f.dataType == StringType)
        df = df.withColumn(f.name,
          when(abs(hash(col(f.name))) % 3 === 0, lit(null: String))
            .otherwise(col(f.name)))
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
}
