package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All operator coverage lives in graft.queries.Registry; this object is
  * the stable façade the driver invokes.
  */
object SparkEntry {
  /** Flagship query on sf0.001; driver smoke-checks rows>0. The
    * composed curation pipeline (quality filter → language filter →
    * exact dedup → near-dup cluster canonicals) exercises text
    * analysis, fingerprinting, MinHash-LSH, and connected components
    * in one pass. */
  def entry(spark: SparkSession): DataFrame =
    queries("pipeline_curation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate sketches, LSH) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
