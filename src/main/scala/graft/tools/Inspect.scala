package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Dev-only: print schemas as Spark sees them. */
object Inspect {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings")) {
      println(s"=== $t")
      try {
        val df = Tables.load(spark, d, t)
        df.printSchema()
        df.show(3, truncate = 60)
      } catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    println("=== events via Tables.events")
    try { val e = Tables.events(spark, d); e.printSchema(); e.show(3) }
    catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    spark.stop()
  }
}
