package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of registry queries.
  * Usage: sbt "runMain graft.tools.Explain <sfDir> <queryName>..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    args.drop(1).foreach { n =>
      println(s"========== $n ==========")
      all(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
