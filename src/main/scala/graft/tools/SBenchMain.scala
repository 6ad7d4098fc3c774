package graft.tools
import org.apache.spark.sql.SparkSession
object SBenchMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // mirror Bench.main's tuned streaming section (r18: numRowsTotal
      // bookkeeping costs a point-get per put — see GlobalProfile)
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        sys.env.getOrElse("SPARK_GRAFT_TRACK_ROWS", "false"))
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.StatefulV2.RocksDbProvider)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.StreamingBench.run(spark, sfDir).foreach { case (n, eps, b) =>
      println(f"SBENCH $n%-34s ${eps}%.1f events/s  ${b.json}")
    }
    spark.stop()
  }
}
