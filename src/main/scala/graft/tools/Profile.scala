package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler: time arbitrary registry queries or plan
  * fragments at a given sf dir. Usage:
  *   sbt "runMain graft.tools.Profile <sfDir> <queryName>..."
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("GRAFT_PROFILE_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/JIT/parquet-reader init so per-query "cold" times
    // measure plan compile + execution, not JVM warmup
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val all = graft.SparkEntry.queries
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = all(n)(spark, sfDir).count()
      val t1 = System.nanoTime()
      // second run: warm caches / JIT
      val cnt2 = all(n)(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"[profile] $n%-28s rows=$cnt%-8d cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
