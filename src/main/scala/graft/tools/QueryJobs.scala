package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job / per-stage wall breakdown of a registry query (dev-only):
  * runs each named query twice and prints rep-2 (warm) job walls.
  * Usage: sbt "runMain graft.tools.QueryJobs <sfDir> <query>..." */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("GRAFT_PROFILE_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val sb = new StringBuilder
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (record) {
        val t0 = jobStart.getOrDefault(je.jobId, 0L)
        sb.synchronized {
          sb.append(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3fs%n")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val wall = (si.completionTime.getOrElse(0L) -
            si.submissionTime.getOrElse(0L)) / 1e3
          if (wall > 0.15) sb.synchronized {
            val tm = si.taskMetrics
            sb.append(f"  [stage] ${si.stageId}%3d $wall%7.3fs tasks=${si.numTasks} " +
              f"cpu=${tm.executorCpuTime / 1e9}%.2f ${si.name.take(70)}%n")
          }
        }
    })
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val all = graft.SparkEntry.queries
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      all(n)(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      record = true; sb.setLength(0)
      val t1 = System.nanoTime()
      all(n)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      record = false
      println(f"===== $n cold=$cold%.3f warm=$warm%.3f =====")
      print(sb.toString)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
