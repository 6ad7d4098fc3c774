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
    // GRAFT_EXPLAIN_EXEC=1: run the query first so the printed plan is
    // the FINAL adaptive plan (isFinalPlan=true) — AQE join-strategy
    // switches, AQEShuffleReads and runtime stage reuse are invisible
    // in the pre-execution plan.
    val exec = sys.env.getOrElse("GRAFT_EXPLAIN_EXEC", "0") == "1"
    args.drop(1).foreach { n =>
      println(s"========== $n ==========")
      val df = all(n)(spark, sfDir)
      // executeCollect() drives df's OWN AdaptiveSparkPlanExec to its
      // final form (a separate count()/write action plans a different
      // query execution and leaves this one isFinalPlan=false)
      if (exec) {
        try df.queryExecution.executedPlan.executeCollect()
        catch { case _: Throwable => () }
      }
      df.explain("formatted")
    }
    spark.stop()
  }
}
