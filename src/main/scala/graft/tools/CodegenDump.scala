package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dump whole-stage codegen source sizes for a registry query, to find
  * Janino-compile hot spots. Usage:
  *   sbt "runMain graft.tools.CodegenDump <sfDir> <queryName>"
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val stages = df.queryExecution.debug.codegenToSeq()
    val t1 = System.nanoTime()
    println(f"[codegen] ${stages.size} stages, generation took ${(t1 - t0) / 1e9}%.1fs")
    stages.sortBy(-_._2.length).foreach { case (subtree, code, _) =>
      println(f"[codegen] ${code.length}%9d chars :: ${subtree.linesIterator.next().take(120)}")
    }
    spark.stop()
  }
}
