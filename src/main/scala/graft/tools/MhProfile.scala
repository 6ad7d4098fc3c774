package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
import graft.sources.Tables

object MhProfile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[mh] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    val full = Dedup.minHashCandidates(docs, "doc_id", "text", 16, 4)
    t("analyze")(full.queryExecution.analyzed)
    t("optimize")(full.queryExecution.optimizedPlan)
    t("physical plan")(full.queryExecution.executedPlan)
    t("execute")(full.count())
    t("execute warm")(Dedup.minHashCandidates(docs, "doc_id", "text", 16, 4).count())
    spark.stop()
  }
}
