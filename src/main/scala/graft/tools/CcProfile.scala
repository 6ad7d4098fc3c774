package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the connected-components queries.
  * Usage: sbt "runMain graft.tools.CcProfile [sfDir]" */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[cc] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // warmup io
    docs.count()
    (1 to 2).foreach { rep =>
      val pairs = time(s"rep$rep minHashCandidates+materialize") {
        val p = graft.operators.Dedup.minHashCandidates(docs, "doc_id", "text",
          numHashes = 16, numBands = 4).localCheckpoint()
        println(s"[cc] pairs = ${p.count()}")
        p
      }
      val cc = time(s"rep$rep connectedComponents build") {
        graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
      }
      time(s"rep$rep final count") {
        println(s"[cc] clusters rows = ${cc.count()}")
      }
    }
    spark.stop()
  }
}
