package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run every registry query against schema-identical EMPTY
  * tables (the empty-partition / empty-input robustness probe — at
  * 100 TB some split is always empty). Prints each failure. */
object EmptyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.001"
    // events carries parquet TIMESTAMP(NANOS): copy through the legacy
    // long-nanos path Tables.events itself normalizes from
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    def sweep(label: String, d: String): Unit = {
      var bad = 0
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try { fn(spark, d).collect(); () }
        catch { case e: Throwable =>
          bad += 1
          println(s"FAIL[$label] $name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
        }
      }
      println(s"$label sweep: ${graft.SparkEntry.queries.size - bad}/" +
        s"${graft.SparkEntry.queries.size} ok, $bad failed")
    }
    sweep("empty", dir)

    // single-row tables (n=1 aggregates: stddev/corr/median edge paths)
    val dir1 = java.nio.file.Files.createTempDirectory("graft-one").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$src/$t.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$dir1/$t.parquet")
    }
    sweep("single-row", dir1)

    // null-injected: every nullable-typed string column nulled on ~1/3
    // of rows (dirty-corpus robustness; numeric keys stay intact)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StringType
    val dirN = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      var df = spark.read.parquet(s"$src/$t.parquet")
      for (f <- df.schema.fields if f.dataType == StringType)
        df = df.withColumn(f.name,
          when(abs(hash(col(f.name))) % 3 === 0, lit(null: String))
            .otherwise(col(f.name)))
      df.write.mode("overwrite").parquet(s"$dirN/$t.parquet")
    }
    sweep("null-injected", dirN)
    spark.stop()
  }
}
