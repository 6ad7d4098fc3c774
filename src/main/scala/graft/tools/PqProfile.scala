package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Stage-level wall breakdown of the IVF-PQ fit/encode/query chain —
  * the r20 optimization target (VERDICT r19 item 1). Dev-only. */
object PqProfile {
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
    graft.functions.GraftFunctions.register(spark)
    // per-job wall tracker
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val sb = new StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, d) = jobStart.getOrDefault(je.jobId, (0L, "?"))
        sb.synchronized {
          sb.append(f"[job] ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3fs  $d%n")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 0.2) sb.synchronized {
          val tm = si.taskMetrics
          sb.append(f"[stage] ${si.stageId}%3d $wall%7.3fs tasks=${si.numTasks} " +
            f"run=${tm.executorRunTime / 1e3}%.3f cpu=${tm.executorCpuTime / 1e9}%.3f " +
            f"deser=${tm.executorDeserializeTime / 1e3}%.3f gc=${tm.jvmGCTime / 1e3}%.3f " +
            f"${si.name.take(60)}%n")
          si.rddInfos.foreach(r => sb.append(s"    [rdd] ${r.name} ${r.scope.map(_.name).getOrElse("")}\n"))
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    def t[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      spark.sparkContext.setJobDescription(null)
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qs = corpus.filter(col("vec_id") % 25 === 0)
        .select((-col("vec_id") - 1).as("vec_id"),
          transform(col("embedding"),
            v => (v * 1.02d + 0.01d).cast("float")).as("embedding"))
      val index = t("fitPqIndex") {
        Similarity.fitPqIndex(corpus, "vec_id", "embedding",
          nCells = 16, m = 16, kCodes = 32, pqIters = 1)
      }
      val encoded = Similarity.encodePq(corpus, "vec_id", "embedding", index)
      val ann = t("ivfPqTopKEncoded build") {
        Similarity.ivfPqTopKEncoded(qs, encoded, corpus,
          "vec_id", "embedding", index, k = 5, nProbe = 4, rerank = 4)
      }
      sb.setLength(0)
      t("ann.count") { ann.count() }
      print(sb.toString)
      sb.setLength(0)
      t("full vec_ann_ivfpq query") {
        graft.SparkEntry.queries("vec_ann_ivfpq")(spark, sfDir).count()
      }
      print(sb.toString)
      // ---- stepwise reconstruction to localize the hot expression ----
      t("corpus.count (raw scan)") { corpus.count() }
      t("encoded.count (pq_encode+cells+norm)") { encoded.count() }
      val enc2 = corpus.select(col("vec_id").as("match_id"))
      t("corpus scan, ids only") { enc2.count() }
      val normOnly = corpus.select(Similarity.l2Norm(col("embedding")).as("n"))
      t("l2Norm only") { normOnly.agg(sum("n")).collect() }
      val cellsOnly = corpus.select(call_function("ivf_cells",
        col("embedding"), Similarity.l2Norm(col("embedding")),
        typedlit(index.seeds), lit(1)).as("c"))
      t("ivf_cells only") { cellsOnly.count() }
      val codesOnly = corpus.select(call_function("pq_encode",
        col("embedding"), typedlit(index.books)).as("c"))
      t("pq_encode only") { codesOnly.count() }
      // candidate join + ADC, no window
      val q0 = qs.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"),
          Similarity.l2Norm(col("embedding")).as("qn"))
        .withColumn("lut", call_function("pq_lut", col("qv"),
          typedlit(index.books)))
      val qc = q0.withColumn("cell", explode(call_function("ivf_cells",
        col("qv"), col("qn"), typedlit(index.seeds), lit(4))))
      val cand0 = encoded.join(broadcast(qc.select("query_id", "cell")),
        Seq("cell")).filter(col("query_id") =!= col("match_id"))
      t("cand join, count only") { cand0.count() }
      val adcCol = (0 until 16).map(s =>
        element_at(element_at(col("lut"), s + 1),
          element_at(col("codes"), s + 1) + 1)).reduce(_ + _)
      val approx = cand0.join(broadcast(q0.select("query_id", "lut", "qn")),
          "query_id")
        .select(col("query_id"), col("match_id"),
          (adcCol / (col("qn") * col("cn_hat"))).as("sim_hat"))
      t("ADC projection, sum agg (no window)") {
        approx.agg(sum("sim_hat")).collect() }
      val approxNative = cand0
        .join(broadcast(q0.select("query_id", "lut", "qn")), "query_id")
        .select(col("query_id"), col("match_id"),
          (call_function("pq_adc", col("lut"), col("codes"))
            / (col("qn") * col("cn_hat"))).as("sim_hat"))
      t("native pq_adc, sum agg (no window)") {
        approxNative.agg(sum("sim_hat")).collect() }
      val wa = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("sim_hat").desc, col("match_id").asc)
      t("ADC + window shortlist") {
        approx.withColumn("rk", row_number().over(wa))
          .filter(col("rk") <= 20).count() }
      print(sb.toString)
      sb.setLength(0)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
