package graft.tools

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StatefulV2

/** Feasibility probe for a FAITHFUL streaming Nexmark Q5 row (hot
  * items over SLIDING windows — published 5.0 s ⇒ ~20.2k ev/s bar):
  * chained windowed aggregations, the Spark 3.5+ multi-stateful
  * pattern — (1) count per (sliding window, item), (2) per-window
  * argmax over the CLOSED counts via re-aggregation on the window
  * column. Sliding 1 h / 15 m ⇒ each event feeds 4 windows (4× state
  * expansion — exactly what the existing `streaming_triggered_windows`
  * proxy avoids), so this measures whether the faithful shape still
  * clears the bar before the bench adopts it.
  *
  * Usage: sbt "runMain graft.tools.Q5Profile [sfDir]"
  */
object Q5Profile {

  private def drive[T: Encoder](spark: SparkSession,
      rows: IndexedSeq[T], sentinels: Seq[T])(
      f: Dataset[T] => Dataset[_]): (Double, Long, Long, Long) = {
    val (dt, prog) = ReplayHarness.run(spark, "q5prof", rows, sentinels,
      10)(f)
    val ops = prog.flatMap(_.stateOperators)
    (rows.size / dt,
      prog.map(ReplayHarness.dur(_, "addBatch")).sum,
      ops.map(_.commitTimeMs).sum, ops.map(_.numRowsUpdated).sum)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        StatefulV2.RocksDbProvider)
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // r18 re-probe knob: the faithful sliding shape is WRITE-VOLUME
      // bound (385k state writes / 100k events), so the track-off
      // saving (a point-get per put — GlobalProfile) hits it hardest;
      // default matches the bench (off), SPARK_GRAFT_TRACK_ROWS=true
      // reproduces the r17 measurement
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        sys.env.getOrElse("SPARK_GRAFT_TRACK_ROWS", "false"))
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "ts", "value")
      // bounded: profile replay source, same contract as StreamingBench
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .sortBy(_._2.getTime)
      .toIndexedSeq
    val maxTs = ev.last._2.getTime
    def late(h: Int) =
      (-1L, new java.sql.Timestamp(maxTs + h * 3600000L), 0.0)

    // (a) the chained two-agg faithful form
    val (evs2, ab2, cm2, ru2) = drive(spark, ev, Seq(late(3), late(4))) { ds =>
      val counts = ds.toDF("item", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("item"))
        .agg(count(lit(1)).as("n"))
      counts
        .groupBy(col("window"))
        .agg(max_by(col("item"), struct(col("n"), col("item"))).as("hot"),
          max(col("n")).as("n_bids"))
    }
    println(f"q5_chained   ${evs2}%8.0f ev/s addBatch=${ab2}ms commit=${cm2}ms rowsUpd=$ru2")

    // (b) single-agg variant: per (window, item) counts only (argmax
    // read-out left to the consumer) — isolates the chained second
    // stage's cost
    val (evs1, ab1, cm1, ru1) = drive(spark, ev, Seq(late(3), late(4))) { ds =>
      ds.toDF("item", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("item"))
        .agg(count(lit(1)).as("n"))
    }
    println(f"q5_counts    ${evs1}%8.0f ev/s addBatch=${ab1}ms commit=${cm1}ms rowsUpd=$ru1")

    // (c) r19: PANE-BASED faithful sliding (Beam's combiner-lifted
    // sliding strategy): slide-grain tumbling pane partials (1 state
    // write per touched (item, pane) per batch) → closed panes fanned
    // ×4 into their sliding windows → per-window argmax. Three chained
    // stateful ops, but stages 2–3 run at pane-close grain. On THIS
    // distribution (distinct (item, pane) ≈ events) panes combine
    // nothing, so the fan-out just moves downstream — kept as the
    // measured record of why the map-agg form (e) was adopted instead.
    val (evs3, ab3, cm3, ru3) = drive(spark, ev, Seq(late(3), late(4))) { ds =>
      graft.streaming.StreamOps.slidingAggPaned(
        ds.toDF("item", "ts", "value"),
        "ts", "item", "1 hour", "15 minutes", "0 seconds",
        paneAggs = Seq(count(lit(1)).as("n")),
        mergeAggs = Seq(sum(col("n")).as("n")))
        .groupBy(col("w"))
        .agg(min_by(col("item"), struct((-col("n")).as("nn"),
          col("item"))).as("hot"), max(col("n")).as("n_hot"))
    }
    println(f"q5_paned     ${evs3}%8.0f ev/s addBatch=${ab3}ms commit=${cm3}ms rowsUpd=$ru3")

    // (d) pane counts WITHOUT the argmax stage — attributes variant
    // (c)'s cost between the pane machinery and the final read-out
    val (evs4, ab4, cm4, ru4) = drive(spark, ev, Seq(late(3), late(4))) { ds =>
      graft.streaming.StreamOps.slidingAggPaned(
        ds.toDF("item", "ts", "value"),
        "ts", "item", "1 hour", "15 minutes", "0 seconds",
        paneAggs = Seq(count(lit(1)).as("n")),
        mergeAggs = Seq(sum(col("n")).as("n")))
    }
    println(f"q5_paned_nrm ${evs4}%8.0f ev/s addBatch=${ab4}ms commit=${cm4}ms rowsUpd=$ru4")

    // (e) r19 adopted form: ONE stateful agg keyed by window, per-item
    // counts folded into the HotItemAgg map buffer — state rows =
    // windows, writes = windows touched per batch
    val (evs5, ab5, cm5, ru5) = drive(spark, ev, Seq(late(3), late(4))) { ds =>
      graft.streaming.StreamOps.hotItemsSliding(
        ds.toDF("item", "ts", "value"),
        "ts", "item", "1 hour", "15 minutes", "0 seconds")
    }
    println(f"q5_mapagg    ${evs5}%8.0f ev/s addBatch=${ab5}ms commit=${cm5}ms rowsUpd=$ru5")
    spark.stop()
  }
}
