package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.{StatefulV2, StreamOps}

/** Wall attribution for the Nexmark Q9 row (`streaming_winning_bid`) —
  * VERDICT r18 #9: the published Q9 bar has two derivations (10.7k vs
  * 111k ev/s), so the comparison needs a breakdown showing WHERE this
  * engine's wall goes. Method: replay the bench shape per-batch and
  * split the progress telemetry into DATA batches (state writes: the
  * auction/best ValueState puts and early-bid buffering) vs the
  * SENTINEL batches (watermark flush: timer fires + emission +
  * state GC) — plus a timers-never-fire pass (duration beyond the
  * stream's span, so no auction closes until the sentinels) that
  * isolates incidental in-data-batch timer cost by difference.
  *
  * Usage: sbt "runMain graft.tools.Q9Profile [sfDir]"
  */
object Q9Profile {

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
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_type", "value", "event_id")
      // bounded: profile replay source, same contract as StreamingBench
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
      .sortBy(_._2.getTime)
      .toIndexedSeq
    val maxTs = ev.last._2.getTime
    def late(h: Int, id: Long) =
      (-1L, new java.sql.Timestamp(maxTs + h * 3600000L), false, id, 0.0)
    val rows = ev.map(e => (e._1, e._2, e._3 == "signup", e._5, e._4))

    def attrib(label: String, durationMs: Long): Unit = {
      val (dt, prog) = ReplayHarness.run(spark, "q9prof", rows,
        Seq(late(3, -1L), late(4, -2L)), 10) { ds =>
        StatefulV2.winningBid(ds.withWatermark("_2", "0 seconds"),
          durationMs = durationMs)
      }
      // the LAST two progress entries are the sentinel batches: the
      // first advances the watermark past every open auction (all
      // remaining timers fire there), the second proves quiescence
      val (data, flush) = prog.splitAt(prog.length - 2)
      def sums(p: Array[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
        val ops = p.flatMap(_.stateOperators)
        (p.map(ReplayHarness.dur(_, "addBatch")).sum,
          ops.map(_.commitTimeMs).sum, ops.map(_.numRowsUpdated).sum,
          ops.map(_.numRowsRemoved).sum, p.map(_.sink.numOutputRows).sum)
      }
      val (dAb, dCm, dUp, dRm, dOut) = sums(data)
      val (fAb, fCm, fUp, fRm, fOut) = sums(flush.toArray)
      println(f"$label%14s ${rows.size / dt}%8.0f ev/s | data: addBatch=${dAb}ms commit=${dCm}ms upd=$dUp rm=$dRm out=$dOut | flush: addBatch=${fAb}ms commit=${fCm}ms upd=$fUp rm=$fRm out=$fOut")
    }

    // warm (plan + janino)
    ReplayHarness.run(spark, "q9warm", rows.take(rows.size / 10),
      Seq(late(3, -1L)), 5) { ds =>
      StatefulV2.winningBid(ds.withWatermark("_2", "0 seconds"),
        durationMs = 3600000L)
    }
    // (a) bench shape: 1 h auctions — timers fire DURING data batches
    attrib("q9_bench", 3600000L)
    // (b) never-in-data fires: auction span beyond the stream — every
    // timer fires in the flush batch; data batches are pure writes
    attrib("q9_all_flush", 400L * 3600000L)
    spark.stop()
  }
}
