package graft.tools

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{StatefulV2, StreamOps}

/** Shuffle-partition sweep for the Q8 windowed-CoGBK shape
  * (StreamOps.newUsersJoin) — the r17 bench form whose breakdown
  * shows the RocksDB per-instance commit floor (~55 ms/instance/batch,
  * tools.GlobalProfile) as a large cost share. Unlike the global
  * two-stage ops (whose stage-1 holds 8 shard keys), this op carries
  * REAL distributed state (~40k (user, window) rows per 100k events),
  * so the sweep answers whether the commit-floor saving of a low P
  * outweighs losing update parallelism. Method mirrors GlobalProfile:
  * MemoryStream replay over the events table, 10 chunks, noop sink.
  *
  * Usage: sbt "runMain graft.tools.Q8Profile [sfDir]"
  */
object Q8Profile {

  private def drive[T: Encoder](spark: SparkSession,
      rows: IndexedSeq[T], sentinels: Seq[T])(
      f: Dataset[T] => Dataset[_]): (Double, Long, Long, Long) = {
    val (dt, prog) = ReplayHarness.run(spark, "q8prof", rows, sentinels,
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        StatefulV2.RocksDbProvider)
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // match the bench's tuned section (r18): numRowsTotal
      // bookkeeping off — see GlobalProfile's track sweep
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_type", "value")
      // bounded: profile replay source, same contract as StreamingBench
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getDouble(3)))
      .sortBy(_._2.getTime)
      .toIndexedSeq
    val maxTs = ev.last._2.getTime
    def late(h: Int) =
      (-1L, new java.sql.Timestamp(maxTs + h * 3600000L), "view", 0.0)

    // r18: the sweep runs BOTH output grains — the aggregated
    // (user, window) summary (API default) and emitPerRight (the
    // reference Query8's per-(person, auction) emission, what the
    // bench row pays since ADVICE r17) — so the grain cost is a
    // same-host paired measurement, not a cross-round inference.
    println(f"${"grain"}%9s ${"P"}%3s ${"ev/s"}%8s ${"addBatch"}%9s ${"commit"}%8s rowsUpd")
    for (grain <- Seq("agg", "per-right", "packed"); p <- Seq(8, 4, 2, 1)) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      def build(ds: Dataset[(Long, java.sql.Timestamp, String, Double)]) =
        grain match {
          case "packed" => StreamOps.newUsersJoinPacked(
            ds.toDF("user_id", "ts", "event_type", "value"),
            "1 hour", "0 seconds", "signup", "view")
          case g => StreamOps.newUsersJoin(
            ds.toDF("user_id", "ts", "event_type", "value"),
            "1 hour", "0 seconds", "signup", "view",
            emitPerRight = g == "per-right")
        }
      // warm pass at 1/10 volume (plan + janino)
      drive(spark, ev.take(ev.size / 10), Seq(late(3)))(build)
      val (evs, ab, cm, ru) = drive(spark, ev, Seq(late(3), late(4)))(build)
      println(f"$grain%9s $p%3d $evs%8.0f $ab%8dms $cm%7dms $ru")
    }
    spark.stop()
  }
}
