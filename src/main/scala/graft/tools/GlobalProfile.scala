package graft.tools

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import graft.streaming.StatefulV2

/** Attribution profiler for the GLOBAL two-stage streaming ops' fixed
  * cost (r16 directive #3, carried from r14): the globals bench at
  * ~16-18k ev/s where per-key siblings hit 20-25k, and the r15
  * breakdown shows per-batch state commit ~2× (15.4-16.6s vs
  * 7.9-8.6s per 10 batches). Three candidate explanations:
  *   (1) the SECOND stateful operator doubles the state-store
  *       instance count — 2 ops × P shuffle partitions RocksDB
  *       instances each paying a per-batch commit floor (snapshot +
  *       changelog file) regardless of row traffic;
  *   (2) the extra shuffle between the stages;
  *   (3) changelog upload volume.
  * This tool separates them by sweeping shuffle partitions (the
  * instance count: cost ∝ P ⇒ commit floor) and changelog on/off
  * (cost moves ⇒ upload), printing PER-OPERATOR commit/update times —
  * stage-1 vs stage-2 attribution the summed bench breakdown can't
  * give. Method mirrors StreamingBench exactly (MemoryStream replay,
  * 10 chunks, noop sink, RocksDB provider).
  *
  * Usage: sbt "runMain graft.tools.GlobalProfile [nEvents]"
  */
object GlobalProfile {

  private val Chunks = 10

  private final case class OpStats(evsPerSec: Double, batches: Int,
      addBatchMs: Long, perOp: Seq[(Long, Long, Long, Long)])
      // perOp: (commitMs, updateMs, rowsUpdated, rowsTotalFinal)

  private def drive[T: Encoder](spark: SparkSession,
      rows: IndexedSeq[T])(f: Dataset[T] => Dataset[_]): OpStats = {
    val (dt, prog) = ReplayHarness.run(spark, "gprof", rows, Seq.empty,
      Chunks)(f)
    // per-operator attribution: stateOperators arrives in a stable
    // plan order per query — sum each INDEX across batches. A query
    // that fails before its first batch leaves recentProgress empty;
    // report zero operators instead of dying in .max (ADVICE r16)
    val nOps =
      if (prog.isEmpty) 0 else prog.map(_.stateOperators.length).max
    val perOp = (0 until nOps).map { i =>
      val ops = prog.flatMap(p =>
        if (p.stateOperators.length > i) Some(p.stateOperators(i)) else None)
      (ops.map(_.commitTimeMs).sum, ops.map(_.allUpdatesTimeMs).sum,
        ops.map(_.numRowsUpdated).sum,
        ops.lastOption.map(_.numRowsTotal).getOrElse(0L))
    }
    OpStats(rows.size / dt, prog.length,
      prog.map(ReplayHarness.dur(_, "addBatch")).sum, perOp)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        StatefulV2.RocksDbProvider)
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the bench's tdigest payload shape: doubles, keyed by an 8-way
    // string key for the per-key sibling (event_type cardinality)
    val rnd = new scala.util.Random(3L)
    val vals = IndexedSeq.fill(n)(rnd.nextDouble() * 100)
    val keyed = vals.map(v => ("t" + (rnd.nextInt(8)), v))

    val ChangelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val TrackKey =
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"

    // r18 sweep: the r16 P x changelog sweep identified the ~55
    // ms/instance/batch commit floor (section below, GLOBAL_PROFILE_
    // SWEEP=pclog to re-run); the remaining addressable knob is
    // trackTotalNumberOfRows — ON (default) pays a RocksDB point-get
    // per put/delete to maintain the numRowsTotal metric, which at
    // sketch-state row sizes is bookkeeping, not work. Sweep it at the
    // bench's P=2 and the deployment-shaped P=8, changelog on.
    if (sys.env.getOrElse("GLOBAL_PROFILE_SWEEP", "track") == "track") {
      spark.conf.set(ChangelogKey, "true")
      println(f"${"op"}%-16s ${"P"}%3s ${"trk"}%4s ${"ev/s"}%8s " +
        f"${"addBatch"}%9s ${"commit(s1,s2)"}%16s ${"upd(s1,s2)"}%14s rowsUpd")
      for (p <- Seq(8, 2); track <- Seq(true, false)) {
        spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        spark.conf.set(TrackKey, track.toString)
        drive(spark, vals.take(n / 10)) { ds =>
          StatefulV2.tdigestQuantilesGlobal(ds, 100.0, Seq(0.5), shards = 8) }
        drive(spark, keyed.take(n / 10)) { ds =>
          StatefulV2.tdigestQuantiles(ds, 100.0, Seq(0.5)) }
        val perKey = drive(spark, keyed) { ds =>
          StatefulV2.tdigestQuantiles(ds, 100.0, Seq(0.5, 0.95, 0.99)) }
        val global = drive(spark, vals) { ds =>
          StatefulV2.tdigestQuantilesGlobal(ds, 100.0, Seq(0.5, 0.95, 0.99),
            shards = 8) }
        def row(nm: String, s: OpStats): Unit = {
          val cs = s.perOp.map(_._1).mkString(",")
          val us = s.perOp.map(_._2).mkString(",")
          val ru = s.perOp.map(_._3).mkString(",")
          println(f"$nm%-16s $p%3d ${if (track) "on" else "off"}%4s " +
            f"${s.evsPerSec}%8.0f ${s.addBatchMs}%8dms ${cs}%16s ${us}%14s $ru")
        }
        row("tdigest_per_key", perKey)
        row("tdigest_global", global)
      }
      spark.stop()
      return
    }

    println(f"${"op"}%-16s ${"P"}%3s ${"clog"}%4s ${"ev/s"}%8s " +
      f"${"addBatch"}%9s ${"commit(s1,s2)"}%16s ${"upd(s1,s2)"}%14s rowsUpd")
    for (p <- Seq(8, 4, 2, 1); clog <- Seq(true, false)) {
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      spark.conf.set(ChangelogKey, clog.toString)
      // warm pass at 1/10 volume for BOTH plan shapes: the per-key and
      // global pipelines compile different generated code, so warming
      // only one would load its comparison row with Janino + first-init
      // cost (review r16)
      drive(spark, vals.take(n / 10)) { ds =>
        StatefulV2.tdigestQuantilesGlobal(ds, 100.0, Seq(0.5), shards = 8) }
      drive(spark, keyed.take(n / 10)) { ds =>
        StatefulV2.tdigestQuantiles(ds, 100.0, Seq(0.5)) }
      val perKey = drive(spark, keyed) { ds =>
        StatefulV2.tdigestQuantiles(ds, 100.0, Seq(0.5, 0.95, 0.99)) }
      val global = drive(spark, vals) { ds =>
        StatefulV2.tdigestQuantilesGlobal(ds, 100.0, Seq(0.5, 0.95, 0.99),
          shards = 8) }
      def row(nm: String, s: OpStats): Unit = {
        val cs = s.perOp.map(_._1).mkString(",")
        val us = s.perOp.map(_._2).mkString(",")
        val ru = s.perOp.map(_._3).mkString(",")
        println(f"$nm%-16s $p%3d ${if (clog) "on" else "off"}%4s " +
          f"${s.evsPerSec}%8.0f ${s.addBatchMs}%8dms ${cs}%16s ${us}%14s $ru")
      }
      row("tdigest_per_key", perKey)
      row("tdigest_global", global)
    }
    spark.stop()
  }
}
