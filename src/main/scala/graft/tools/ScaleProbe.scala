package graft.tools

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{StatefulV2, StreamOps}

/** Empirical scale probe for the STATEFUL streaming family — the one
  * 100 TB argument plan-shape lint cannot make: drive the worst state
  * ops over synthetic skewed-key event streams at 1× and 10× volume
  * and measure how throughput and state-write amplification actually
  * move. A state design that is O(open-sessions) per key holds its
  * events/s and rowsUpdated/event across the decade; an O(n²) rewrite
  * pattern degrades super-linearly and fails the gates below.
  *
  * Probes (the heavy stateful family + the banded-dedup candidate
  * generator as the batch-side scale witness):
  *   - triggered_sessions (merging windows + trigger/pane machinery)
  *   - gap_flush (event-time session clusters, the MATCH_RECOGNIZE base)
  *   - session_agg (native session_window — Catalyst's own path)
  *   - triggered_windows (fixed windows + trigger/pane machinery)
  *   - match_recognize (full NFA over watermark-closed sessions)
  *   - ALL FIVE global two-stage ops (r16/r17: heavy_hitters_global,
  *     reservoir_global, topk_global, tdigest_global,
  *     approx_distinct_global — decade + flat-state + shard-sweep
  *     gates each)
  *   - stream_stream_join (raw symmetric-hash self-join: the
  *     per-distinct-key residue-floor contract) and new_users_join
  *     (the r17 windowed-CoGBK bench shape: near-empty post-flush)
  *   - ann_admission (IVF-PQ ingestion gate at N and 10N corpus)
  *   - minhash_candidates (LSH banded equi-join, N then 10N docs)
  *   - dedup_pipeline (r19: the FULL minHashCandidates →
  *     connectedComponents chain, expression-generated corpus so the
  *     10M third point runs — pair-linearity, bucket-occupancy-p99,
  *     cluster-count, and CC-wall gates)
  *   - ivf_pq_search (r19: the ivfPqTopKEncoded query path at √N
  *     cells — planted recall, cell-occupancy balance, candidate
  *     growth, sub-linear wall)
  *
  * Workload: `SCALE_PROBE_BASE` events (default 100k; 10× = 1M) over a
  * FIXED 2,000-key population with cubic skew (hot keys ~30× the
  * median — the shape that breaks per-key designs), event times
  * advancing so sessions open, merge, close, and GC continuously —
  * state reaches steady-state and stays there, which is exactly the
  * property being verified (the 10× run holds 10× MORE SESSIONS over
  * time but the SAME live state).
  *
  * Gates (printed as a table + PASS/FAIL; exit 1 on any FAIL):
  *   - throughput exponent log10(evs_1x / evs_10x) ≤ 0.30 per op
  *     (≤ 2× per-event cost growth across a decade = sub-linear total)
  *   - rowsUpdated/event within each op's budget at BOTH scales
  *     (triggered_sessions / gap_flush / triggered_windows /
  *     match_recognize ≤ 2.5, session_agg ≤ 3.5)
  *   - minhash candidate pairs grow ~linearly (≤ 3× per-doc growth):
  *     banded LSH emits O(dupes), never the all-pairs O(N²)
  */
object ScaleProbe {

  private val Keys = 2000
  private val GapMs = 1800000L // 30 min, the bench's session gap
  private def Chunks = sys.env.getOrElse("SCALE_PROBE_CHUNKS", "10").toInt

  /** Synthetic skewed keyed events: (key, ts, value). Cubic key skew;
    * timestamps advance ~100ms per event so the 10× stream spans 10×
    * the time (same arrival density ⇒ same live-state steady state).
    * Deterministic (fixed seed) so both scales sample one process. */
  private def gen(n: Int): IndexedSeq[(Long, java.sql.Timestamp, Double)] = {
    val rnd = new scala.util.Random(42L)
    IndexedSeq.tabulate(n) { i =>
      val u = rnd.nextDouble()
      val key = math.min(Keys - 1, (Keys * u * u * u).toInt).toLong
      val ts = new java.sql.Timestamp(1600000000000L + i * 100L +
        rnd.nextInt(80))
      (key, ts, rnd.nextDouble())
    }
  }

  private final case class Probe(name: String, n: Int, evsPerSec: Double,
      rowsUpdated: Long, rowsRemoved: Long,
      addBatchMs: Long, commitMs: Long, updateMs: Long,
      stateRowsFinal: Long) {
    def updPerEvent: Double = rowsUpdated.toDouble / n
  }

  private def drive[T: Encoder](spark: SparkSession, name: String,
      rows: IndexedSeq[T], sentinels: Seq[T])(
      f: Dataset[T] => Dataset[_]): Probe = {
    val (dt, prog) = ReplayHarness.run(spark, name, rows, sentinels,
      Chunks)(f)
    val ops = prog.flatMap(_.stateOperators)
    // final resident state: numRowsTotal summed across the LAST
    // progress entry's operators — the live-state-vs-volume signal
    // the global two-stage gates assert on (O(shards), never O(n))
    val lastRows = prog.reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    Probe(name, rows.size, rows.size / dt,
      ops.map(_.numRowsUpdated).sum, ops.map(_.numRowsRemoved).sum,
      prog.map(ReplayHarness.dur(_, "addBatch")).sum,
      ops.map(_.commitTimeMs).sum,
      ops.map(_.allUpdatesTimeMs).sum, lastRows)
  }

  /** Synthetic doc corpus for the banded-dedup witness: `n` docs of 30
    * vocab words; every 10th doc is a near-copy of the previous one
    * (one word swapped) so true near-dupe pairs scale O(n), and the
    * probe checks the candidate generator does too. */
  private def genDocs(spark: SparkSession, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var prev: Array[String] = Array.empty
    (0 until n).foreach { i =>
      val words =
        if (i % 10 == 9 && prev.nonEmpty) {
          val w = prev.clone(); w(rnd.nextInt(w.length)) = "w" + rnd.nextInt(5000); w
        } else Array.fill(30)("w" + rnd.nextInt(5000))
      prev = words
      docs += ((i.toLong, words.mkString(" ")))
    }
    docs.toSeq.toDF("doc_id", "text").repartition(8)
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SCALE_PROBE_BASE", "100000").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCALE_PROBE_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        StatefulV2.RocksDbProvider)
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      // default ON: the resident-state gates read numRowsTotal, and the
      // bookkeeping cost is paid uniformly at every scale point so the
      // exponents are unaffected. SCALE_PROBE_TRACK_ROWS=false is the
      // A/B knob for the r18 long-list finding (see SCALE.md §3b): with
      // tracking on, every ListState append pays a point-get that must
      // fold ALL accumulated merge operands — O(list length) per
      // element once a key's list grows long.
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        sys.env.getOrElse("SCALE_PROBE_TRACK_ROWS", "true"))
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    def gate(ok: Boolean, msg: String): String =
      if (ok) "ok" else { failures += msg; s"FAIL($msg)" }

    // ONE parse of SCALE_PROBE_OPS for every section (review r16: three
    // hand-rolled variants risked disagreeing on the filter syntax)
    val opFilter = sys.env.get("SCALE_PROBE_OPS").map(_.split(",").toSet)
    def want(op: String) = opFilter.forall(_.contains(op))

    println(f"${"op"}%-22s ${"n"}%9s ${"ev/s"}%9s ${"upd/ev"}%7s ${"rm/ev"}%7s  gates")
    val budgets = Map("triggered_sessions" -> 2.5, "gap_flush" -> 2.5,
      "session_agg" -> 3.5, "triggered_windows" -> 2.5,
      "match_recognize" -> 2.5)
    val results = scala.collection.mutable.Map[(String, Int), Probe]()

    val scales = sys.env.get("SCALE_PROBE_SCALES")
      .map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(base, base * 10))
    scales.foreach { n =>
      val ev = gen(n)
      val maxTs = ev.last._2.getTime
      def late(h: Int) =
        (-1L, new java.sql.Timestamp(maxTs + h * 3600000L), 0.0)
      val sentinels = Seq(late(3), late(4))
      // ~80/20 click/purchase so the NFA probe's C+ P pattern both
      // matches and restarts constantly (the expensive regime)
      val named = ev.map(e =>
        (e._1, e._2, if (e._3 < 0.8) "click" else "purchase", e._3))
      def lateN(h: Int) =
        (-1L, new java.sql.Timestamp(maxTs + h * 3600000L), "eof", 0.0)

      val probes = Seq(
        Option.when(want("triggered_sessions"))(
          drive(spark, "triggered_sessions", ev, sentinels) { ds =>
            StatefulV2.triggeredSessions(ds.withWatermark("_2", "0 seconds"),
              gapMs = GapMs)
          }),
        Option.when(want("gap_flush"))(
          drive(spark, "gap_flush", ev, sentinels) { ds =>
            StatefulV2.eventTimeGapFlush(ds.withWatermark("_2", "0 seconds"),
              gapMs = GapMs)
          }),
        Option.when(want("session_agg"))(
          drive(spark, "session_agg", named, Seq(lateN(3), lateN(4))) { ds =>
            StreamOps.sessionAgg(ds.toDF("user_id", "ts", "etype", "value"),
              "ts", "30 minutes", "0 seconds", Seq(col("user_id")),
              Seq(count(lit(1)).as("n")))
          }),
        Option.when(want("triggered_windows"))(
          drive(spark, "triggered_windows", ev, sentinels) { ds =>
            StatefulV2.triggeredWindows(ds.withWatermark("_2", "0 seconds"),
              windowMs = 3600000L)
          }),
        Option.when(want("match_recognize"))(
          drive(spark, "match_recognize", named, Seq(lateN(3), lateN(4))) { ds =>
            graft.operators.MatchRecognizeSql.stream(
              ds.toDF("user_id", "ts", "etype", "value"),
              """PARTITION BY user_id
                 ORDER BY ts
                 MEASURES COUNT(*) AS n
                 ONE ROW PER MATCH
                 PATTERN (C+ P)
                 DEFINE C AS C.etype = 'click', P AS P.etype = 'purchase'""",
              tsCol = "ts", delay = "0 seconds", gapMs = GapMs)
          })).flatten
      probes.foreach { p =>
        results((p.name, n)) = p
        val g = gate(p.updPerEvent <= budgets(p.name),
          f"${p.name} upd/ev ${p.updPerEvent}%.2f > ${budgets(p.name)}%.1f at n=$n")
        println(f"${p.name}%-22s ${p.n}%9d ${p.evsPerSec}%9.0f " +
          f"${p.updPerEvent}%7.2f ${p.rowsRemoved.toDouble / p.n}%7.2f  " +
          f"addBatch=${p.addBatchMs}ms commit=${p.commitMs}ms " +
          f"upd=${p.updateMs}ms  $g")
      }
    }

    // throughput exponents across the measured scale span — keyed to
    // the ACTUAL scales run (custom SCALE_PROBE_SCALES included), and
    // loud when the gate cannot run at all: a gating tool that prints
    // "all green" after silently skipping its main gate is worse than
    // one that fails
    if (scales.size < 2) {
      println("NOTE: single scale — throughput-exponent gates SKIPPED " +
        "(pass two scales to gate sub-linearity)")
    } else {
      val (nLo, nHi) = (scales.min, scales.max)
      val span = math.log10(nHi.toDouble / nLo)
      budgets.keys.toSeq.sorted.foreach { name =>
        (results.get((name, nLo)), results.get((name, nHi))) match {
          case (Some(s), Some(b)) =>
            // normalized to a per-decade exponent for a fixed bar
            val exp = math.log10(s.evsPerSec / b.evsPerSec) / span
            val g = gate(exp <= 0.30,
              f"$name throughput exponent $exp%.2f > 0.30 per decade")
            println(f"$name%-22s decade exponent ${exp}%+6.3f " +
              f"(${s.evsPerSec}%.0f -> ${b.evsPerSec}%.0f ev/s)  $g")
          case _ => () // op filtered out — its table rows say so
        }
      }
    }

    // ===== GLOBAL two-stage sketch/sample ops (r16 directive #1; r17
    // extends coverage from two of five members to ALL five): the
    // one-key merge stage is the engine's only single-key serialization
    // point, and "safe by construction" (stage-2 input is O(shards)
    // summary rows per batch) is precisely the claim this probe exists
    // to test empirically — the same claim shape ScaleProbe falsified
    // for appendValue in r14. Two sweeps per op:
    //   (a) the 100k→1M event decade at shards=32: throughput exponent
    //       ≤ 0.30 per decade + state-write amplification ≤ 0.10 upd/ev
    //   (b) a 32→256 shard sweep at the base scale: FINAL resident
    //       state rows stay O(shards) — ≤ shards × the op's designed
    //       per-shard row footprint (+16 slack), NEVER O(events) —
    //       and per-event cost holds (≥ 0.4× the 32-shard throughput).
    // Per-shard row footprints (state rows as RocksDB counts them —
    // one per MapState ENTRY, one per packed ValueState):
    //   heavy hitters: ≤ k Misra-Gries counter entries + mgMeta in
    //     stage 1, + its stage-2 summary entry (+rev amortized) ⇒ k+3
    //   reservoir: ONE packed (rev, n, sample) row in stage 1 + its
    //     stage-2 entry ⇒ 3
    val globalDefs: Seq[(String, Int, (Int, Int) => Probe)] = Seq(
      ("heavy_hitters_global", 16 + 3, { (n: Int, shards: Int) =>
        // items = the cubic-skewed key population (hot items ~30× the
        // median — the regime heavy hitters exists for)
        drive(spark, "heavy_hitters_global",
          gen(n).map(e => ("i" + e._1, 1L)), Seq.empty[(String, Long)]) { ds =>
          StatefulV2.heavyHittersGlobal(ds, k = 16, shards = shards)
        }
      }),
      ("reservoir_global", 3, { (n: Int, shards: Int) =>
        // distinct values: every event is a live sampling candidate
        drive(spark, "reservoir_global",
          (0 until n).map(_.toLong), Seq.empty[Long]) { ds =>
          StatefulV2.sampleFixedGlobal(ds, k = 64, shards = shards)
        }
      }),
      // r17 (VERDICT r16 #4): the remaining three two-stage members.
      // All share the reservoir's state shape — ONE packed ValueState
      // per shard in stage 1, one stage-2 MapState entry per shard
      // (+rev amortized) ⇒ footprint 3 — but "shares the idiom" is a
      // by-construction claim, and this probe exists to measure it.
      ("topk_global", 3, { (n: Int, shards: Int) =>
        implicit val ord: Ordering[(Double, Long)] =
          Ordering.by[(Double, Long), Double](_._1).orElseBy(_._2)
        // (value, id) pairs: every event contends for the global heap
        drive(spark, "topk_global",
          gen(n).zipWithIndex.map { case (e, i) => (e._3, i.toLong) },
          Seq.empty[(Double, Long)]) { ds =>
          StatefulV2.topKGlobal(ds, k = 16, shards = shards)
        }
      }),
      ("tdigest_global", 3, { (n: Int, shards: Int) =>
        drive(spark, "tdigest_global", gen(n).map(_._3),
          Seq.empty[Double]) { ds =>
          StatefulV2.tdigestQuantilesGlobal(ds, compression = 100.0,
            qs = Seq(0.5, 0.95, 0.99), shards = shards)
        }
      }),
      ("approx_distinct_global", 3, { (n: Int, shards: Int) =>
        // all-distinct ids: every event mutates its shard's HLL
        drive(spark, "approx_distinct_global",
          (0 until n).map(_.toString), Seq.empty[String]) { ds =>
          StatefulV2.approxDistinctGlobal(ds, lgK = 12, shards = shards)
        }
      }))
    globalDefs.filter(d => want(d._1)).foreach { case (nm, rowsPerShard, mk) =>
      val decade = scales.map(n => n -> mk(n, 32))
      decade.foreach { case (n, p) =>
        // the state-rows budget gates BOTH sweeps (review r16): an
        // O(events) leak slow enough to pass the upd/ev and exponent
        // gates (~1 resident row per 1000 events) would only show in
        // resident rows at the decade's far end
        val rowBudget = rowsPerShard.toLong * 32 + 16
        val g = gate(p.updPerEvent <= 0.10,
          f"$nm upd/ev ${p.updPerEvent}%.3f > 0.10 at n=$n") + " " +
          gate(p.stateRowsFinal <= rowBudget,
            s"$nm stateRows ${p.stateRowsFinal} > $rowBudget at n=$n " +
              "(resident state grows with events?)")
        println(f"$nm%-22s ${p.n}%9d ${p.evsPerSec}%9.0f " +
          f"${p.updPerEvent}%7.3f ${p.rowsRemoved.toDouble / p.n}%7.2f  " +
          f"addBatch=${p.addBatchMs}ms commit=${p.commitMs}ms " +
          f"stateRows=${p.stateRowsFinal}  $g")
      }
      if (scales.size >= 2) {
        val lo = decade.minBy(_._1)._2
        val hi = decade.maxBy(_._1)._2
        val span = math.log10(scales.max.toDouble / scales.min)
        val exp = math.log10(lo.evsPerSec / hi.evsPerSec) / span
        val g = gate(exp <= 0.30,
          f"$nm throughput exponent $exp%.2f > 0.30 per decade")
        println(f"$nm%-22s decade exponent ${exp}%+6.3f " +
          f"(${lo.evsPerSec}%.0f -> ${hi.evsPerSec}%.0f ev/s)  $g")
      }
      // (b) shard sweep: stage-2 state must scale with SHARDS, and the
      // extra shard fan-in must not sink per-event cost
      val p32 = decade.minBy(_._1)._2
      val p256 = mk(scales.min, 256)
      Seq((32, p32), (256, p256)).foreach { case (sh, p) =>
        val budgetRows = rowsPerShard.toLong * sh + 16
        val g = gate(p.stateRowsFinal <= budgetRows,
          s"$nm stateRows ${p.stateRowsFinal} > $budgetRows at shards=$sh " +
            "(state not O(shards)?)")
        println(f"$nm%-22s shards=$sh%-4d ${p.evsPerSec}%9.0f ev/s " +
          f"stateRows=${p.stateRowsFinal} (budget $budgetRows)  $g")
      }
      val ratio = p256.evsPerSec / p32.evsPerSec
      println(gate(ratio >= 0.4,
        f"$nm 256-shard throughput ${ratio}%.2fx the 32-shard run (< 0.4)") match {
        case "ok" => f"$nm shard sweep 32->256 throughput ratio $ratio%.2fx ok"
        case s => s
      })
    }

    // ===== Native symmetric-hash stream-stream windowed equi-join —
    // the operator's state contract, gated on the raw-event self-join
    // shape (the r16 bench shape; the bench row has since moved to the
    // windowed-CoGBK form below, but StreamOps.streamStreamJoin /
    // intervalJoinStream still plan THIS operator, so its contract
    // stays gated). Live join state at steady arrival density is ~one
    // window of rows regardless of stream length (the watermark GCs
    // closed windows), so (a) after the late sentinels resident state
    // must fall to the measured per-distinct-key residue floor (a leak
    // past it is the classic unbounded-join failure), and (b)
    // per-event cost must hold sub-linear across the 100k→1M decade.
    if (want("stream_stream_join")) {
      val joinProbes = scales.map { n =>
        val ev = gen(n)
        val maxTs = ev.last._2.getTime
        val sentinels = Seq(
          (-1L, new java.sql.Timestamp(maxTs + 3 * 3600000L), 0.0),
          (-1L, new java.sql.Timestamp(maxTs + 4 * 3600000L), 0.0))
        n -> drive(spark, "stream_stream_join", ev, sentinels) { ds =>
          val df = ds.toDF("user_id", "ts", "value")
          val persons = df.filter(col("value") < 0.1)
            .withWatermark("ts", "0 seconds")
            .select(col("user_id").as("p_user"),
              window(col("ts"), "1 hour").as("w"))
          val auctions = df.filter(col("value") >= 0.1)
            .withWatermark("ts", "0 seconds")
            .select(col("user_id").as("a_user"),
              window(col("ts"), "1 hour").as("aw"), col("value"))
          persons.join(auctions,
            col("p_user") === col("a_user") && col("w") === col("aw"))
        }
      }
      joinProbes.foreach { case (n, p) =>
        // MEASURED (r16): Spark's symmetric-hash join retains a small
        // CONSTANT of residual state rows per DISTINCT KEY after the
        // watermark GCs all buffered values — 2/key in a single-window
        // repro, 4/key under this probe's multi-window stream, and
        // FLAT across both the event decade AND the window count
        // (8002 at 100k/3 windows and 1M/28 windows alike) — so the
        // honest post-flush contract is ≤ 4·keys + live sentinels;
        // the VALUE state (the O(window·density) part) must be gone.
        // SCALE.md §3 documents the distinct-key residue floor.
        val bound = 4L * Keys + 50
        val g = gate(p.stateRowsFinal <= bound,
          s"stream_stream_join resident state ${p.stateRowsFinal} rows " +
            s"after watermark flush at n=$n (> $bound = 4·keys + " +
            "sentinels: VALUE state leaked past the watermark)")
        println(f"stream_stream_join    ${p.n}%9d ${p.evsPerSec}%9.0f " +
          f"${p.updPerEvent}%7.2f ${p.rowsRemoved.toDouble / p.n}%7.2f  " +
          f"stateRowsAfterFlush=${p.stateRowsFinal} (bound $bound)  $g")
      }
      // the residue must scale with KEYS, not events: identical at
      // both decade points or something event-proportional leaks
      if (joinProbes.size >= 2) {
        val rows = joinProbes.map(_._2.stateRowsFinal)
        println(gate(rows.max - rows.min <= 50,
          s"stream_stream_join post-flush state moved with event volume: " +
            s"${rows.mkString(" vs ")}") match {
          case "ok" =>
            s"stream_stream_join post-flush residue flat across decade (${rows.head}) ok"
          case s => s
        })
      }
      if (scales.size >= 2) {
        val lo = joinProbes.minBy(_._1)._2
        val hi = joinProbes.maxBy(_._1)._2
        val span = math.log10(scales.max.toDouble / scales.min)
        val exp = math.log10(lo.evsPerSec / hi.evsPerSec) / span
        println(gate(exp <= 0.30,
          f"stream_stream_join throughput exponent $exp%.2f > 0.30 per decade") match {
          case "ok" => f"stream_stream_join decade exponent $exp%+6.3f " +
            f"(${lo.evsPerSec}%.0f -> ${hi.evsPerSec}%.0f ev/s) ok"
          case s => s
        })
      }
    }

    // ===== Q8 monitor-new-users in the r17 windowed-CoGBK bench shape
    // (StreamOps.newUsersJoin — ONE stateful windowed aggregation, the
    // form Beam's own Query8 plans): state is one row per (user,
    // window), GC'd at window close with NO residue floor, so the
    // post-flush contract is near-EMPTY (only the sentinels' still-
    // open windows), flat across the decade, cost sub-linear.
    if (want("new_users_join")) {
      val cogbkProbes = scales.map { n =>
        val ev = gen(n)
        val maxTs = ev.last._2.getTime
        val sentinels = Seq(
          (-1L, new java.sql.Timestamp(maxTs + 3 * 3600000L), 0.0),
          (-1L, new java.sql.Timestamp(maxTs + 4 * 3600000L), 0.0))
        n -> drive(spark, "new_users_join", ev, sentinels) { ds =>
          // value<0.1 plays "signup", the rest "view" — ~10/90 split,
          // same cubic key skew as every probe
          StreamOps.newUsersJoin(
            ds.toDF("user_id", "ts", "value")
              .withColumn("event_type",
                when(col("value") < 0.1, "signup").otherwise("view")),
            windowSize = "1 hour", lateness = "0 seconds",
            leftType = "signup", rightType = "view")
        }
      }
      cogbkProbes.foreach { case (n, p) =>
        // windowed-agg state GCs COMPLETELY at close: post-flush
        // residue is only the sentinels' own open windows (the final
        // sentinel's window never closes) — a fixed handful of rows,
        // NOT O(keys) and certainly not O(events). Write amplification
        // is bounded too: one put per TOUCHED (user, window) per batch
        // (map-side partial agg) — measured 0.20/0.07 upd/ev at
        // 100k/1M; a regression past 0.5 means the partial agg or the
        // once-per-batch put contract broke
        val bound = 50L
        val g = gate(p.stateRowsFinal <= bound,
          s"new_users_join resident state ${p.stateRowsFinal} rows " +
            s"after watermark flush at n=$n (> $bound: windowed-agg " +
            "state leaked past the watermark)") + " " +
          gate(p.updPerEvent <= 0.5,
            f"new_users_join upd/ev ${p.updPerEvent}%.2f > 0.5 at n=$n " +
              "(one-put-per-touched-key-per-batch contract broken?)")
        println(f"new_users_join        ${p.n}%9d ${p.evsPerSec}%9.0f " +
          f"${p.updPerEvent}%7.2f ${p.rowsRemoved.toDouble / p.n}%7.2f  " +
          f"stateRowsAfterFlush=${p.stateRowsFinal} (bound $bound)  $g")
      }
      if (scales.size >= 2) {
        val lo = cogbkProbes.minBy(_._1)._2
        val hi = cogbkProbes.maxBy(_._1)._2
        val span = math.log10(scales.max.toDouble / scales.min)
        val exp = math.log10(lo.evsPerSec / hi.evsPerSec) / span
        println(gate(exp <= 0.30,
          f"new_users_join throughput exponent $exp%.2f > 0.30 per decade") match {
          case "ok" => f"new_users_join decade exponent $exp%+6.3f " +
            f"(${lo.evsPerSec}%.0f -> ${hi.evsPerSec}%.0f ev/s) ok"
          case s => s
        })
      }
    }

    // ===== ANN ingestion-admission witness (r16 directive #4):
    // dedup_admit_novel_embedding's per-batch path against a corpus at
    // N and 10N vectors, nCells scaled ~√corpus (the deployment rule).
    // Gates: (1) the MEASURED probed-cell candidate set per incoming
    // row grows sub-linearly (≤ 4.5× per corpus decade; √10 ≈ 3.2
    // expected), (2) admission decisions stay exact at BOTH scales
    // (every planted copy rejected, every basis-vector novel admitted
    // — the decision-robustness argument, now measured), (3) per-batch
    // admission latency grows ≤ 4× per corpus decade.
    if (want("ann_admission")) {
      import graft.operators.{Dedup, Similarity}
      val annBase = math.max(2000, base / 20)
      val annStats = Seq(annBase, annBase * 10).map { n =>
        val rnd = new scala.util.Random(13L)
        val vecs = IndexedSeq.tabulate(n)(i =>
          (i.toLong, Array.fill(64)(rnd.nextFloat())))
        val corpus = vecs.toDF("vec_id", "embedding").repartition(8)
          .cache()
        corpus.count()
        val nCells = math.max(16, math.round(math.sqrt(n)).toInt)
        val index = Similarity.fitPqIndex(corpus, "vec_id", "embedding",
          nCells = nCells, m = 16, kCodes = 32, pqIters = 1)
        val encoded = Similarity
          .encodePq(corpus, "vec_id", "embedding", index).cache()
        encoded.count()
        // incoming batch: 250 exact copies (must ALL be rejected) +
        // 250 one-hot novels (max corpus cosine ≈ 0.22 ≪ 0.95 — must
        // ALL be admitted), same shape at both corpus scales
        val step = n / 250
        val copies = vecs.grouped(step).map(_.head)
          .map { case (id, v) => (-id - 1L, v) }.toIndexedSeq.take(250)
        // novels live a full billion below any copy id (-corpusId-1):
        // an id collision would make the left_anti admission drop both
        // rows and fail the decision gate spuriously (review r16)
        val novels = IndexedSeq.tabulate(250) { i =>
          (-i - 1000000001L,
            Array.tabulate(64)(j => if (j == i % 64) 1.0f else 0.0f))
        }
        val incoming = (copies ++ novels).toDF("vec_id", "embedding")
        val candRow = Similarity.ivfCandidateCount(incoming, encoded,
          "vec_id", "embedding", index, nProbe = 4).collect()(0)
        val candPerQuery = candRow.getLong(1).toDouble / candRow.getLong(0)
        // best-of-2 admission wall time (first pass pays codegen)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val admitted = Dedup.admitNovelByEmbedding(incoming, encoded,
              corpus, "vec_id", "embedding", index, minSim = 0.95)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val dt = (System.nanoTime() - t0) / 1e9
          (dt, admitted)
        }
        val (dt, admitted) = times.minBy(_._1)
        val wantAdmit = novels.map(_._1).toSet
        val gotCopies = admitted.exists(id => copies.exists(_._1 == id))
        println(gate(admitted == wantAdmit,
          s"ann_admission decisions drifted at corpus=$n: " +
            s"admitted=${admitted.size} want=${wantAdmit.size}" +
            (if (gotCopies) " (a planted copy was ADMITTED)" else "")) match {
          case "ok" => s"ann_admission corpus=$n decisions exact " +
            s"(250 copies rejected, 250 novels admitted) ok"
          case s => s
        })
        println(f"ann_admission          $n%9d nCells=$nCells%-5d " +
          f"cand/query=$candPerQuery%9.1f  batch=${dt}%6.3fs")
        corpus.unpersist(); encoded.unpersist()
        (candPerQuery, dt)
      }
      val candGrowth = annStats.last._1 / annStats.head._1
      println(gate(candGrowth <= 4.5,
        f"ann_admission cand/query grew ${candGrowth}%.1fx across 10x " +
          "corpus (> 4.5x — not following the √N cell rule?)") match {
        case "ok" =>
          f"ann_admission cand/query growth ${candGrowth}%.2fx across 10x corpus (√N cells) ok"
        case s => s
      })
      val latGrowth = annStats.last._2 / annStats.head._2
      println(gate(latGrowth <= 4.0,
        f"ann_admission batch latency grew ${latGrowth}%.1fx across 10x corpus") match {
        case "ok" => f"ann_admission latency growth ${latGrowth}%.2fx across 10x corpus ok"
        case s => s
      })
    }

    // ===== Dedup PIPELINE decade gates (r19, VERDICT r18 #3): the
    // full minHashCandidates → connectedComponents chain over a
    // DISTRIBUTIVELY generated corpus (the driver-RAM genDocs caps out
    // near 1M docs; expression-generated docs scale to the 10M third
    // point: SCALE_PROBE_SCALES-style env override on the base).
    // Corpus: every 10th doc is a one-word-swapped near-copy of its
    // predecessor ⇒ true pairs ≈ n/10, clusters of size 2. Gates:
    //   (1) candidate pairs grow ~linearly (≤ 3× per-doc per decade)
    //   (2) per-(band, bucket) occupancy FLAT: p99 at 10× within 2×
    //       of the 1× point (the hot-bucket signal minHashCandidates'
    //       maxBucket cap acts on — trade documented on the operator)
    //   (3) connected components: cluster count within 20% of the
    //       planted n/10 and wall-time exponent ≤ 0.30 per decade
    //       (the pinned-partitioner fixpoint is O(log diameter) rounds)
    if (want("dedup_pipeline")) {
      import graft.operators.Dedup
      def genDocsDist(n: Long) = {
        // base(i) = the doc whose words row i copies; near-copies swap
        // word p(i) = hash(i) % 30 for a vocabulary-disjoint 'x' word
        spark.range(n).selectExpr("id AS doc_id",
          """concat_ws(' ', transform(sequence(0, 29), j ->
               CASE WHEN id % 10 = 9
                      AND j = CAST(pmod(xxhash64(id), 30) AS INT)
                    THEN concat('x', pmod(xxhash64(id, j, 777777), 5000))
                    ELSE concat('w', pmod(xxhash64(
                      id - CASE WHEN id % 10 = 9 THEN 1 ELSE 0 END,
                      j), 5000)) END)) AS text""")
      }
      val dpBase = sys.env.getOrElse("SCALE_PROBE_DEDUP_BASE",
        math.max(2000, base / 10).toString).toLong
      val stats = Seq(dpBase, dpBase * 10).map { n =>
        val docs = genDocsDist(n)
        // occupancy of the banded index (what a hot-bucket cap acts on)
        val sig = Dedup.minHashSignatures(docs, "doc_id", "text", 16)
        val occ = Dedup.minHashBuckets(sig, "doc_id", 16, 4)
          .groupBy("band", "bucket").agg(count(lit(1)).as("s"))
          .agg(max(col("s")).as("mx"),
            expr("percentile_approx(s, 0.99, 10000)").as("p99"),
            avg(col("s")).as("mean"))
          .collect()(0)
        val (occMax, occP99) = (occ.getLong(0), occ.getLong(1))
        val t0 = System.nanoTime()
        val pairs = Dedup.minHashCandidates(docs, "doc_id", "text",
          numHashes = 16, numBands = 4, minEstJaccard = 0.5).cache()
        val nPairs = pairs.count()
        val candDt = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nClusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
          .select("cluster").distinct().count()
        val ccDt = (System.nanoTime() - t1) / 1e9
        pairs.unpersist()
        println(f"dedup_pipeline         $n%9d ${n / candDt}%9.0f docs/s  " +
          f"pairs=$nPairs occP99=$occP99 occMax=$occMax " +
          f"cc=${ccDt}%6.2fs clusters=$nClusters")
        (n, nPairs, occP99, ccDt, nClusters)
      }
      val (n1, p1, o1, cc1, cl1) = stats.head
      val (n2, p2, o2, cc2, cl2) = stats.last
      println(gate(p2.toDouble / math.max(1L, p1) <= 30.0,
        f"dedup_pipeline pairs grew ${p2.toDouble / math.max(1L, p1)}%.1fx " +
          "across 10x docs (O(n^2)?)") match {
        case "ok" => f"dedup_pipeline pairs ${p1} -> ${p2} across 10x docs (linear band) ok"
        case s => s
      })
      println(gate(o2 <= math.max(4L, o1 * 2),
        s"dedup_pipeline bucket-occupancy p99 not flat: $o1 -> $o2 " +
          "across 10x docs (hot buckets forming — engage maxBucket)") match {
        case "ok" => s"dedup_pipeline occupancy p99 flat ($o1 -> $o2) across 10x docs ok"
        case s => s
      })
      Seq((n1, cl1), (n2, cl2)).foreach { case (n, cl) =>
        val planted = n / 10
        println(gate(math.abs(cl - planted) <= planted / 5,
          s"dedup_pipeline clusters $cl vs planted ~$planted at n=$n") match {
          case "ok" => s"dedup_pipeline clusters $cl ~= planted $planted at n=$n ok"
          case s => s
        })
      }
      val ccExp = math.log10((cc2 / n2.toDouble) / (cc1 / n1.toDouble))
      println(gate(ccExp <= 0.30,
        f"dedup_pipeline cc per-doc wall exponent $ccExp%.2f > 0.30/decade") match {
        case "ok" => f"dedup_pipeline cc per-doc wall exponent $ccExp%+6.3f ok"
        case s => s
      })
    }

    // ===== IVF-PQ SEARCH decade gates (r19, VERDICT r18 #3 — the
    // query path twin of ann_admission's ingestion gates):
    // ivfPqTopKEncoded at N and 10N corpus vectors, √N cells. Gates:
    //   (1) planted-neighbor recall@10 ≥ 0.8 at BOTH scales (100
    //       queries = exact copies of corpus vectors; the source id
    //       must rank in the top 10)
    //   (2) IVF CELL occupancy stays balanced: p99 ≤ 8× the mean cell
    //       size at both scales (a collapsed k-means would funnel the
    //       corpus into few cells — the probe-side hot-bucket analog)
    //   (3) per-query candidate volume grows ≤ 4.5× per corpus decade
    //       (√N cells ⇒ ~√10 ≈ 3.2× expected) — THE algorithmic
    //       sub-linearity gate
    //   (4) search wall strictly SUB-LINEAR (≤ 10× per corpus decade)
    //       at fixed queries: the wall is candidates-term (~3.3×) +
    //       an O(corpus) scan term this single-JVM probe cannot
    //       eliminate (measured 7.7× at 1M→10M after the r19 fixes:
    //       broadcast ADC/rerank joins + probed-cell scan pruning);
    //       at cluster width the scan term parallelizes and the
    //       partition-pruned layout removes it — the gate here exists
    //       to catch super-linear regressions (a reintroduced corpus
    //       shuffle measured 8.9×→52 s before the broadcast fix)
    if (want("ivf_pq_search")) {
      import graft.operators.Similarity
      val sBase = sys.env.getOrElse("SCALE_PROBE_ANN_BASE",
        math.max(2000, base / 20).toString).toInt
      val sStats = Seq(sBase, sBase * 10).map { n =>
        val rnd = new scala.util.Random(29L)
        val vecs = IndexedSeq.tabulate(n)(i =>
          (i.toLong, Array.fill(64)(rnd.nextFloat())))
        val corpus = vecs.toDF("vec_id", "embedding").repartition(8).cache()
        corpus.count()
        val nCells = math.max(16, math.round(math.sqrt(n)).toInt)
        val index = Similarity.fitPqIndex(corpus, "vec_id", "embedding",
          nCells = nCells, m = 16, kCodes = 32, pqIters = 1)
        // CELL-CLUSTERED index layout (the deployment rule the operator
        // docs state): range-partition + sort the encoded corpus by
        // cell before caching, so the probed-cell IN filter prunes
        // cached batches and the search scan is O(candidates)
        val encoded = Similarity
          .encodePq(corpus, "vec_id", "embedding", index)
          .repartitionByRange(8, col("cell"))
          .sortWithinPartitions("cell").cache()
        encoded.count()
        val occ = encoded.groupBy("cell").agg(count(lit(1)).as("s"))
          .agg(expr("percentile_approx(s, 0.99, 10000)").as("p99"),
            avg(col("s")).as("mean")).collect()(0)
        val (cellP99, cellMean) = (occ.getLong(0).toDouble, occ.getDouble(1))
        val step = n / 100
        val queries = vecs.grouped(step).map(_.head).take(100)
          .map { case (id, v) => (-id - 1L, v, id) }.toIndexedSeq
        val qDf = queries.map(q => (q._1, q._2)).toDF("vec_id", "embedding")
        val candRow = Similarity.ivfCandidateCount(qDf, encoded,
          "vec_id", "embedding", index, nProbe = 4).collect()(0)
        val candPerQuery = candRow.getLong(1).toDouble / candRow.getLong(0)
        // best-of-2 (first pass pays codegen)
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val hits = Similarity.ivfPqTopKEncoded(qDf, encoded, corpus,
              "vec_id", "embedding", index, k = 10, nProbe = 4, rerank = 4)
            .select("query_id", "match_id").collect()
            .groupBy(_.getLong(0)).map { case (q, rs) =>
              q -> rs.map(_.getLong(1)).toSet }
          ((System.nanoTime() - t0) / 1e9, hits)
        }
        val (dt, hits) = runs.minBy(_._1)
        val recall = queries.count(q =>
          hits.getOrElse(q._1, Set.empty).contains(q._3)) / 100.0
        println(f"ivf_pq_search          $n%9d nCells=$nCells%-5d " +
          f"recall@10=$recall%.2f cand/query=$candPerQuery%9.1f " +
          f"cellP99/mean=${cellP99 / cellMean}%.1f  search=${dt}%6.3fs")
        println(gate(recall >= 0.8,
          f"ivf_pq_search recall@10 $recall%.2f < 0.8 at corpus=$n") match {
          case "ok" => f"ivf_pq_search recall@10 $recall%.2f at corpus=$n ok"
          case s => s
        })
        println(gate(cellP99 <= 8 * cellMean,
          f"ivf_pq_search cell p99 ${cellP99}%.0f > 8x mean $cellMean%.1f " +
            s"at corpus=$n (k-means collapsed?)") match {
          case "ok" => f"ivf_pq_search cell occupancy balanced " +
            f"(p99/mean ${cellP99 / cellMean}%.1f) at corpus=$n ok"
          case s => s
        })
        corpus.unpersist(); encoded.unpersist()
        (candPerQuery, dt)
      }
      val candGrowth = sStats.last._1 / sStats.head._1
      println(gate(candGrowth <= 4.5,
        f"ivf_pq_search cand/query grew ${candGrowth}%.1fx across 10x " +
          "corpus (> 4.5x — not following the √N cell rule?)") match {
        case "ok" =>
          f"ivf_pq_search cand/query growth ${candGrowth}%.2fx across 10x corpus ok"
        case s => s
      })
      val latGrowth = sStats.last._2 / sStats.head._2
      println(gate(latGrowth <= 10.0,
        f"ivf_pq_search wall grew ${latGrowth}%.1fx across 10x corpus " +
          "(super-linear: a corpus shuffle crept back into the query path?)") match {
        case "ok" => f"ivf_pq_search wall growth ${latGrowth}%.2fx across 10x corpus ok"
        case s => s
      })
    }

    // banded-dedup candidate generator: docs at N and 10N
    val wantDedup = want("minhash") || want("minhash_candidates")
    val dedupBase = math.max(2000, base / 10)
    val pairStats = if (!wantDedup) Seq.empty
      else Seq(dedupBase, dedupBase * 10).map { n =>
      val docs = genDocs(spark, n)
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .minHashCandidates(docs, "doc_id", "text", numHashes = 16,
          numBands = 4, minEstJaccard = 0.5).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"minhash_candidates     $n%9d ${n / dt}%9.0f docs/s  pairs=$pairs")
      (n, n / dt, pairs)
    }
    if (pairStats.nonEmpty) {
      val (n1, r1, p1) = pairStats.head
      val (n2, r2, p2) = pairStats.last
      val pairGrowth = p2.toDouble / math.max(1L, p1)
      println(gate(pairGrowth <= 30.0,
        f"candidate pairs grew ${pairGrowth}%.1fx across 10x docs (O(n^2)?)") match {
        case "ok" => f"minhash pairs growth ${pairGrowth}%.1fx across 10x docs (linear band) ok"
        case s => s
      })
      val dedupExp = math.log10(r1 / r2)
      println(gate(dedupExp <= 0.30,
        f"minhash throughput exponent $dedupExp%.2f > 0.30") match {
        case "ok" => f"minhash decade exponent $dedupExp%+6.3f ok"
        case s => s
      })
    }

    spark.stop()
    if (failures.nonEmpty) {
      System.err.println("SCALE PROBE FAILURES:\n  " + failures.mkString("\n  "))
      sys.exit(1)
    }
    println("scale probe: all gates green")
  }
}
