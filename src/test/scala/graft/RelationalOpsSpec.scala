package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Typed rows for the Convert round-trip spec (top-level so product
  * encoders carry no outer pointer). */
final case class CvInner(amt: BigDecimal, tags: Seq[String],
    props: Map[String, Long])
final case class CvRec(id: Long, ts: java.sql.Timestamp, fin: CvInner)

/** Static in-flight gauge for the asyncMap concurrency spec — local
  * mode runs executors in this JVM, so a JVM-wide peak counter observes
  * worker-side overlap without wall-clock assumptions. */
object AsyncProbe {
  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  private val peakSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { inFlight.set(0); peakSeen.set(0) }
  def enter(): Unit = {
    val now = inFlight.incrementAndGet()
    peakSeen.accumulateAndGet(now, math.max)
  }
  def exit(): Unit = inFlight.decrementAndGet()
  def peak(): Int = peakSeen.get()
}

/** Specs for graft.operators.Relational (Beam Top/Latest/Partition/
  * WithFailures/SortValues analogs — SURVEY §2.2/§2.3/§2.6). */
class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def kv = Seq(
    ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0),
    ("b", 4, 5.0), ("b", 5, 50.0)).toDF("k", "id", "v")

  test("topK returns k rows in order") {
    val got = Relational.topK(kv, 2, col("v").desc).select("id").as[Int].collect()
    assert(got.toSeq == Seq(5, 2))
  }

  test("topKPerKey keeps k rows per key") {
    val got = Relational.topKPerKey(kv, Seq(col("k")), Seq(col("v").desc), 1)
      .select("k", "id")
    assertRows(got, Seq(Seq("a", 2), Seq("b", 5)))
  }

  test("latestPerKey picks max-ts row with tiebreak") {
    val df = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("a", 2L, "z"))
      .toDF("k", "ts", "payload")
    val got = Relational.latestPerKey(df, Seq(col("k")), col("ts"), col("payload"))
    assertRows(got.select("k", "ts", "payload"), Seq(Seq("a", 2L, "z")))
  }

  test("partition splits disjointly, first predicate wins") {
    val parts = Relational.partition(kv, Seq(col("v") > 15, col("v") > 4))
    assert(parts(0).select("id").as[Int].collect().sorted.toSeq == Seq(2, 3, 5))
    assert(parts(1).select("id").as[Int].collect().sorted.toSeq == Seq(1, 4))
  }

  test("withFailures routes bad rows to dead letter") {
    val df = Seq("1", "2", "oops").toDF("s")
    // try_cast: ANSI mode (Spark 4 default) makes plain cast THROW on
    // malformed input — the dead-letter route must be non-throwing
    val attempt = expr("try_cast(s AS int)")
    val (ok, bad) = Relational.withFailures(df, attempt, attempt.isNull, "parsed")
    assert(ok.select("parsed").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(bad.select("s").as[String].collect().toSeq == Seq("oops"))
  }

  test("sortedValuesPerKey secondary-sorts within key") {
    val got = Relational.sortedValuesPerKey(kv, col("k"), col("v"), col("id"))
      .filter(col("k") === "a").select("sorted_values").as[Seq[Int]].head()
    assert(got == Seq(1, 3, 2)) // ordered by v: 10→id1, 20→id3, 30→id2
  }

  test("tryMap dead-letters thrown exceptions with the input row") {
    val ds = Seq(1, 2, -3, 4).toDS()
    val attempted = graft.operators.Relational.tryMap[Int, Int](ds, { n =>
      if (n < 0) throw new IllegalStateException(s"neg:$n") else n * 10
    }).collect().toSeq
    val ok = attempted.collect { case (Some(o), _, _) => o }
    val bad = attempted.collect { case (_, Some(t), err) => (t, err) }
    assert(ok.sorted == Seq(10, 20, 40))
    assert(bad == Seq((-3, "java.lang.IllegalStateException: neg:-3")))
  }

  test("asyncMap overlaps work and preserves input order") {
    val n = 64
    val ds = spark.range(n).repartition(2).as[Long]
    // measure concurrency DIRECTLY (peak in-flight evaluations seen by
    // the workers), not by wall clock — the suite runs on a loaded
    // shared host where scheduling delay swamps any time threshold
    AsyncProbe.reset()
    val got = graft.operators.Async.asyncMap[Long, Long](ds, { x =>
      AsyncProbe.enter()
      try { Thread.sleep(20); x * 2 } finally AsyncProbe.exit()
    }, maxInFlight = 16).collect().toSeq
    assert(got.sorted == (0L until n).map(_ * 2))
    // input order preserved: a single ascending partition must come
    // back ascending even though evaluations overlap
    val ordered = graft.operators.Async.asyncMap[Long, Long](
      spark.range(n).coalesce(1).as[Long],
      { x => Thread.sleep(1); x * 2 }, maxInFlight = 16).collect().toSeq
    assert(ordered == (0L until n).map(_ * 2))
    // local-mode executors share this JVM, so the static peak gauge is
    // authoritative: >1 in flight at once ⇔ evaluations overlapped
    assert(AsyncProbe.peak() > 1,
      s"asyncMap showed no concurrency: peak in-flight = ${AsyncProbe.peak()}")
  }

  test("waitOn forces the signal before returning the main dataset") {
    val acc = spark.sparkContext.longAccumulator("signal_rows")
    val signal = spark.range(10).map { x => acc.add(1); x }
    val main = graft.operators.Async.waitOn(spark.range(3).toDF(), signal)
    assert(acc.value == 10) // signal ran at waitOn time, before any main action
    assert(main.count() == 3)
  }

  test("mergeIntervals merges overlapping per-key intervals") {
    val df = Seq(
      ("a", 0L, 10L), ("a", 5L, 12L), ("a", 20L, 25L),
      ("b", 3L, 4L)).toDF("k", "st", "en")
    val got = graft.operators.Windowing
      .mergeIntervals(df, Seq(col("k")), col("st"), col("en"))
      .select("k", "win_start", "win_end", "n_rows")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 0L, 12L, 2L), ("a", 20L, 25L, 1L),
      ("b", 3L, 4L, 1L)))
  }

  test("globalRowIndex assigns the global sort position, no global window") {
    val df = spark.range(1000).toDF("id")
      .withColumn("k", pmod(col("id") * 7919, lit(1000))) // scrambled order
    val got = Relational.globalRowIndex(df, "row_idx", col("k").asc)
      .select("k", "row_idx").as[(Long, Long)].collect().sortBy(_._1)
    // k is a permutation of 0..999, so index must equal k itself.
    assert(got.forall { case (k, i) => k == i })
    // Contiguity: 0..n-1 exactly once.
    assert(got.map(_._2).sorted.toSeq == (0L until 1000L))
    // The plan must not contain a Window operator (the single-task
    // row_number() OVER () anti-pattern this op exists to avoid).
    val plan = Relational.globalRowIndex(df, "row_idx", col("k").asc)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("Convert: typed Dataset <-> Row round-trip keeps nested/array/map/logical types") {
    // Beam Convert.toRows/fromRows (schemas/transforms/Convert.java):
    // typed <-> schema'd rows with inferred schemas. Spark analog is
    // exactly Encoders: case class -> toDF (toRows), .as[T] (fromRows).
    val rows = Seq(
      CvRec(1L, java.sql.Timestamp.valueOf("2026-01-02 03:04:05.123456"),
        CvInner(BigDecimal("12.50"), Seq("a", "b"), Map("x" -> 1L))),
      CvRec(2L, java.sql.Timestamp.valueOf("2026-06-07 08:09:10"),
        CvInner(BigDecimal("-3.75"), Seq.empty, Map.empty)))
    val df = rows.toDS().toDF() // Convert.toRows
    // schema'd as nested struct + array + map + DECIMAL(38,18) + micros
    assert(df.schema("fin").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 18))
    val back = df.as[CvRec].collect().sortBy(_.id) // Convert.fromRows
    rows.zip(back).foreach { case (a, b) =>
      assert(a.id == b.id && a.ts == b.ts)
      assert(a.fin.amt.compare(b.fin.amt) == 0) // scale-insensitive
      assert(a.fin.tags == b.fin.tags && a.fin.props == b.fin.props)
    }
    // and the schema'd form joins the relational surface directly
    assert(df.filter(col("fin.amt") > 0).count() == 1)
  }

  test("TimestampCombiner: windowed agg output timestamp = end-of-window / earliest / latest") {
    import graft.operators.Windowing
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:10:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:40:00"), 2.0))
      .toDF("k", "ts", "v")
    def run(mode: Windowing.TimestampCombiner): java.sql.Timestamp =
      Windowing.tumbling(df, "ts", "1 hour", col("k"))
        .agg(Windowing.outputTimestamp(mode, "ts"), sum("v").as("sv"))
        .select("output_ts").as[java.sql.Timestamp].head()
    assert(run(Windowing.EndOfWindow) ==
      java.sql.Timestamp.valueOf("2026-01-01 01:00:00"))
    assert(run(Windowing.Earliest) ==
      java.sql.Timestamp.valueOf("2026-01-01 00:10:00"))
    assert(run(Windowing.Latest) ==
      java.sql.Timestamp.valueOf("2026-01-01 00:40:00"))
  }

  test("SchemaOps rename/add/drop/cast/flatten over nested rows") {
    import graft.operators.SchemaOps
    val df = Seq((1L, 10.7, "x", "HI"), (2L, 250000.2, "y", "LO"))
      .toDF("id", "amt", "st", "pr")
      .select(col("id"), struct(col("amt"), col("st"),
        struct(col("pr")).as("meta")).as("fin"))

    // top-level + nested rename
    val ren = SchemaOps.renameFields(df, "fin.amt" -> "amount", "id" -> "key")
    assert(ren.columns.contains("key"))
    assert(ren.select("fin.amount").as[Double].collect().sorted
      .sameElements(Array(10.7, 250000.2)))
    assert(!ren.select("fin.*").columns.contains("amt"))

    // nested add + cast narrows double -> long (truncation)
    val add = SchemaOps.castFields(
      SchemaOps.addFields(ren, "fin.flag" -> lit(true)),
      "fin.amount" -> org.apache.spark.sql.types.LongType)
    assert(add.select("fin.flag").as[Boolean].collect().forall(identity))
    assert(add.select("fin.amount").as[Long].collect().sorted
      .sameElements(Array(10L, 250000L)))

    // nested drop removes exactly the one leaf
    val drp = SchemaOps.dropFields(add, "fin.st")
    assert(!drp.select("fin.*").columns.contains("st"))
    assert(drp.select("fin.*").columns.contains("amount"))

    // flatten lifts every leaf to a _-joined top-level column
    val flat = SchemaOps.flattenSchema(drp)
    assert(flat.columns.toSet ==
      Set("key", "fin_amount", "fin_meta_pr", "fin_flag"))
    assert(flat.filter(col("key") === 2L).select("fin_meta_pr")
      .as[String].head() == "LO")

    // the whole chain is one shuffle-free projection
    assert(!flat.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("renameFields rejects self-renames and sibling clobbers (nested)") {
    import graft.operators.SchemaOps
    val df = Seq((1L, 10.0, "x")).toDF("id", "amt", "st")
      .select(col("id"), struct(col("amt"), col("st")).as("fin"))
    // renaming a nested field onto its own name would write-then-delete
    // it (field vanishes) — must error instead
    val selfErr = intercept[IllegalArgumentException] {
      SchemaOps.renameFields(df, "fin.amt" -> "amt")
    }
    assert(selfErr.getMessage.contains("equals current name"))
    // renaming onto an existing sibling would silently clobber its value
    val sibErr = intercept[IllegalArgumentException] {
      SchemaOps.renameFields(df, "fin.amt" -> "st")
    }
    assert(sibErr.getMessage.contains("already exists"))
    // a genuinely-new name still works
    assert(SchemaOps.renameFields(df, "fin.amt" -> "amount")
      .select("fin.amount").as[Double].head() == 10.0)
  }

  test("latestByRev: max-rev row per key, names/order preserved, one agg no window") {
    import graft.streaming.StreamOps
    // a rev-stamped changelog as the streaming snapshot ops emit it:
    // (key, rev, payload...) — latest view = the max-rev row per key
    val log = Seq(
      (1L, 1L, "a", 10.0), (1L, 2L, "b", 20.0), (1L, 3L, "c", 30.0),
      (2L, 1L, "x", 1.0), (2L, 2L, "y", 2.0),
      (3L, 7L, "solo", 0.5)
    ).toDF("key", "rev", "state", "score")
    val got = StreamOps.latestByRev(log, Seq("key"), "rev")
    assert(got.columns.toSeq == Seq("key", "rev", "state", "score"))
    assert(got.as[(Long, Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, 3L, "c", 30.0), (2L, 2L, "y", 2.0), (3L, 7L, "solo", 0.5)))
    // the scale contract: a two-phase aggregate with a MAP-SIDE partial
    // max_by (one row per key per partition crosses the shuffle), never
    // a row_number window sort over the whole changelog. Struct-valued
    // max_by plans as SortAggregate — the partial phase is the property.
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window sort crept in:\n$plan")
    assert(plan.contains("partial_max_by"), s"expected partial agg:\n$plan")
    // guard-rails
    intercept[IllegalArgumentException] {
      StreamOps.latestByRev(log, Seq("key", "rev"), "rev")
    }
    intercept[IllegalArgumentException] {
      StreamOps.latestByRev(log, Seq(), "rev")
    }
  }
}
