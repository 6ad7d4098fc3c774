package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Specs for graft.operators.Joins (Beam CoGroupByKey / side-input join
  * analogs plus the as-of join — SURVEY §2.4). */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("coGroupByKey groups both sides, outer on missing keys") {
    val l = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "lv")
    val r = Seq((1, "x"), (3, "y")).toDF("k", "rv")
    val got = Joins.coGroupByKey(l, r, "k", "lv", "rv")
    assertRows(got, Seq(
      Seq(1, Seq("a", "b"), Seq("x")),
      Seq(2, Seq("c"), Seq()),
      Seq(3, Seq(), Seq("y"))))
  }

  test("asOfJoin attaches latest right row at or before left ts") {
    val trades = Seq(("AA", 3L, 1L), ("AA", 7L, 2L), ("BB", 1L, 3L))
      .toDF("sym", "ts", "trade_id")
    val quotes = Seq(("AA", 2L, 10.0), ("AA", 5L, 11.0), ("AA", 7L, 12.0),
      ("BB", 9L, 99.0)).toDF("sym", "ts", "px")
    val got = Joins.asOfJoin(trades, quotes, "sym", "ts",
        Seq("trade_id"), Seq("px"))
      .select(col("sym"), col("ts"), col("trade_id"), col("r_px"))
    assertRows(got, Seq(
      Seq("AA", 3L, 1L, 10.0),  // latest quote at ts<=3 is ts=2
      Seq("AA", 7L, 2L, 12.0),  // equal ts matches (right wins tie)
      Seq("BB", 1L, 3L, null))) // no quote yet
  }

  test("asOfJoin keeps duplicate (key, ts) left rows 1:1") {
    val trades = Seq(("AA", 3L, 1L), ("AA", 3L, 2L)).toDF("sym", "ts", "trade_id")
    val quotes = Seq(("AA", 2L, 10.0)).toDF("sym", "ts", "px")
    val got = Joins.asOfJoin(trades, quotes, "sym", "ts",
      Seq("trade_id"), Seq("px"))
    assert(got.count() == 2) // a join-back on (sym, ts) would yield 4
  }

  test("broadcastJoin produces a BroadcastHashJoin plan") {
    val big = spark.range(1000).toDF("id")
    val small = Seq((1L, "one"), (2L, "two")).toDF("id", "name")
    val joined = Joins.broadcastJoin(big, small, big("id") === small("id"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(joined.count() == 2)
  }
}
