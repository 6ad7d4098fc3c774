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

  test("saltedJoin equals the plain join and spreads a hot key") {
    import spark.implicits._
    // Pathological skew: one key carries 90% of the fact.
    val fact = ((1 to 90).map(i => (1L, i)) ++ (1 to 10).map(i => (2L, i)))
      .toDF("k", "seq")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched"))
      .toDF("k", "label")
    val got = Joins.saltedJoin(fact, dim, "k", fanout = 4,
      saltBy = Seq(col("k"), col("seq")))
    val want = fact.join(dim, Seq("k"))
    assert(got.count() == 100)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // The hot key's fact rows really occupy multiple salt sub-keys.
    val salts = fact.filter(col("k") === 1)
      .select(pmod(xxhash64(col("k"), col("seq")), lit(4)).as("s"))
      .distinct().count()
    assert(salts > 1)
  }

  test("saltedJoin plans the salted SHUFFLE, never a broadcast of the exploded dim") {
    import spark.implicits._
    // r19 opt guard: Catalyst's size estimator does not inflate through
    // the ×fanout Generate, so without the SHUFFLE_HASH hint the planner
    // silently broadcast the exploded dim — defeating the skew-spreading
    // shuffle this operator exists for.
    val fact = (1 to 50).map(i => (i.toLong % 5, i)).toDF("k", "seq")
    val dim = (0L to 4L).map(k => (k, s"v$k")).toDF("k", "label")
    val plan = Joins.saltedJoin(fact, dim, "k", fanout = 4,
      saltBy = Seq(col("k"), col("seq")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"exploded dim must not broadcast:\n$plan")
  }

  test("hybridSkewJoin == plain join at any threshold; only hot keys salt") {
    import spark.implicits._
    // key 1 is hot (90 rows), keys 2..6 are cold (4 each)
    val fact = ((1 to 90).map(i => (1L, i)) ++
      (for (k <- 2L to 6L; i <- 1 to 4) yield (k, i * 100 + k.toInt)))
      .toDF("k", "seq")
    val dim = ((1L to 6L).map(k => (k, s"d$k")) :+ (9L, "unmatched"))
      .toDF("k", "label")
    val want = fact.join(dim, Seq("k"))
    for (threshold <- Seq(1L, 10L, 1000L)) {
      val got = Joins.hybridSkewJoin(fact, dim, "k", fanout = 4,
        saltBy = Seq(col("k"), col("seq")), hotThreshold = threshold)
      assert(got.count() == 110, s"threshold=$threshold")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"threshold=$threshold")
    }
    // at threshold 10 exactly one key is classified hot
    val hot = fact.groupBy("k").count().filter(col("count") > 10)
      .select("k").as[Long].collect().toSet
    assert(hot == Set(1L))
    // the hot-key count pass must run ONCE in-plan: the two broadcast
    // references (fact tag + dim tag) dedupe via exchange reuse — no
    // persist (leaks), no collect (eager synchronous job)
    val g = Joins.hybridSkewJoin(fact, dim, "k", fanout = 4,
      saltBy = Seq(col("k"), col("seq")), hotThreshold = 10L)
    g.collect() // execute THIS QueryExecution (count() builds its own)
    val plan = g.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("Reused"), // ReusedExchange / reused stage
      s"hot-key subplan computed twice — exchange reuse lost:\n$plan")
  }

  test("fuzzyJoinEditDistance matches the brute-force pair set") {
    import spark.implicits._
    val df = Seq("kitten", "sitten", "sittin", "sitting", "apple",
      "apples", "banana", "kitten").toDF("w")
    val got = Joins.fuzzyJoinEditDistance(df, "w", maxDist = 2)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    val names = df.select("w").distinct().as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 2
    } yield (a, b)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("fuzzyJoinEditDistance == brute force on random strings (band completeness)") {
    import spark.implicits._
    // random low-alphabet strings of clustered lengths maximize both
    // near-miss pairs and cross-band pairs — the case the length-band
    // pigeonhole has to keep complete
    val rnd = new scala.util.Random(17)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    (1 to 2).foreach { trial =>
      val words = Seq.fill(80)(
        (0 until 3 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString)
      val maxDist = 1 + rnd.nextInt(2)
      val got = Joins.fuzzyJoinEditDistance(words.toDF("w"), "w", maxDist)
        .select("name_a", "name_b", "dist")
        .as[(String, String, Int)].collect().toSet
      val names = words.distinct
      val want = (for {
        a <- names; b <- names
        if a < b && lev(a, b) <= maxDist
      } yield (a, b, lev(a, b))).toSet
      assert(got == want && want.nonEmpty,
        s"trial $trial maxDist=$maxDist mismatch: " +
          s"missing=${want -- got} extra=${got -- want}")
    }
  }

  test("broadcastJoin produces a BroadcastHashJoin plan") {
    val big = spark.range(1000).toDF("id")
    val small = Seq((1L, "one"), (2L, "two")).toDF("id", "name")
    val joined = Joins.broadcastJoin(big, small, big("id") === small("id"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(joined.count() == 2)
  }

  test("hybridSkewJoin tolerates inputs that already carry a __hot column") {
    import spark.implicits._
    val fact = Seq((1L, 10, "yes"), (1L, 11, "yes"), (2L, 20, "no"))
      .toDF("k", "seq", "__hot")
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("k", "label")
    val got = Joins.hybridSkewJoin(fact, dim, "k", fanout = 2,
      saltBy = Seq(col("k"), col("seq")), hotThreshold = 1L)
    assert(got.count() == 3)
    // the user's __hot column survives untouched
    assert(got.columns.count(_ == "__hot") == 1)
    assert(got.filter(col("__hot") === "yes").count() == 2)
  }

  test("intervalJoin: inclusive bounds, bucket boundaries, equi-join plan") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 11L, 200L), (2L, 20L, 100L))
      .toDF("k", "lid", "lts")
    val r = Seq((1L, 30L, 100L), (1L, 31L, 105L), (1L, 32L, 110L),
      (1L, 33L, 111L), (2L, 40L, 111L)).toDF("k", "rid", "rts")
    // window [lts+5, lts+10]: boundary hits at exactly +5 and +10 must
    // both survive (inclusive), +11 must not; keys never cross
    val got = Joins.intervalJoin(l, r, "k", "lts", "rts", 5L, 10L)
      .select("lid_l", "rid_r").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 31L), (10L, 32L)), got.toString)
    // agrees with the naive theta join on random data (incl. rows
    // straddling bucket boundaries: width = span = 6)
    val rnd = new scala.util.Random(7)
    val la = (1 to 200).map(i => (rnd.nextInt(5).toLong, i.toLong,
      rnd.nextInt(100).toLong)).toDF("k", "lid", "lts")
    val ra = (1 to 200).map(i => (rnd.nextInt(5).toLong, i.toLong + 1000,
      rnd.nextInt(100).toLong)).toDF("k", "rid", "rts")
    val banded = Joins.intervalJoin(la, ra, "k", "lts", "rts", 3L, 8L)
      .select("lid_l", "rid_r").as[(Long, Long)].collect().toSet
    val naive = la.join(ra, la("k") === ra("k") &&
        ra("rts") >= la("lts") + 3 && ra("rts") <= la("lts") + 8)
      .select(la("lid"), ra("rid")).as[(Long, Long)].collect().toSet
    assert(banded == naive,
      s"missing=${(naive -- banded).take(5)} extra=${(banded -- naive).take(5)}")
    // the plan is a hash equi-join — never a BNLJ / cartesian product
    val plan = Joins.intervalJoin(la, ra, "k", "lts", "rts", 3L, 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // negative lower bound: window straddles the anchor [lts-4, lts+4]
    // (floor division must round toward -inf for negative bucket ids)
    val banded2 = Joins.intervalJoin(la, ra, "k", "lts", "rts", -4L, 4L)
      .select("lid_l", "rid_r").as[(Long, Long)].collect().toSet
    val naive2 = la.join(ra, la("k") === ra("k") &&
        ra("rts") >= la("lts") - 4 && ra("rts") <= la("lts") + 4)
      .select(la("lid"), ra("rid")).as[(Long, Long)].collect().toSet
    assert(banded2 == naive2,
      s"missing=${(naive2 -- banded2).take(5)} extra=${(banded2 -- naive2).take(5)}")
  }

  test("intervalJoin: exact bucketing beyond 2^53; tsCol==key rejected") {
    import spark.implicits._
    // timestamps past 2^53 where double division is inexact: a
    // boundary row one unit inside the window must still pair (the old
    // floor(double/…) could mis-bucket it and silently drop the pair)
    val base = (1L << 60) + 1234567L
    val l = Seq((1L, 1L, base)).toDF("k", "lid", "lts")
    val r = Seq((1L, 10L, base + 5L), (1L, 11L, base + 10L),
      (1L, 12L, base + 11L)).toDF("k", "rid", "rts")
    val got = Joins.intervalJoin(l, r, "k", "lts", "rts", 5L, 10L)
      .select("lid_l", "rid_r").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L)), got.toString)
    // ts column sharing the key name would make the _l rename
    // unresolvable — fail by name up front
    val err = intercept[IllegalArgumentException] {
      Joins.intervalJoin(l, r, "k", "k", "rts", 0L, 1L)
    }
    assert(err.getMessage.contains("must differ from key"))
  }
}
