package graft

import org.apache.spark.sql.functions._
import graft.operators.{Joins, Relational, Windowing}

/** Seeded randomized properties: each operator checked against a naive
  * driver-side reference on pseudo-random instances (PAssert-style
  * order-insensitive compare; fixed seeds keep runs reproducible).
  * ScalaTest-only (the scalatest↔scalacheck bridge artifact isn't in
  * the offline cache), so these are explicit seeded trials — same
  * falsification power on this instance space, deterministic CI. */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin == naive last-right-at-or-before scan on random instances") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val nKeys = 4
      val left = Seq.fill(120)((rnd.nextInt(nKeys).toLong,
        rnd.nextInt(500).toLong, rnd.nextInt(1000).toLong))
      // rights get UNIQUE (k, ts) pairs: equal-timestamp rights have no
      // deterministic winner in either engine or reference
      val right = rnd.shuffle(
        (0 until nKeys).flatMap(k => (0 until 500).map(ts => (k.toLong, ts.toLong))))
        .take(60).map { case (k, ts) => (k, ts, rnd.nextDouble()) }
      val lDf = left.toDF("k", "ts", "lval")
      val rDf = right.toDF("k", "ts", "rval")
      val got = Joins.asOfJoin(lDf, rDf, "k", "ts",
        leftCols = Seq("lval"), valueCols = Seq("rval"))
        .select("k", "ts", "lval", "r_rval")
        .as[(Long, Long, Long, Option[Double])].collect().toSeq
        .sortBy(t => (t._1, t._2, t._3))
      // naive reference: for each left row, the latest right row at or
      // before its timestamp for the same key
      val byKey = right.groupBy(_._1)
      val want = left.map { case (k, ts, lv) =>
        val cand = byKey.getOrElse(k, Seq.empty).filter(_._2 <= ts)
        val rv = if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3)
        (k, ts, lv, rv)
      }.sortBy(t => (t._1, t._2, t._3))
      assert(got == want, s"trial $trial asOfJoin mismatch")
    }
  }

  test("mergeIntervals == naive interval merge on random instances") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val rows = Seq.fill(150) {
        val k = rnd.nextInt(3).toLong
        val s = rnd.nextInt(300).toLong
        (k, s, s + 1 + rnd.nextInt(20).toLong)
      }
      val got = Windowing.mergeIntervals(rows.toDF("k", "s", "e"),
        Seq(col("k")), col("s"), col("e"))
        .select("k", "win_start", "win_end", "n_rows")
        .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
      // naive: sort by (start, end), chain-merge while start <= max end
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val sorted = rs.map(r => (r._2, r._3)).sortBy(identity)
        val acc = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        sorted.foreach { case (s, e) =>
          if (acc.nonEmpty && s <= acc.last._2)
            acc(acc.size - 1) = (acc.last._1, math.max(acc.last._2, e),
              acc.last._3 + 1)
          else acc += ((s, e, 1L))
        }
        acc.map(a => (k, a._1, a._2, a._3))
      }.sortBy(t => (t._1, t._2))
      assert(got == want, s"trial $trial mergeIntervals mismatch")
    }
  }

  test("saltedAgg == direct aggregation on random skewed instances") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      // zipf-ish skew: 80% of rows land on one hot key
      val rows = Seq.fill(500) {
        val k = if (rnd.nextInt(10) < 8) 0L else rnd.nextInt(5).toLong
        (k, rnd.nextInt(1000).toLong)
      }
      val df = rows.toDF("k", "v")
      val got = Relational.saltedAgg(df, Seq(col("k")), fanout = 8,
        stage1Aggs = Seq(sum("v").as("s"), count(lit(1)).as("c")),
        stage2Aggs = Seq(sum("s").as("sum_v"), sum("c").as("n")))
        .select("k", "sum_v", "n")
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      val want = rows.groupBy(_._1).toSeq.map { case (k, rs) =>
        (k, rs.map(_._2).sum, rs.size.toLong)
      }.sortBy(_._1)
      assert(got == want, s"trial $trial saltedAgg mismatch")
    }
  }
}
