package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

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
}
