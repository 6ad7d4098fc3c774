package graft.queries

import org.apache.spark.sql.functions._

/** r19 opt guard: [[TextQueries.bm25ScoresMulti]] (one tokenizing
  * corpus scan + one fit for N query term-sets) must replicate the
  * per-set [[TextQueries.bm25Scores]] union EXACTLY — same (query_id,
  * doc_id) rows, same 4-dp scores — including a shared term across
  * sets and a set whose terms miss some docs entirely. */
class Bm25MultiSpec extends graft.SparkSpec {

  test("bm25ScoresMulti == union of per-set bm25Scores, row for row") {
    val termsByQuery = Seq(
      0L -> Seq("data", "query", "spark"),
      250L -> Seq("join", "hash", "stream"),
      // overlaps set 0 on "data": tf/df reuse must not skew scores
      7L -> Seq("data", "stream"))
    val multi = TextQueries.bm25ScoresMulti(spark, sfDir, termsByQuery)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val perSet = termsByQuery.map { case (qid, terms) =>
      TextQueries.bm25Scores(spark, sfDir, terms)
        .select(lit(qid).as("query_id"), col("doc_id"), col("bm25"))
    }.reduce(_ unionByName _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(multi == perSet,
      s"multi=${multi.size} rows, perSet=${perSet.size}; " +
        s"onlyMulti=${(multi -- perSet).take(3)} onlyPer=${(perSet -- multi).take(3)}")
    assert(multi.nonEmpty)
  }
}
