package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench's ONE stdout JSON line against the parsed:null
  * regression (BENCH_r01..r05, r14): the driver captures only the
  * LAST ~2000 chars of stdout, so the line must stay under
  * [[Bench.stdoutLineBudget]] (1600 = 2000 with 20% headroom) no
  * matter how large the headline/streaming suites grow — the scalar
  * fields (`value`, `cal`, `n_queries`) are what bench_diff's host
  * normalization needs and must never be front-truncated away. */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The REAL current suites, with worst-case-width values: batch
    * seconds up to 3 digits before the decimal, streaming ev/s up to
    * 6 digits — wider than anything observed, so the guard holds with
    * margin. */
  private def realLine(): String = {
    val qs = Bench.headline.map(n => n -> 999.99)
    val streamingNames = Seq(
      "streaming_incremental_join", "streaming_winning_bid",
      "streaming_triggered_windows", "streaming_triggered_sessions",
      "streaming_session_agg", "streaming_match_recognize",
      "streaming_gap_flush", "streaming_dedup", "streaming_scd2",
      "streaming_funnel", "streaming_heavy_hitters", "streaming_anomaly",
      "streaming_tdigest", "streaming_approx_distinct",
      "streaming_reservoir", "streaming_heavy_hitters_global",
      "streaming_approx_distinct_global", "streaming_tdigest_global",
      "streaming_reservoir_global", "streaming_topk_global")
    val ss = streamingNames.map(n => n -> 999999.9)
    Bench.stdoutLine(total = 999.999, reps = 3, nQueries = qs.size,
      cal = 99.999, queries = qs, streaming = ss,
      sfDir = "/root/testdata/sf0.1")
  }

  test("stdout line stays under the driver tail-capture budget") {
    val line = realLine()
    assert(line.length <= Bench.stdoutLineBudget,
      s"stdout line ${line.length} chars > budget ${Bench.stdoutLineBudget}" +
        " — the driver's ~2000-char tail capture would front-truncate it" +
        " (the BENCH_r14 parsed:null failure); trim the anchor/streaming" +
        " maps in Bench.stdoutLine")
  }

  test("stdout line is valid JSON with the fields bench_diff needs") {
    val node = mapper.readTree(realLine())
    for (f <- Seq("metric", "value", "unit", "reps", "n_queries", "cal",
        "detail", "queries", "streaming", "sf"))
      assert(node.has(f), s"stdout line missing field $f")
    assert(node.get("value").asDouble() == 999.999)
    assert(node.get("cal").asDouble() == 99.999)
    assert(node.get("n_queries").asInt() == Bench.headline.size)
    // the streaming block is the BASELINE like-for-like side: with
    // today's suite sizes EVERY streaming row must fit (only batch
    // anchors overflow to bench_details.json)
    assert(node.get("streaming").size() == 20,
      s"expected all 20 streaming rows on the stdout line, got " +
        s"${node.get("streaming").size()}")
  }

  test("fill order is priority-preserving and parse survives overflow") {
    // 400 long-named queries: far past any budget — the line must
    // still be valid JSON of bounded length, keeping a PREFIX of the
    // given (priority) order
    val qs = (1 to 400).map(i => f"extremely_long_query_name_number_$i%03d" -> 1.0)
    val line = Bench.stdoutLine(1.0, 3, qs.size, 1.0, qs,
      (1 to 60).map(i => s"streaming_op_with_a_long_name_$i" -> 1.0),
      "/root/testdata/sf0.1")
    assert(line.length <= Bench.stdoutLineBudget)
    val node = mapper.readTree(line)
    val kept = {
      val it = node.get("queries").fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(kept.nonEmpty, "overflow must still keep >= 1 batch anchor")
    assert(kept == qs.map(_._1).take(kept.size),
      "queries block must be a prefix of the priority order")
  }
}
