package graft

import graft.queries.Registry

/** Catch-all conformance: every registered query must run at sf0.001 and
  * produce a resolvable schema; the flagship entry must return rows.
  * (The value-level oracle check is the driver's DuckDB gate, replicated
  * locally by scripts/check_local.py at sf0.01.) */
class RegistrySpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has an oracle or is a documented rows-only op") {
    val rowsOnly = Set("agg_approx_distinct", "vec_ann_lsh", "vec_ann_ivf",
      "agg_approx_quantiles", "agg_hll_sketch")
    val missing = Registry.all.filter(q => q.oracle.isEmpty && !rowsOnly(q.name))
    assert(missing.isEmpty,
      s"queries without oracle SQL: ${missing.map(_.name).mkString(", ")}")
  }

  Registry.all.foreach { q =>
    test(s"query ${q.name} runs at sf0.001") {
      val df = q.fn(spark, sfDir)
      assert(df.schema.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
