package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Production packaging of graft's native expressions: inject them at
  * session build time via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so every session — SQL
  * text, Thrift, notebooks — sees `vec_dot`, `minhash_sig`, `simhash`,
  * `srp_buckets`, `countmin_agg`, … without an imperative
  * `GraftFunctions.register` call.
  *
  * This is the `SparkSessionExtensions` integration point the brief's
  * preference ladder names for custom-expression registration; the
  * same hook would carry a `Rule[LogicalPlan]`/`SparkStrategy` if an
  * operator ever needed one (none has — every graft operator lowers to
  * stock Catalyst plans).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.injectInto(ext)
}
