package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{StructField, StructType}

/** Per-row external-lookup enrichment — Beam's `Enrichment` transform /
  * `BeamSqlSeekableTable` lookup join.
  *
  * Reference: sdks/python/apache_beam/transforms/enrichment.py:103
  * (EnrichmentSourceHandler:84 — per-bundle client lifecycle, per-row
  * lookup with caching) and the SQL seekable-table path
  * (extensions/sql/.../rel/BeamSideInputLookupJoinRel.java:61,
  * impl/transform/BeamJoinTransforms.java:99 JoinAsLookup).
  *
  * Spark mapping: `mapPartitions` IS the DoFn lifecycle — client opened
  * at partition start (setup), closed by a task-completion listener
  * (teardown — fires on success, partial consumption, and failure
  * alike), one in-process cache per partition. The lookup itself
  * stays out of the shuffle path entirely: no exchange, no broadcast of
  * the main input, linear scan — the only shape that works when the
  * "table" is a remote service and the main input is 100 TB.
  *
  * When the lookup source IS materializable, prefer a broadcast join
  * ([[Joins.broadcastJoin]]); this operator is for point-lookup sources
  * (KV stores, feature stores, REST services) that cannot be scanned.
  */
object Enrichment {

  /** A seekable external source: opened per partition, closed after.
    * Implementations wrap real clients (JDBC, Redis, feature store); the
    * test/demo implementation wraps a broadcast map. */
  trait LookupClient extends AutoCloseable {
    def lookup(key: Any): Option[Any]
  }

  /** Enrich `df` with `valueField` = client.lookup(keyCol). Rows with no
    * match get null (LEFT-join semantics — Beam's Enrichment default).
    *
    * @param clientFactory constructed once per partition on the executor
    *                      (must be serializable-closure-safe)
    */
  def enrich(df: DataFrame, keyCol: String, valueField: StructField,
      clientFactory: () => LookupClient): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ valueField)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val client = clientFactory() // DoFn.setup
      // DoFn.teardown: the task-completion listener runs whether the
      // iterator is fully drained, partially consumed (limit), or the
      // task fails mid-partition — the `closed` flag keeps it idempotent.
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; client.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ client.lookup(r.get(keyIdx)).orNull)
      }
    }(enc)
  }

  /** Demo client: an in-memory map standing in for a remote KV store.
    * Real deployments replace this with a connection-holding client. */
  final class MapClient(map: Map[Any, Any]) extends LookupClient {
    override def lookup(key: Any): Option[Any] = map.get(key)
    override def close(): Unit = ()
  }
}
