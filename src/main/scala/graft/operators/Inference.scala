package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Batched model inference over DataFrame columns — Beam's RunInference.
  *
  * Reference: sdks/python/apache_beam/ml/inference/base.py:171
  * (`ModelHandler`: load_model once per worker, run_inference per batch)
  * — the contract that keeps model weights off the per-row path and
  * amortizes invocation over batches.
  *
  * Spark mapping: `mapPartitions` with (1) the model loaded once per
  * partition (Beam: per-bundle setup), (2) rows processed in fixed-size
  * batches (`grouped`), (3) lazy iteration — constant memory regardless
  * of partition size. Model weights travel to executors via closure
  * capture (≈ broadcast for small models; a real deployment would load
  * from a model registry path inside `loadModel`).
  *
  * The demo model is a deterministic linear scorer so the DuckDB oracle
  * can verify the full batched-execution path bit-for-bit; swapping in
  * an ONNX/JNI model changes only the ModelHandler implementation.
  */
object Inference {

  /** Beam ModelHandler contract: load once, score in batches. */
  trait ModelHandler[M] extends Serializable {
    def loadModel(): M
    def runInference(model: M, batch: Seq[Array[Float]]): Seq[Double]
  }

  /** Deterministic logistic scorer: sigmoid(w·x) with splitmix-derived
    * weights — a stand-in for real model weights, reproducible in SQL. */
  final class LinearScorer(dim: Int) extends ModelHandler[Array[Double]] {
    override def loadModel(): Array[Double] = weights(dim).toArray
    override def runInference(model: Array[Double],
        batch: Seq[Array[Float]]): Seq[Double] =
      batch.map { v =>
        var z = 0.0
        var i = 0
        val n = math.min(v.length, model.length)
        while (i < n) { z += v(i).toDouble * model(i); i += 1 }
        1.0 / (1.0 + math.exp(-z))
      }
  }

  /** Plan-time weight constants (shared with the SQL oracle). */
  def weights(dim: Int): Seq[Double] =
    (0 until dim).map(i => ((((i + 1).toLong * 0x9E3779B97F4A7C15L) >>> 40) % 1000L) / 1000.0 - 0.5)

  /** Per-key variant of the demo scorer: the shared weight vector
    * scaled by a key-derived factor, so every key owns a DISTINCT model
    * object whose scores the SQL oracle can still replay bit-for-bit
    * (`x * (w * scale)` in both engines). */
  final class ScaledLinearScorer(dim: Int, scale: Double)
      extends ModelHandler[Array[Double]] {
    override def loadModel(): Array[Double] =
      weights(dim).map(_ * scale).toArray
    override def runInference(model: Array[Double],
        batch: Seq[Array[Float]]): Seq[Double] =
      batch.map { v =>
        var z = 0.0
        var i = 0
        val n = math.min(v.length, model.length)
        while (i < n) { z += v(i).toDouble * model(i); i += 1 }
        1.0 / (1.0 + math.exp(-z))
      }
  }

  /** Per-key model routing — Beam's KeyedModelHandler
    * (ml/inference/base.py:677 `KeyedModelHandler`, with
    * base.py:750 `max_models_per_worker_hint`): examples are (key,
    * value) pairs, each key scores under ITS OWN model, and a worker
    * holds at most `maxModelsPerWorker` models in memory at once,
    * evicting least-recently-used ones (Beam's multi_process_shared
    * slot eviction).
    *
    * Spark mapping: `mapPartitions` with a per-partition LRU
    * (access-ordered LinkedHashMap, capped) from key to loaded model.
    * Rows are processed in fixed-size batches; within a batch rows are
    * sub-grouped by key so each key's model scores one contiguous
    * sub-batch (Beam batches per key the same way), and outputs are
    * re-emitted in input order. Eviction + lazy reload keeps executor
    * memory bounded by `maxModelsPerWorker` × model size regardless of
    * key cardinality — the 100 TB story for thousands of per-tenant
    * models.
    */
  def runInferencePerKey[M](df: DataFrame, keyCol: String, vecCol: String,
      scoreCol: String, handlerFor: Any => ModelHandler[M],
      batchSize: Int = 128, maxModelsPerWorker: Int = 8): DataFrame = {
    require(maxModelsPerWorker > 0, "maxModelsPerWorker must be positive")
    val outSchema = StructType(df.schema.fields :+
      StructField(scoreCol, DoubleType, nullable = true))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val vecIdx = df.schema.fieldIndex(vecCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // Access-ordered LRU: get() refreshes recency; insertion past the
      // cap evicts the least-recently-used entry (Beam's worker hint).
      // The HANDLER is cached alongside its loaded model — handlerFor
      // may itself be expensive (registry lookup, config parse), and the
      // max_models_per_worker contract it mirrors amortizes both.
      val cache =
        new java.util.LinkedHashMap[Any, (ModelHandler[M], M)](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[Any, (ModelHandler[M], M)]): Boolean =
            size() > maxModelsPerWorker
        }
      def handlerModelFor(key: Any): (ModelHandler[M], M) = {
        val hit = cache.get(key)
        if (hit != null) hit
        else {
          val h = handlerFor(key)
          val entry = (h, h.loadModel())
          cache.put(key, entry)
          entry
        }
      }
      rows.grouped(batchSize).flatMap { batch =>
        // null until scored: a null input vector stays a NULL score (a
        // 0.5 sigmoid would mask missing data as a plausible result).
        val scores = new Array[java.lang.Double](batch.length)
        batch.zipWithIndex.groupBy(_._1.get(keyIdx)).foreach {
          case (key, group) =>
            val present = group.flatMap { case (r, i) =>
              r.get(vecIdx) match {
                case null => None
                case s: scala.collection.Seq[_] =>
                  Some((s.map(_.asInstanceOf[Float]).toArray, i))
                case a: Array[Float] => Some((a, i))
              }
            }
            if (present.nonEmpty) {
              val (handler, model) = handlerModelFor(key)
              val out = handler.runInference(model, present.map(_._1))
              require(out.size == present.size,
                s"ModelHandler returned ${out.size} scores for ${present.size} inputs (key=$key)")
              present.lazyZip(out).foreach { case ((_, i), sc) =>
                scores(i) = sc
              }
            }
        }
        batch.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ scores(i))
        }
      }
    }(enc)
  }

  /** Model HOT-SWAP for streaming inference — Beam's RunInference
    * auto-update contract (reference: ml/inference/base.py:1383
    * `model_metadata_pcoll` + ml/inference/utils.py WatchFilePattern):
    * a side channel names the current model version and the running
    * pipeline swaps to it WITHOUT a restart.
    *
    * Spark mapping: the micro-batch is the natural swap boundary.
    * `foreachBatch` calls `resolve()` on the driver at the start of
    * every batch — typically reading a tiny version/manifest file (the
    * WatchFilePattern analog) — and the returned handler ships to
    * executors with that batch's tasks, loading once per partition as
    * in batch inference. Rows inside one micro-batch therefore always
    * score under ONE model version (Beam gives the same guarantee
    * per-bundle), and a version bump takes effect on the next batch.
    * At scale the resolve is O(1) driver work per batch; weights load
    * per executor, not per row.
    *
    * @param resolve driver-side model resolution, invoked once per
    *                micro-batch (read version file → build handler)
    * @param sink    where each scored micro-batch lands (idempotent
    *                writes keyed on batchId give exactly-once)
    */
  def runInferenceStreamWithReload[M](stream: DataFrame, vecCol: String,
      scoreCol: String, resolve: () => ModelHandler[M],
      sink: (DataFrame, Long) => Unit, batchSize: Int = 128)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(runInference(batch, vecCol, scoreCol, resolve(), batchSize),
        batchId)
    }

  /** Score `vecCol` (array<float>) into `scoreCol` (double) via batched
    * inference. */
  def runInference[M](df: DataFrame, vecCol: String, scoreCol: String,
      handler: ModelHandler[M], batchSize: Int = 128): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(scoreCol, DoubleType, nullable = true))
    val vecIdx = df.schema.fieldIndex(vecCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val model = handler.loadModel() // once per partition (per-bundle)
      rows.grouped(batchSize).flatMap { batch =>
        // null vectors keep a NULL score (not sigmoid(0)); a handler
        // returning a short batch fails fast instead of leaving
        // defaults in place.
        val scores = new Array[java.lang.Double](batch.length)
        val present = batch.zipWithIndex.flatMap { case (r, i) =>
          r.get(vecIdx) match {
            case null => None
            case s: scala.collection.Seq[_] =>
              Some((s.map(_.asInstanceOf[Float]).toArray, i))
            case a: Array[Float] => Some((a, i))
          }
        }
        if (present.nonEmpty) {
          val out = handler.runInference(model, present.map(_._1))
          require(out.size == present.size,
            s"ModelHandler returned ${out.size} scores for ${present.size} inputs")
          present.lazyZip(out).foreach { case ((_, i), sc) => scores(i) = sc }
        }
        batch.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ scores(i))
        }
      }
    }(enc)
  }
}
