package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched per-partition
  * passes.
  *
  * Beam analog: the multimodal embedding path
  * (reference: sdks/python/apache_beam/ml/transforms/base.py:666-813
  * _ImageEmbeddingHandler / _MultiModalEmbeddingHandler) and
  * RunInference batching (ml/inference/base.py:171) — bytes flow through
  * the pipeline as opaque payloads; decode/feature-extraction happens in
  * batched user fns against a per-bundle model/codec.
  *
  * The Spark-side plumbing here is real and tested: binary columns,
  * struct metadata schema, batched `mapPartitions` with per-partition
  * codec lifecycle, explode-based frame sampling. The DECODE ITSELF IS A
  * STUB (this container has no image/audio libraries): `StubCodec`
  * derives deterministic pseudo-metadata from the bytes. A real
  * deployment swaps `StubCodec` for e.g. a javacv/ImageIO codec — the
  * operator shape (schema, batching, partitioning) does not change.
  */
object Multimodal {

  /** Typed metadata produced by media decode. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Decode interface: batched, per-partition lifecycle. */
  trait MediaCodec extends AutoCloseable {
    /** Decode a batch of payloads to (n_bytes, format, width, height, n_frames). */
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[(Long, String, Int, Int, Int)]
  }

  /** STUB decoder: deterministic pseudo-metadata from byte length — the
    * real decode (??? in a library sense) is not runnable here. Keeps
    * every value reproducible by the SQL oracle (pure f(n_bytes)). */
  final class StubCodec extends MediaCodec {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[(Long, String, Int, Int, Int)] =
      payloads.map { b =>
        val n = b.length.toLong
        val fmt = (n % 3) match {
          case 0 => "png"
          case 1 => "jpeg"
          case _ => "webp"
        }
        (n, fmt, (n % 640).toInt + 16, (n % 480).toInt + 16, (n % 24).toInt + 1)
      }
    override def close(): Unit = ()
  }

  /** Attach an opaque binary payload column derived from a string column
    * (UTF-8 bytes). In production the payload arrives from the source
    * (parquet/binary files); this adapter exists because the synthetic
    * testdata has no binary columns. */
  def withPayload(df: DataFrame, textCol: String, payloadCol: String): DataFrame =
    df.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /** Batched decode: payload binary → `metaCol` struct (MediaMetaType).
    * Batches of `batchSize` rows amortize codec invocation — the
    * RunInference batch shape — while the iterator stays lazy (no
    * partition-wide materialization). */
  def decodeMeta(df: DataFrame, payloadCol: String, metaCol: String,
      codecFactory: () => MediaCodec = () => new StubCodec,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(metaCol, MediaMetaType, nullable = true))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      val codec = codecFactory() // per-partition setup
      rows.grouped(batchSize).flatMap { batch =>
        // null payloads (dirty corpus rows) never reach the codec —
        // they carry a null meta; decode only the non-null slice
        val payloads = batch.map(_.get(payloadIdx).asInstanceOf[Array[Byte]])
        val metas = codec.decodeBatch(payloads.filter(_ != null)).iterator
        batch.lazyZip(payloads).map { case (r, p) =>
          val meta = if (p == null) null else {
            val (n, f, w, h, nf) = metas.next()
            Row(n, f, w, h, nf)
          }
          Row.fromSeq(r.toSeq :+ meta)
        }
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame index
    * (0, stride, 2·stride, … < n_frames) — video-to-frames as a
    * lateral explode, no shuffle. */
  def sampleFrames(df: DataFrame, metaCol: String, stride: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0), col(s"$metaCol.n_frames") - 1, lit(stride))))
}
