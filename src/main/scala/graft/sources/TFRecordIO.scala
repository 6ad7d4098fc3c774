package graft.sources

import java.io.{DataInputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.col

/** TFRecord IO — the training-data container format Beam ships as
  * `TFRecordIO` (reference: sdks/java/core/src/main/java/org/apache/
  * beam/sdk/io/TFRecordIO.java:659-720) and Spark has no native source
  * for. Public framing (TensorFlow record format): each record is
  *
  *   uint64 length (little-endian)
  *   uint32 masked CRC32C of the 8 length bytes
  *   byte   data[length]
  *   uint32 masked CRC32C of data
  *
  * with mask(crc) = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  * (TFRecordIO.java:664). CRC32C comes from the JDK (java.util.zip
  * .CRC32C) — no extra dependencies.
  *
  * Scale shape: write emits ONE file per partition via the Hadoop
  * filesystem API (deterministic names — task retries overwrite, so
  * speculation is safe); read streams each file through a lazy
  * record iterator (constant memory however large the file), with
  * files distributed across tasks by `binaryFiles`. Both sides
  * validate the CRCs — a corrupt record fails fast with an offset
  * message rather than feeding garbage downstream.
  */
object TFRecordIO {

  private def crc32c(bytes: Array[Byte], len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, 0, len)
    c.getValue.toInt
  }

  /** TFRecord CRC mask (TFRecordIO.java:664). */
  private def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  /** Frame one record: header (length + masked length-CRC), data,
    * footer (masked data-CRC). */
  def encodeRecord(data: Array[Byte]): Array[Byte] = {
    // a deep NPE from a dirty null row is undebuggable at scale —
    // name the contract instead (filter nulls before writing)
    require(data != null, "TFRecord payload must not be null")
    val buf = ByteBuffer.allocate(12 + data.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    buf.put(lenBytes)
    buf.putInt(mask(crc32c(lenBytes, 8)))
    buf.put(data)
    buf.putInt(mask(crc32c(data, data.length)))
    buf.array()
  }

  /** Lazy record iterator over a framed stream; validates both CRCs
    * and fails fast on corruption. `maxRecordBytes` bounds a single
    * allocation against corrupt/hostile length headers. */
  def decodeStream(in: DataInputStream,
      maxRecordBytes: Int = 256 << 20): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = _
      private var done = false
      private var offset = 0L

      private def advance(): Unit = {
        val header = new Array[Byte](12)
        val first = try { in.readFully(header, 0, 1); 1 }
        catch { case _: EOFException => done = true; 0 }
        if (done) return
        in.readFully(header, 1, 11)
        val hb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
        val len = hb.getLong
        val lenCrc = hb.getInt
        require(mask(crc32c(header, 8)) == lenCrc,
          s"TFRecord length CRC mismatch at offset $offset")
        require(len >= 0 && len <= maxRecordBytes,
          s"TFRecord length $len out of bounds at offset $offset")
        val data = new Array[Byte](len.toInt)
        in.readFully(data)
        val footer = new Array[Byte](4)
        in.readFully(footer)
        val dataCrc = ByteBuffer.wrap(footer).order(ByteOrder.LITTLE_ENDIAN).getInt
        require(mask(crc32c(data, data.length)) == dataCrc,
          s"TFRecord data CRC mismatch at offset $offset")
        offset += 12 + len + 4
        nextRec = data
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** Write `binCol` (binary) as TFRecord files under `dir`, one file
    * per partition. Deterministic part names make task retries and
    * speculative attempts idempotent (last writer wins with identical
    * bytes). */
  def write(df: DataFrame, binCol: String, dir: String): Unit = {
    // the SESSION's Hadoop conf rides into the closure: spark.hadoop.*
    // settings (object-store credentials, defaultFS) must reach the
    // executor-side filesystem resolution, same as Manifest does
    val conf = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    val ds = df.select(col(binCol)).map(r =>
      r.getAs[Array[Byte]](0))(Encoders.BINARY)
    ds.foreachPartition { (it: Iterator[Array[Byte]]) =>
      val pid = TaskContext.getPartitionId()
      val path = new Path(dir, f"part-$pid%05d.tfrecord")
      val fs = path.getFileSystem(conf.value)
      val out = fs.create(path, true)
      try it.foreach(rec => out.write(encodeRecord(rec)))
      finally out.close()
    }
  }

  /** Read TFRecord files under `dir` into a one-column (`record`
    * binary) DataFrame; decoding streams lazily per file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(s"$dir/*.tfrecord")
      .flatMap { case (_, pds) =>
        val in = new DataInputStream(pds.open())
        // partial consumption (limit/take/task failure) must not leak
        // the stream — close at task end, not only on full drain
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        decodeStream(in)
      }
      .toDF("record")
  }
}
