package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container-file IO — Beam's AvroIO (reference:
  * sdks/java/extensions/avro/.../io/AvroIO.java) re-expressed over the
  * Avro Java library that ships with Spark's jars (`avro-1.12`,
  * `avro-mapred`). The `spark-avro` DataSource connector is NOT in
  * this container, so the format goes through the same
  * one-file-per-partition write / lazy streaming read shape as
  * [[TFRecordIO]]: schema-embedding container files, block-compressed
  * by the Avro codec, each file independently readable — the splittable
  * self-describing format Beam pipelines exchange with Kafka/Hive
  * ecosystems.
  *
  * Type surface: flat schemas of long/int/double/float/boolean/string/
  * binary (nullable via Avro unions) — the interchange subset; nested
  * rows flatten first (SchemaOps.flattenSchema).
  */
object AvroIO {

  /** Spark → Avro record schema (nullable fields become
    * union(null, T)). */
  def avroSchemaFor(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroIO flat-type surface does not cover ${other.sql} " +
            "(flatten nested rows first)")
      }
      val s = if (f.nullable)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** Write one Avro container file per partition under `dir`
    * (deterministic part names — retry/speculation safe).
    * `codec` is any Avro codec name ("snappy", "deflate", "null" —
    * snappy-java ships in Spark's jars). */
  def write(df: DataFrame, dir: String, codec: String = "snappy"): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchemaFor(sparkSchema).toString
    // the SESSION's Hadoop conf rides into the closure: spark.hadoop.*
    // settings (object-store credentials, defaultFS) must reach the
    // executor-side filesystem resolution, same as Manifest does
    val conf = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    df.foreachPartition { (it: Iterator[Row]) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val pid = TaskContext.getPartitionId()
      val path = new Path(dir, f"part-$pid%05d.avro")
      val fs = path.getFileSystem(conf.value)
      val out = fs.create(path, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
      writer.create(schema, out)
      try it.foreach { row =>
        val rec = new GenericData.Record(schema)
        sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = if (row.isNullAt(i)) null else f.dataType match {
            case BinaryType =>
              java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
            case _ => row.get(i).asInstanceOf[AnyRef]
          }
          rec.put(f.name, v)
        }
        writer.append(rec)
      }
      finally writer.close()
    }
  }

  /** Read Avro container files under `dir`; the DataFrame schema comes
    * from the first file's embedded writer schema (self-describing
    * format — no external schema registry needed). Decoding streams
    * lazily per file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(s"$dir/*.avro")
    // driver-side: one file header read to recover the schema; an
    // empty/missing directory fails with a NAMED error, not first()'s
    // opaque "empty collection"
    val head = files.take(1)
    require(head.nonEmpty,
      s"AvroIO.read: no .avro files under '$dir' — wrong path, or the " +
        "write produced nothing")
    val headSchemaJson = {
      val (_, pds) = head(0)
      val in = new DataFileStream[GenericRecord](pds.open(),
        new GenericDatumReader[GenericRecord]())
      try in.getSchema.toString finally in.close()
    }
    val sparkSchema = sparkSchemaFor(
      new Schema.Parser().parse(headSchemaJson))
    val rows = files.flatMap { case (_, pds) =>
      val reader = new DataFileStream[GenericRecord](pds.open(),
        new GenericDatumReader[GenericRecord]())
      // partial consumption (limit/take/task failure) must not leak the
      // stream — close at task end, not only on full drain
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => reader.close()))
      val fields = sparkSchema.fields
      new Iterator[Row] {
        override def hasNext: Boolean = reader.hasNext
        override def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(fields.map { f =>
            rec.get(f.name) match {
              case null => null
              case u: Utf8 => u.toString
              case b: java.nio.ByteBuffer =>
                val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
              case other => other
            }
          }.toSeq)
        }
      }
    }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Avro → Spark schema for the flat interchange subset. */
  def sparkSchemaFor(schema: Schema): StructType = {
    def dt(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"unsupported union $s")
        (dt(nonNull.head)._1, true)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case other => throw new IllegalArgumentException(
        s"AvroIO flat-type surface does not cover $other")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = dt(f.schema())
      StructField(f.name(), t, nullable)
    }.toSeq)
  }
}
