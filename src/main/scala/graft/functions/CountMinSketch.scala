package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a native Catalyst imperative aggregate.
  *
  * Beam analog: `SketchFrequencies`
  * (reference: sdks/java/extensions/sketching/.../SketchFrequencies.java)
  * wraps a library count-min sketch behind a CombineFn
  * (createAccumulator / addInput / mergeAccumulators / extractOutput);
  * `TypedImperativeAggregate` is the exact same contract on Spark
  * (createAggregationBuffer / update / merge / eval) with partial
  * aggregation lifted automatically — each executor folds its partition
  * into a local sketch and only depth×width longs cross the shuffle,
  * regardless of input size. That mergeability is the whole point of the
  * sketch at 100 TB: the exchange is O(1) in the data.
  *
  * Unlike library sketches, the hash family here is the portable
  * md5-affine family shared with MinHash ([[graft.operators.Dedup
  * .affineParams]]), so an external SQL oracle can rebuild the exact
  * counter matrix and verify estimates bit-for-bit.
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "countmin_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"countmin_agg requires string, got ${other.sql}")
  }

  private lazy val aP: Array[Long] =
    (0 until depth).map(i => graft.operators.Dedup.affineParams(i)._1).toArray
  private lazy val bP: Array[Long] =
    (0 until depth).map(i => graft.operators.Dedup.affineParams(i)._2).toArray
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h31 = TextHash.md5Long60(md, v.asInstanceOf[UTF8String].getBytes) % 2147483648L
      var j = 0
      while (j < depth) {
        val bucket = (((aP(j) * h31 + bP(j)) % graft.operators.Dedup.MinHashPrime) % width).toInt
        buf(j * width + bucket) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)
}

/** `countmin_est(sketch, value)` — point-frequency estimate: the minimum
  * counter across the sketch's rows at `value`'s bucket positions
  * (always >= the true count; the classic CMS overestimate bound). */
case class CountMinEstimate(left: Expression, right: Expression,
    depth: Int, width: Int)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"countmin_est requires (array<long>, string), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "countmin_est"

  private lazy val aP: Array[Long] =
    (0 until depth).map(i => graft.operators.Dedup.affineParams(i)._1).toArray
  private lazy val bP: Array[Long] =
    (0 until depth).map(i => graft.operators.Dedup.affineParams(i)._2).toArray
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(sk: Any, v: Any): Any = {
    val sketch = sk.asInstanceOf[ArrayData]
    if (sketch.numElements() != depth * width)
      throw new IllegalArgumentException(
        s"countmin_est: sketch has ${sketch.numElements()} counters but " +
        s"depth=$depth x width=$width expects ${depth * width} — " +
        "estimate parameters must match the countmin_agg that built it")
    val h31 = TextHash.md5Long60(md, v.asInstanceOf[UTF8String].getBytes) % 2147483648L
    var est = Long.MaxValue
    var j = 0
    while (j < depth) {
      val bucket = (((aP(j) * h31 + bP(j)) % graft.operators.Dedup.MinHashPrime) % width).toInt
      val c = sketch.getLong(j * width + bucket)
      if (c < est) est = c
      j += 1
    }
    est
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}
