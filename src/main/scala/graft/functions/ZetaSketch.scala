package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HLL++ sketches in the ZETASKETCH WIRE LAYOUT — the
  * BigQuery-interchange gap the reference closes with
  * `HllCount` (sdks/java/extensions/zetasketch/.../HllCount.java:45-79
  * — "HLL++ sketches ... compatible with Google Cloud BigQuery"; the
  * coder wraps `HyperLogLogPlusPlus.serializeToByteArray`,
  * HyperLogLogPlusPlusCoder.java:38).
  *
  * Wire layout (the PUBLIC zetasketch protobufs — aggregator.proto's
  * `AggregatorStateProto` and hllplus-unique.proto's
  * `HyperLogLogPlusUniqueStateProto`), hand-framed here because no
  * proto compiler or zetasketch jar exists in this container:
  *
  *   AggregatorStateProto:
  *     1 (varint) type                 = 112 (HYPERLOGLOG_PLUS_UNIQUE)
  *     2 (varint) num_values           (total inputs, duplicates incl.)
  *     3 (varint) encoding_version     = 2
  *     112 (msg)  hyperloglogplus_unique_state:
  *       3 (varint) precision_or_num_buckets         (p)
  *       5 (bytes)  data                 (2^p dense register bytes)
  *
  * Always-dense encoding (zetasketch readers upgrade sparse→dense, so
  * a dense writer is universally readable; the sparse encoding is a
  * size optimization this writer skips). HONEST LIMIT, documented in
  * SURVEY §2: byte-level interchange with BigQuery ALSO requires
  * zetasketch's exact input hash (its fingerprint family) and its
  * empirical bias-correction table; neither is verifiable in this
  * container (no jar, no published byte vectors on disk), so the
  * register values here come from the repo's portable md5 hash family
  * — sketches are self-interchangeable (build/merge/read across graft
  * jobs, spec'd byte-exact) and FORMAT-compatible, while cross-system
  * register equality remains environment-limited. The format layer —
  * proto framing, dense register layout, merge = per-register max +
  * num_values sum — is spec'd byte-for-byte against hand-framed
  * expected messages (ZetaSketchSpec).
  *
  * Scale: per-group state is 2^p bytes (16 KiB at the BigQuery
  * default p=15... p=14 here) regardless of input size; partials
  * merge associatively (map-side combine), and rollups over stored
  * sketches never rescan rows — the MergePartial contract
  * (HllCount.MergePartial, HllCount.java:279).
  */
object ZetaFormat {

  val TypeHllPlusUnique = 112
  val EncodingVersion = 2

  // --- protobuf primitives (wire types: 0 = varint, 2 = length-delim)
  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def tag(field: Int, wire: Int): Long = (field.toLong << 3) | wire

  final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
  }

  /** Sketch state: (numValues, precision, dense registers[2^p]). */
  final case class State(var numValues: Long, p: Int, regs: Array[Byte])

  def emptyState(p: Int): State = State(0L, p, new Array[Byte](1 << p))

  def encode(st: State): Array[Byte] = {
    val inner = new java.io.ByteArrayOutputStream()
    writeVarint(inner, tag(3, 0)); writeVarint(inner, st.p.toLong)
    writeVarint(inner, tag(5, 2)); writeVarint(inner, st.regs.length.toLong)
    inner.write(st.regs, 0, st.regs.length)
    val innerBytes = inner.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    writeVarint(out, tag(1, 0)); writeVarint(out, TypeHllPlusUnique.toLong)
    writeVarint(out, tag(2, 0)); writeVarint(out, st.numValues)
    writeVarint(out, tag(3, 0)); writeVarint(out, EncodingVersion.toLong)
    writeVarint(out, tag(112, 2)); writeVarint(out, innerBytes.length.toLong)
    out.write(innerBytes, 0, innerBytes.length)
    out.toByteArray
  }

  /** Parse; returns (type, encodingVersion, state). Unknown fields are
    * skipped by wire type (a real zetasketch message may carry
    * value_type or sparse fields this reader tolerates; sparse data is
    * rejected loudly rather than misread). */
  def decode(bytes: Array[Byte]): (Int, Int, State) = {
    var typ = -1; var ver = -1; var numValues = 0L
    var p = -1; var regs: Array[Byte] = null
    val r = new Reader(bytes)
    while (r.hasMore) {
      val t = r.readVarint()
      val field = (t >>> 3).toInt
      (field, (t & 7).toInt) match {
        case (1, 0) => typ = r.readVarint().toInt
        case (2, 0) => numValues = r.readVarint()
        case (3, 0) => ver = r.readVarint().toInt
        case (112, 2) =>
          val ir = new Reader(r.readBytes())
          while (ir.hasMore) {
            val it = ir.readVarint()
            (( it >>> 3).toInt, (it & 7).toInt) match {
              case (3, 0) => p = ir.readVarint().toInt
              case (5, 2) => regs = ir.readBytes()
              case (6, 2) => throw new IllegalArgumentException(
                "zetasketch sparse_data encoding not supported — " +
                  "re-encode dense (this writer always emits dense)")
              case (_, 0) => ir.readVarint(); ()
              case (_, 2) => ir.readBytes(); ()
              case other => throw new IllegalArgumentException(
                s"unsupported wire type in hll state: $other")
            }
          }
        case (_, 0) => r.readVarint(); ()
        case (_, 2) => r.readBytes(); ()
        case other => throw new IllegalArgumentException(
          s"unsupported wire type in aggregator state: $other")
      }
    }
    require(typ == TypeHllPlusUnique,
      s"not a HYPERLOGLOG_PLUS_UNIQUE aggregator state (type=$typ)")
    require(regs != null && p >= 4 && regs.length == (1 << p),
      s"malformed dense hll state: p=$p len=${if (regs == null) -1 else regs.length}")
    (typ, ver, State(numValues, p, regs))
  }

  /** 64-bit input hash: first 8 bytes of MD5, big-endian — the repo's
    * portable hash family (NOT zetasketch's fingerprint; see scaladoc). */
  def hash64(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  def add(st: State, h: Long): Unit = {
    st.numValues += 1
    val idx = (h >>> (64 - st.p)).toInt
    val rest = h << st.p
    val rho = (if (rest == 0) 64 - st.p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rho > st.regs(idx)) st.regs(idx) = rho.toByte
  }

  def merge(a: State, b: State): Unit = {
    require(a.p == b.p, s"precision mismatch: ${a.p} vs ${b.p}")
    a.numValues += b.numValues
    var i = 0
    while (i < a.regs.length) {
      if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
      i += 1
    }
  }

  /** Standard HLL++ estimate with small-range linear counting; no
    * empirical bias table (documented — zetasketch applies one in the
    * mid range, so estimates can differ there by its correction). */
  def estimate(st: State): Double = {
    val m = st.regs.length.toDouble
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < st.regs.length) {
      invSum += java.lang.Math.pow(2.0, -st.regs(i).toDouble)
      if (st.regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / invSum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }
}

/** `zeta_hll_agg(value, p)` — build a zetasketch-layout HLL++ sketch
  * from string values. */
case class ZetaHllAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ZetaFormat.State] {
  require(p >= 4 && p <= 18, s"precision out of range: $p")

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "zeta_hll_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zeta_hll_agg requires string, got ${other.sql}")
  }

  override def createAggregationBuffer(): ZetaFormat.State =
    ZetaFormat.emptyState(p)

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: ZetaFormat.State, input: InternalRow): ZetaFormat.State = {
    val v = child.eval(input)
    if (v != null)
      ZetaFormat.add(buf, ZetaFormat.hash64(md, v.asInstanceOf[UTF8String].getBytes))
    buf
  }

  override def merge(buf: ZetaFormat.State, other: ZetaFormat.State): ZetaFormat.State = {
    ZetaFormat.merge(buf, other); buf
  }

  override def eval(buf: ZetaFormat.State): Any = ZetaFormat.encode(buf)

  override def serialize(buf: ZetaFormat.State): Array[Byte] =
    ZetaFormat.encode(buf)
  override def deserialize(bytes: Array[Byte]): ZetaFormat.State =
    ZetaFormat.decode(bytes)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): ZetaHllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ZetaHllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZetaHllAgg =
    copy(child = newChildren.head)
}

/** `zeta_hll_merge_agg(sketch)` — roll up stored zetasketch-layout
  * sketches (HllCount.MergePartial, HllCount.java:279): per-register
  * max, num_values sum; a decode → merge → re-encode round-trip by
  * construction. */
case class ZetaHllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ZetaFormat.State] {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "zeta_hll_merge_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zeta_hll_merge_agg requires binary, got ${other.sql}")
  }

  // empty marker until the first sketch arrives (p comes from input)
  override def createAggregationBuffer(): ZetaFormat.State =
    ZetaFormat.State(-1L, 0, Array.emptyByteArray)

  private def mergeInto(buf: ZetaFormat.State,
      other: ZetaFormat.State): ZetaFormat.State =
    if (buf.numValues < 0) other
    else { ZetaFormat.merge(buf, other); buf }

  override def update(buf: ZetaFormat.State, input: InternalRow): ZetaFormat.State = {
    val v = child.eval(input)
    if (v == null) buf
    else mergeInto(buf, ZetaFormat.decode(v.asInstanceOf[Array[Byte]])._3)
  }

  override def merge(buf: ZetaFormat.State, other: ZetaFormat.State): ZetaFormat.State =
    if (other.numValues < 0) buf else mergeInto(buf, other)

  override def eval(buf: ZetaFormat.State): Any =
    ZetaFormat.encode(if (buf.numValues < 0) ZetaFormat.emptyState(14) else buf)

  override def serialize(buf: ZetaFormat.State): Array[Byte] =
    if (buf.numValues < 0) Array.emptyByteArray else ZetaFormat.encode(buf)
  override def deserialize(bytes: Array[Byte]): ZetaFormat.State =
    if (bytes.isEmpty) createAggregationBuffer()
    else ZetaFormat.decode(bytes)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): ZetaHllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ZetaHllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZetaHllMergeAgg =
    copy(child = newChildren.head)
}

/** `zeta_hll_info(sketch)` — decode a zetasketch-layout sketch to
  * `struct(sk_type, encoding_version, precision, num_values,
  * estimate)` (HllCount.Extract's read-out, plus the framing fields an
  * interchange consumer checks). */
case class ZetaHllInfo(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "zeta_hll_info"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("sk_type", IntegerType, nullable = false),
    StructField("encoding_version", IntegerType, nullable = false),
    StructField("precision", IntegerType, nullable = false),
    StructField("num_values", LongType, nullable = false),
    StructField("estimate", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zeta_hll_info requires binary, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val (typ, ver, st) = ZetaFormat.decode(v.asInstanceOf[Array[Byte]])
      InternalRow(typ, ver, st.p, st.numValues,
        math.rint(ZetaFormat.estimate(st)).toLong)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ZetaHllInfo =
    copy(child = newChild)
}
