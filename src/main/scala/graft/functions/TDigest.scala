package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable t-digest quantile sketch (Dunning & Ertl) as a native
  * Catalyst imperative aggregate.
  *
  * Beam analog: `TDigestQuantiles`
  * (reference: sdks/java/extensions/sketching/.../TDigestQuantiles.java:139
  * — `globally()`/`perKey()` with a `compression` factor, default 100,
  * wrapping a library MergingDigest behind a CombineFn). Same
  * re-expression as [[CountMinSketchAgg]]: the CombineFn lifecycle
  * (createAccumulator / addInput / mergeAccumulators / extractOutput)
  * maps 1:1 onto `TypedImperativeAggregate`
  * (createAggregationBuffer / update / merge / eval), and partial
  * aggregation is lifted automatically — each executor folds its
  * partition into a local digest and only O(compression) centroids
  * cross the shuffle regardless of input size. That O(1)-in-data
  * exchange is the sketch's entire reason to exist at 100 TB, where an
  * exact `percentile` must shuffle every value.
  *
  * Implementation: the merging-digest compression pass — centroids kept
  * sorted by mean; a merge absorbs a neighbour while the combined
  * weight stays under the classic size bound
  * `4·W·q·(1-q)/compression` at the merged centroid's mid-quantile `q`.
  * This bounds centroid count at O(compression) and rank error at
  * ~`q(1-q)/compression`-scale (tightest at the tails — the property
  * that distinguishes t-digest from fixed-ε sketches like GK).
  */
object TDigest {

  /** Compress `(mean, weight)` pairs (need not be sorted) down to the
    * t-digest centroid bound. Returns (means, weights), sorted. */
  def compress(means: Array[Double], weights: Array[Double], n: Int,
      compression: Double): (Array[Double], Array[Double]) = {
    if (n == 0) return (Array.empty, Array.empty)
    val idx = (0 until n).sortBy(means(_)).toArray
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(idx(i)); i += 1 }
    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var k = 0
    var curM = means(idx(0))
    var curW = weights(idx(0))
    var wBefore = 0.0 // weight fully emitted before the current centroid
    i = 1
    while (i < n) {
      val m = means(idx(i))
      val w = weights(idx(i))
      val q = (wBefore + (curW + w) / 2.0) / total // merged mid-quantile
      // equal means always merge (lossless — interpolation between
      // identical means is exact): duplicate-heavy/discrete columns
      // collapse to one centroid per distinct value instead of
      // spending the centroid budget on copies
      if (m == curM || curW + w <= 4.0 * total * q * (1.0 - q) / compression) {
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM(k) = curM; outW(k) = curW; k += 1
        wBefore += curW
        curM = m; curW = w
      }
      i += 1
    }
    outM(k) = curM; outW(k) = curW; k += 1
    (outM.take(k), outW.take(k))
  }

  /** Quantile estimate from a compressed digest. Each centroid's
    * interior mass — all but a half-unit at each edge — is treated as
    * SOLID at its mean; ranks landing in the one-unit gap between
    * adjacent centroids interpolate linearly between their means.
    *
    * Why solid interiors (vs. the naive midpoint interpolation): heavy
    * centroids only arise from duplicate values (the compression bound
    * caps every mixed centroid at `4·W·q(1-q)/compression`, but
    * equal-mean merging is unbounded), and a duplicate mass point IS
    * its mean — interpolating across it from a distant neighbour can
    * be arbitrarily wrong (a 99.9%-constant column would report q10
    * nowhere near the constant). For continuous data the cost is at
    * most half a centroid's weight of rank error, which is exactly the
    * t-digest accuracy bound anyway. */
  def quantile(means: Array[Double], weights: Array[Double],
      q: Double): Double = {
    val n = means.length
    require(n > 0, "quantile of an empty digest")
    var total = 0.0
    var i = 0
    while (i < n) { total += weights(i); i += 1 }
    val target = q * total
    var cum = 0.0
    i = 0
    while (i < n) {
      val w = weights(i)
      if (target <= cum + 0.5) {
        if (i == 0) return means(0)
        // one-unit gap: (prev solid end, this solid start]
        val gapStart = cum - 0.5 // == prevCum + prevW - 0.5
        val frac = math.max(0.0, math.min(1.0, target - gapStart))
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      if (target <= cum + w - 0.5) return means(i)
      cum += w
      i += 1
    }
    means(n - 1)
  }

  /** Growable (means, weights) accumulation buffer; compresses itself
    * whenever the raw buffer exceeds 8× the centroid bound. */
  final class Buf(val compression: Double) {
    var means: Array[Double] = new Array[Double](64)
    var weights: Array[Double] = new Array[Double](64)
    var n: Int = 0

    def add(m: Double, w: Double): Unit = {
      if (n == means.length) {
        if (n >= 8 * compression) compact()
        if (n == means.length) {
          means = java.util.Arrays.copyOf(means, n * 2)
          weights = java.util.Arrays.copyOf(weights, n * 2)
        }
      }
      means(n) = m; weights(n) = w; n += 1
    }

    def compact(): Unit = {
      val (cm, cw) = compress(means, weights, n, compression)
      n = cm.length
      means = java.util.Arrays.copyOf(cm, math.max(64, n))
      weights = java.util.Arrays.copyOf(cw, math.max(64, n))
    }
  }
}

/** `tdigest_agg(value, compression)` → `array<double>` of the compressed
  * digest as `[mean₁, w₁, mean₂, w₂, …]` (means ascending). */
case class TDigestAgg(
    child: Expression,
    compression: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigest.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if compression < 10 => TypeCheckResult.TypeCheckFailure(
      s"tdigest_agg compression must be >= 10 (got $compression) — " +
      "below that the merge bound stops compressing and the sketch " +
      "grows O(n)")
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tdigest_agg requires numeric, got ${other.sql}")
  }

  override def createAggregationBuffer(): TDigest.Buf =
    new TDigest.Buf(compression.toDouble)

  private def toDouble(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  override def update(buf: TDigest.Buf, input: InternalRow): TDigest.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(toDouble(v), 1.0)
    buf
  }

  override def merge(buf: TDigest.Buf, other: TDigest.Buf): TDigest.Buf = {
    var i = 0
    while (i < other.n) { buf.add(other.means(i), other.weights(i)); i += 1 }
    buf
  }

  override def eval(buf: TDigest.Buf): Any = {
    buf.compact()
    val out = new Array[Double](buf.n * 2)
    var i = 0
    while (i < buf.n) {
      out(2 * i) = buf.means(i); out(2 * i + 1) = buf.weights(i); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TDigest.Buf): Array[Byte] = {
    buf.compact()
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.means(i)); bb.putDouble(buf.weights(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigest.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TDigest.Buf(compression.toDouble)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(child = newChildren.head)
}

/** `tdigest_merge_agg(sketch, compression)` — merges `tdigest_agg`
  * sketch arrays into one digest: the pre-aggregate ROLLUP path
  * (Beam: TDigestQuantiles' MergingDigest add(other) — fine-grained
  * per-group digests stored once, rolled up to any coarser grouping in
  * O(groups·compression) without rescanning raw values). */
case class TDigestMergeAgg(
    child: Expression,
    compression: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigest.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "tdigest_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if compression < 10 => TypeCheckResult.TypeCheckFailure(
      s"tdigest_merge_agg compression must be >= 10 (got $compression)")
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tdigest_merge_agg requires array<double> sketches, got ${other.sql}")
  }

  override def createAggregationBuffer(): TDigest.Buf =
    new TDigest.Buf(compression.toDouble)

  override def update(buf: TDigest.Buf, input: InternalRow): TDigest.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements() / 2
      var i = 0
      while (i < n) {
        buf.add(arr.getDouble(2 * i), arr.getDouble(2 * i + 1)); i += 1
      }
    }
    buf
  }

  override def merge(buf: TDigest.Buf, other: TDigest.Buf): TDigest.Buf = {
    var i = 0
    while (i < other.n) { buf.add(other.means(i), other.weights(i)); i += 1 }
    buf
  }

  override def eval(buf: TDigest.Buf): Any = {
    buf.compact()
    val out = new Array[Double](buf.n * 2)
    var i = 0
    while (i < buf.n) {
      out(2 * i) = buf.means(i); out(2 * i + 1) = buf.weights(i); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TDigest.Buf): Array[Byte] = {
    buf.compact()
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putDouble(buf.means(i)); bb.putDouble(buf.weights(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigest.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TDigest.Buf(compression.toDouble)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestMergeAgg =
    copy(child = newChildren.head)
}

/** `tdigest_quantile(sketch, q)` — quantile estimate read back out of a
  * `tdigest_agg` sketch array. */
case class TDigestQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"tdigest_quantile requires (array<double>, double), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tdigest_quantile"

  override protected def nullSafeEval(sk: Any, qv: Any): Any = {
    val q = qv.asInstanceOf[Double]
    if (q < 0.0 || q > 1.0)
      throw new IllegalArgumentException(
        s"tdigest_quantile: q must be in [0, 1], got $q")
    val arr = sk.asInstanceOf[ArrayData]
    val n = arr.numElements() / 2
    if (n == 0) return null
    val means = new Array[Double](n)
    val weights = new Array[Double](n)
    var i = 0
    while (i < n) {
      means(i) = arr.getDouble(2 * i); weights(i) = arr.getDouble(2 * i + 1)
      i += 1
    }
    TDigest.quantile(means, weights, q)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestQuantile =
    copy(left = newLeft, right = newRight)
}
