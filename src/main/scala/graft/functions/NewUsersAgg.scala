package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `new_users_agg(user, is_left, value)` — the WINDOW-GRAIN buffer for
  * the Nexmark Q8 windowed-CoGBK shape (reference:
  * sdks/java/testing/nexmark/.../queries/Query8.java — new persons ×
  * their new auctions co-grouped per (person, window), one output row
  * per auction): accumulates, per distinct user inside the group, the
  * left-event count and the list of right-event values; `eval` emits
  * `array<struct<user_id, n_left, right_value>>` — one element per
  * right event of every user that has BOTH sides — ready to
  * `explode` into the reference's per-(person, auction) output grain.
  *
  * Why this exists (r19): the per-(user, window) streaming aggregation
  * (`StreamOps.newUsersJoin`) writes one durable state row per touched
  * key per batch, and on Nexmark-like data distinct (user, window) ≈
  * events — 39,489 RocksDB writes per 100k events with the state
  * commit + write path bounding throughput at ~0.56× of the published
  * bar. Folding the per-user accumulation INTO the aggregation buffer
  * flips the state grain to one row per WINDOW: per-batch writes =
  * windows touched by the batch's time frontier (~hundreds), and
  * Catalyst's partial aggregation merges each partition's events into
  * one packed map before the exchange (Beam's combiner lifting with
  * the map as accumulator — same trick as [[HotItemAgg]]).
  *
  * Scale contract: the buffer is O(distinct users active in the
  * window) — bounded by window length × arrival rate, NOT by total key
  * cardinality, but a pathologically hot window packs its whole
  * population into one RocksDB row. For such skew keep the
  * per-(user, window) grain (`newUsersJoin`), whose rows are O(1);
  * both forms are spec'd equal. Right-event values may be NULL and
  * still emit (a null-valued right event is an event — ADVICE r18's
  * grain contract), encoded with an explicit presence flag.
  */
case class NewUsersAgg(
    user: Expression,
    isLeft: Expression,
    value: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, NewUsersAgg.Acc]] {
  import NewUsersAgg.Acc

  override def children: Seq[Expression] = Seq(user, isLeft, value)
  override def prettyName: String = "new_users_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("user_id", LongType, nullable = false),
    StructField("n_left", LongType, nullable = false),
    StructField("right_value", DoubleType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (user.dataType, isLeft.dataType, value.dataType) match {
      case (LongType | IntegerType, BooleanType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"new_users_agg requires (integral, boolean, double), got $other")
    }

  override def createAggregationBuffer(): java.util.HashMap[java.lang.Long, Acc] =
    new java.util.HashMap[java.lang.Long, Acc]()

  private def accFor(buf: java.util.HashMap[java.lang.Long, Acc],
      u: Long): Acc = {
    var a = buf.get(u)
    if (a == null) { a = new Acc; buf.put(u, a) }
    a
  }

  override def update(buf: java.util.HashMap[java.lang.Long, Acc],
      input: InternalRow): java.util.HashMap[java.lang.Long, Acc] = {
    val u = user.eval(input)
    val side = isLeft.eval(input)
    if (u != null && side != null) {
      val uid = u match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long => l.longValue
      }
      val a = accFor(buf, uid)
      if (side.asInstanceOf[Boolean]) a.nLeft += 1
      else a.rights += value.eval(input).asInstanceOf[java.lang.Double]
    }
    buf
  }

  override def merge(buf: java.util.HashMap[java.lang.Long, Acc],
      other: java.util.HashMap[java.lang.Long, Acc]): java.util.HashMap[java.lang.Long, Acc] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val a = accFor(buf, e.getKey.longValue)
      a.nLeft += e.getValue.nLeft
      a.rights ++= e.getValue.rights
    }
    buf
  }

  override def eval(buf: java.util.HashMap[java.lang.Long, Acc]): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val a = e.getValue
      if (a.nLeft > 0 && a.rights.nonEmpty) {
        val uid = e.getKey.longValue
        a.rights.foreach { v =>
          out += InternalRow(uid, a.nLeft,
            if (v == null) null else v.doubleValue)
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buf: java.util.HashMap[java.lang.Long, Acc]): Array[Byte] = {
    var n = 0
    val it0 = buf.values().iterator()
    while (it0.hasNext) n += 24 + it0.next().rights.length * 9
    val bb = java.nio.ByteBuffer.allocate(4 + n)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val a = e.getValue
      bb.putLong(e.getKey.longValue); bb.putLong(a.nLeft)
      bb.putInt(a.rights.length)
      a.rights.foreach { v =>
        if (v == null) bb.put(0: Byte)
        else { bb.put(1: Byte); bb.putDouble(v.doubleValue) }
      }
    }
    // trim: null-valued rights skip their 8 value bytes
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[java.lang.Long, Acc] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val size = bb.getInt()
    var i = 0
    while (i < size) {
      val a = new Acc
      val uid = bb.getLong()
      a.nLeft = bb.getLong()
      val k = bb.getInt()
      var j = 0
      while (j < k) {
        a.rights += (if (bb.get() == 0) null else Double.box(bb.getDouble()))
        j += 1
      }
      buf.put(uid, a)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NewUsersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NewUsersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NewUsersAgg =
    copy(user = newChildren(0), isLeft = newChildren(1),
      value = newChildren(2))
}

object NewUsersAgg {
  /** Per-user accumulator: left-event count + right-event values
    * (boxed — a right event with a NULL value still emits a row). */
  final class Acc {
    var nLeft: Long = 0L
    val rights = scala.collection.mutable.ArrayBuffer.empty[java.lang.Double]
  }
}
