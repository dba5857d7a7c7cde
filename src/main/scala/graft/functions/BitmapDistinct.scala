package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{DataType, LongType}

/** EXACT distinct counting over a bounded integer id domain through the
  * PUBLIC `Aggregator` + `functions.udaf` tier — the extension path a
  * LIBRARY USER takes (every API here is public: the buffer is an
  * `Array[Byte]` encoded by `Encoders.BINARY`, unlike the in-house
  * `TypedImperativeAggregate`s SpaceSavingAgg / QuantileSketchAgg /
  * MinHashUnionAgg which live on catalyst internals): state is a
  * fixed-size bitmap, `reduce` sets a bit, `merge` ORs byte-wise,
  * `finish` popcounts — fully mergeable, so map-side partial aggregation
  * works and the shuffle carries one bitmap per group per map task
  * instead of the id stream. This is the dense block of the
  * roaring-bitmap design; at an unbounded or sparse domain you page the
  * bitmap into keyed blocks (or fall back to the audited HLL/KMV
  * sketches, which bound state regardless of domain).
  *
  * capacityBits fixes the state size (capacity/8 bytes). It is the
  * CALLER's contract: it must come from the id allocator's declared
  * bound (see [[graft.operators.Analytics.bitmapDistinctDaily]], which
  * derives it from the data), and out-of-domain ids fail loudly rather
  * than alias.
  *
  * Cost note (measured): the public tier round-trips the buffer through
  * its Encoder on EVERY update — the buffer pays O(capacity/8) ser/de
  * per input row, so capacity directly multiplies per-row cost
  * (1 M bits benched 18 s over the sf0.1 events table; 64 K bits ~1 s).
  * That is the tier's trade: zero catalyst internals, but object-state
  * hot loops belong in a `TypedImperativeAggregate` (SpaceSavingAgg's
  * shape), which keeps the buffer as a live JVM object between rows.
  */
class BitmapDistinctAgg(capacityBits: Int)
  extends Aggregator[Long, Array[Byte], Long] {

  private val bytes = (capacityBits + 7) >>> 3

  override def zero: Array[Byte] = new Array[Byte](bytes)

  override def reduce(b: Array[Byte], id: Long): Array[Byte] = {
    require(id >= 0 && id < capacityBits,
      s"id $id outside bitmap domain [0, $capacityBits)")
    b((id >>> 3).toInt) = (b((id >>> 3).toInt) | (1 << (id & 7)).toByte).toByte
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < bytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    while (i < bytes) { n += java.lang.Integer.bitCount(b(i) & 0xff); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** The HOT-PATH tier of the same bitmap: a `TypedImperativeAggregate`
  * whose buffer is a live `Array[Long]` word array between rows — the
  * per-row cost is ONE bit-set, and the O(capacity/8) serialization is
  * paid only at partial-exchange boundaries (exactly SpaceSavingAgg's
  * shape). This is the fix for the public-`Aggregator` tier's measured
  * scaling wall: that tier round-trips the buffer through its Encoder
  * per input row, so cost = rows × capacity — 75× for a 10×-rows,
  * 10×-domain step (sf1→sf10, 3.5 s → 263 s); this tier is rows + a
  * constant number of capacity-sized flushes, and benches linear.
  * Same state, same merge, same answer — spec-pinned equal to the
  * public tier.
  */
case class BitmapDistinctTIA(
    child: Expression,
    capacityBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  private val words = (capacityBits + 63) >>> 6

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      require(id >= 0 && id < capacityBits,
        s"id $id outside bitmap domain [0, $capacityBits)")
      buf((id >>> 6).toInt) |= 1L << (id & 63)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctTIA =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctTIA =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinctTIA =
    copy(child = newChild)
}

object BitmapDistinct {
  /** Column form, ready for `df.agg(...)`. No default capacity: the
    * domain bound is part of the call, because a silent default couples
    * the operator to whatever fixture happened to fit it (a larger id
    * would throw at runtime — see the class doc).
    */
  def bitmapDistinct(c: Column, capacityBits: Int): Column =
    udaf(new BitmapDistinctAgg(capacityBits)).apply(c)

  /** Hot-path form on the TypedImperativeAggregate tier — identical
    * answer, linear cost (see [[BitmapDistinctTIA]]).
    */
  def bitmapDistinctFast(c: Column, capacityBits: Int): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      BitmapDistinctTIA(
        org.apache.spark.sql.GraftExpressionBridge.expression(c),
        capacityBits).toAggregateExpression())
}
