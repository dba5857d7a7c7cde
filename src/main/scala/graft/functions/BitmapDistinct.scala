package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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

object BitmapDistinct {
  /** Column form, ready for `df.agg(...)`. No default capacity: the
    * domain bound is part of the call, because a silent default couples
    * the operator to whatever fixture happened to fit it (a larger id
    * would throw at runtime — see the class doc).
    */
  def bitmapDistinct(c: Column, capacityBits: Int): Column =
    udaf(new BitmapDistinctAgg(capacityBits)).apply(c)
}
