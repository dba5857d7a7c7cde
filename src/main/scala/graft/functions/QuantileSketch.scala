package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `quantile_sketch(value, k, fractions)`: a deterministic mergeable
  * quantile summary (the Manku–Rajagopalan–Lindsay / deterministic-KLL
  * compactor ladder) as a TypedImperativeAggregate — the fourth sketch
  * family beside HLL (cardinality), CMS/SpaceSaving (frequency), and
  * KMV (distinct samples). Distributed quantiles are THE aggregation a
  * 100 TB pipeline cannot do exactly without a global sort; the sketch
  * answer is one narrow pass + a shuffle of O(k·log(n/k)) longs per
  * group.
  *
  * Structure: a ladder of buffers; level i holds items of weight 2^i,
  * capacity k each. `update` appends to level 0; a full level is
  * sorted and its EVEN-index half promoted one level up (deterministic
  * compaction — no RNG, so any retry or merge order reproduces the
  * same class of summary). `merge` concatenates per level and
  * re-compacts. Each compaction of level i perturbs any rank by at
  * most 2^i, and level i compacts at most n/(k·2^i) times, giving
  * worst-case rank error ≤ Σ_i (n/(k·2^i))·2^i = n·levels/k — for
  * k = 1024 and n = 6M that is ~1.3% of n, comfortably inside the
  * ±5% audit band REGARDLESS of how Spark ordered the partial merges.
  *
  * `eval` walks the weighted summary in value order and reports the
  * smallest value whose cumulative weight reaches ⌈q·W⌉ for each
  * requested fraction. The graft discipline for approximate answers
  * applies: the estimates feed a RANK AUDIT query (exact rank of each
  * estimate recomputed against the data, verdict in the contract),
  * and the estimates themselves stay out of the oracle hash.
  */
case class QuantileSketchAgg(
    child: Expression,
    capacity: Int = 1024,
    fractions: Seq[Double] = Seq(0.25, 0.5, 0.75),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[mutable.ArrayBuffer[Long]]]
  with UnaryLike[Expression] {

  type Ladder = mutable.ArrayBuffer[mutable.ArrayBuffer[Long]]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_sketch"

  override def createAggregationBuffer(): Ladder =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])

  /** Promote the even-index half of a sorted full level upward,
    * cascading while any level overflows.
    */
  private def compact(l: Ladder): Unit = {
    var i = 0
    while (i < l.length) {
      if (l(i).length >= capacity) {
        val sorted = l(i).toArray
        java.util.Arrays.sort(sorted)
        if (i + 1 >= l.length) l += mutable.ArrayBuffer.empty[Long]
        val up = l(i + 1)
        var j = 0
        while (j < sorted.length) { up += sorted(j); j += 2 }
        l(i).clear()
      }
      i += 1
    }
  }

  override def update(buf: Ladder, input: InternalRow): Ladder = {
    val v = child.eval(input)
    if (v != null) {
      buf(0) += v.asInstanceOf[Long]
      if (buf(0).length >= capacity) compact(buf)
    }
    buf
  }

  override def merge(a: Ladder, b: Ladder): Ladder = {
    while (a.length < b.length) a += mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < b.length) { a(i) ++= b(i); i += 1 }
    compact(a)
    a
  }

  /** Weighted-rank walk: for each fraction, the smallest summary value
    * whose cumulative weight reaches ⌈q·W⌉ (W = total weight ≈ n).
    */
  override def eval(buf: Ladder): Any = {
    val weighted = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < buf.length) {
      val w = 1L << i
      buf(i).foreach(v => weighted += ((v, w)))
      i += 1
    }
    if (weighted.isEmpty) return null
    val sorted = weighted.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val out = fractions.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var ans = sorted.last._1
      var j = 0
      var found = false
      while (j < sorted.length && !found) {
        cum += sorted(j)._2
        if (cum >= target) { ans = sorted(j)._1; found = true }
        j += 1
      }
      ans
    }
    new GenericArrayData(out.map(Long.box(_): AnyRef).toArray)
  }

  override def serialize(buf: Ladder): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { level =>
      out.writeInt(level.length)
      level.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Ladder = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val levels = in.readInt()
    val l: Ladder = mutable.ArrayBuffer.empty
    var i = 0
    while (i < levels) {
      val n = in.readInt()
      val b = mutable.ArrayBuffer.empty[Long]
      var j = 0
      while (j < n) { b += in.readLong(); j += 1 }
      l += b
      i += 1
    }
    if (l.isEmpty) l += mutable.ArrayBuffer.empty[Long]
    l
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

object QuantileSketch {
  /** Column API: `quantile_sketch(c)` → array<long> of the estimates at
    * the given fractions, in order.
    */
  def quantile_sketch(c: Column, capacity: Int = 1024,
      fractions: Seq[Double] = Seq(0.25, 0.5, 0.75)): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      QuantileSketchAgg(
        org.apache.spark.sql.GraftExpressionBridge.expression(c),
        capacity, fractions).toAggregateExpression())
}
