package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass EXACT covariance-matrix aggregate over a snapped integer
  * vector column — the scale rewrite of the explode-the-pairs plan.
  *
  * The declarative form materializes d(d+1)/2 pair rows PER INPUT ROW
  * (2 080 at d=64) and pushes them through a hash aggregate: correct,
  * but the per-row cost is dominated by building and probing ~2 000
  * row objects, and at 10⁸ vectors that is 10¹¹ rows through the
  * aggregate. This operator keeps the whole Gram accumulator — n, Σxᵢ
  * (long[d]), and Σxᵢxⱼ (signed 128-bit in two long[d(d+1)/2] limbs) —
  * as ONE live JVM buffer per partition: update is d(d+1)/2 fused
  * multiply-adds on primitive arrays (no allocation, no hashing), and
  * the shuffle carries one ~34 KB buffer per map task instead of
  * pair rows. Exactness is unchanged: integer sums are associative, so
  * any partition/merge order reproduces the oracle bit-for-bit, and
  * the 128-bit limbs hold Σxᵢxⱼ to ~10²² rows at |xᵢ|≤4·10¹²-per-
  * product (the DECIMAL(38,0) discipline without decimal's per-row
  * cost).
  *
  * `eval` finishes the algebra exactly as the SQL form does — cast the
  * exact integer n·Σxᵢxⱼ − ΣxᵢΣxⱼ to double (correctly rounded), the
  * same three double divisions, Spark's Round(HALF_UP on the shortest
  * decimal representation, i.e. `BigDecimal.valueOf`), then +0.0 to
  * canonicalize −0.0 — so the output hash is indistinguishable from
  * the explode plan's.
  */
case class GramCovAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramCovAgg.Gram]
  with UnaryLike[Expression] {

  import GramCovAgg.Gram

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dim_i", IntegerType, nullable = false),
    StructField("dim_j", IntegerType, nullable = false),
    StructField("cov", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_cov"

  override def createAggregationBuffer(): Gram = new Gram

  override def update(buf: Gram, input: InternalRow): Gram = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: Gram, b: Gram): Gram = { a.mergeIn(b); a }

  override def eval(buf: Gram): Any = {
    if (buf.n == 0L) return null
    val d = buf.d
    val n = buf.n
    val nBI = BigInteger.valueOf(n)
    val rows = new Array[AnyRef](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // exact integer n·Σxᵢxⱼ − Σxᵢ·Σxⱼ, then the SQL form's exact
        // operation order: decimal→double cast, /n, /n, /1e12, round 6
        val sxy = buf.sxy128(idx)
        val x = nBI.multiply(sxy).subtract(
          BigInteger.valueOf(buf.sx(i)).multiply(BigInteger.valueOf(buf.sx(j))))
        val v = new java.math.BigDecimal(x).doubleValue() / n / n / 1.0e12
        val cov = java.math.BigDecimal.valueOf(v)
          .setScale(6, RoundingMode.HALF_UP).doubleValue() + 0.0
        rows(idx) = new GenericInternalRow(
          Array[Any](i, j, cov): Array[Any])
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Gram): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.d)
    out.writeLong(buf.n)
    if (buf.d > 0) {
      buf.sx.foreach(out.writeLong)
      buf.hi.foreach(out.writeLong)
      buf.lo.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Gram = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val g = new Gram
    val d = in.readInt()
    g.n = in.readLong()
    if (d > 0) {
      g.init(d)
      var i = 0
      while (i < d) { g.sx(i) = in.readLong(); i += 1 }
      i = 0
      while (i < g.hi.length) { g.hi(i) = in.readLong(); i += 1 }
      i = 0
      while (i < g.lo.length) { g.lo(i) = in.readLong(); i += 1 }
    }
    g
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramCovAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramCovAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramCovAgg =
    copy(child = newChild)
}

object GramCovAgg {
  /** Live accumulator: n, Σxᵢ, and Σxᵢxⱼ as signed 128-bit (hi/lo
    * limbs, two's-complement — `lo` is the unsigned low word). Sized on
    * the first vector; all subsequent vectors must agree on d.
    */
  final class Gram {
    var d: Int = 0
    var n: Long = 0L
    var sx: Array[Long] = null
    var hi: Array[Long] = null
    var lo: Array[Long] = null

    def init(dims: Int): Unit = {
      d = dims
      sx = new Array[Long](d)
      hi = new Array[Long](d * (d + 1) / 2)
      lo = new Array[Long](d * (d + 1) / 2)
    }

    def add(xs: ArrayData): Unit = {
      if (d == 0) init(xs.numElements())
      require(xs.numElements() == d,
        s"gram_cov: ragged vector (${xs.numElements()} dims, expected $d)")
      val x = xs.toLongArray()
      n += 1L
      var idx = 0
      var i = 0
      while (i < d) {
        sx(i) += x(i)
        val xi = x(i)
        var j = i
        while (j < d) {
          val p = xi * x(j) // |x|≤2·10⁶ → |p|≤4·10¹², no long overflow
          val l = lo(idx)
          val nl = l + p
          // unsigned carry-out of l+p; p sign-extends into the high limb
          hi(idx) += (p >> 63) + (((l & p) | ((l | p) & ~nl)) >>> 63)
          lo(idx) = nl
          idx += 1
          j += 1
        }
        i += 1
      }
    }

    def mergeIn(b: Gram): Unit = {
      if (b.d == 0) return
      if (d == 0) init(b.d)
      require(b.d == d, s"gram_cov: merging d=${b.d} into d=$d")
      n += b.n
      var i = 0
      while (i < d) { sx(i) += b.sx(i); i += 1 }
      i = 0
      while (i < lo.length) {
        val l = lo(i)
        val p = b.lo(i)
        val nl = l + p
        hi(i) += b.hi(i) + (((l & p) | ((l | p) & ~nl)) >>> 63)
        lo(i) = nl
        i += 1
      }
    }

    def sxy128(idx: Int): BigInteger = {
      val h = BigInteger.valueOf(hi(idx)).shiftLeft(64)
      val l = lo(idx)
      val lu = if (l >= 0) BigInteger.valueOf(l)
        else BigInteger.valueOf(l).add(BigInteger.ONE.shiftLeft(64))
      h.add(lu)
    }
  }
}

object GramMatrix {
  /** Column API: `gram_cov(xs)` over a snapped `array<bigint>` vector →
    * `array<struct<dim_i int, dim_j int, cov double>>` (upper triangle,
    * i ≤ j), finished exactly like the SQL covariance form.
    */
  def gram_cov(c: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      GramCovAgg(org.apache.spark.sql.GraftExpressionBridge.expression(c))
        .toAggregateExpression())
}
