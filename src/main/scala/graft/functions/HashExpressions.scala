package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the document-sketch hot path.
  *
  * The compositional forms in [[TextFunctions]] (aggregate/zip_with over
  * shingle arrays) are semantically identical but run interpreted — Spark
  * higher-order functions don't participate in whole-stage codegen, and
  * interpreted evaluation re-walks the expression tree per array element
  * (~100 ms/document for a 16-hash minhash at 150 shingles). These
  * expressions do the same math in a tight single pass per row (~100×
  * faster), which is the difference between a scan-speed 100 TB dedup
  * pass and an interpreter-bound one.
  *
  * Semantics are locked to the portable definition the DuckDB oracles
  * reproduce (see TextFunctions): lowercase+trim, `\s+` tokens, 3-word
  * shingles (whole text if <3 tokens), h_i(s) = md5hex(i ∥ "|" ∥ s),
  * lexicographic minima, band key = md5hex of 4 concatenated minima.
  * Equality of both implementations is asserted in HashExpressionsSpec.
  */
object HashExpressions {

  private val hexDigits = "0123456789abcdef".toCharArray

  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[functions] def md5Hex(s: String): String = {
    val md = digestTL.get()
    md.reset()
    val bytes = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Tokenize exactly like `split(lower(trim(text)), '\\s+')`: after the
    * trim there are no leading/trailing separators, so Java's split
    * agrees with Spark's (which keeps trailing empties) and with DuckDB's
    * regexp_split_to_array.
    */
  private[functions] def normTokens(text: String): Array[String] = {
    val norm = text.trim.toLowerCase(java.util.Locale.ROOT)
    norm.split("\\s+", -1)
  }

  private[functions] def shingles(text: String): Array[String] = {
    val t = normTokens(text)
    if (t.length >= 3) {
      val out = new Array[String](t.length - 2)
      var i = 0
      while (i < out.length) {
        out(i) = t(i) + " " + t(i + 1) + " " + t(i + 2)
        i += 1
      }
      out
    } else Array(text.trim.toLowerCase(java.util.Locale.ROOT))
  }

  /** Column API: 4 LSH band keys (array<string>) of a 16-row minhash. */
  def minhash_band_keys(c: Column): Column =
    expressionColumn(MinHashBandKeys(expressionOf(c)))

  /** Column API: the raw 16-row minhash signature (array<string>). */
  def minhash_signature(c: Column): Column =
    expressionColumn(MinHashSignature(expressionOf(c)))

  /** Column API: element-wise minimum of signatures across a group —
    * the signature of the UNION of the group's shingle sets.
    */
  def minhash_union(c: Column): Column =
    expressionColumn(MinHashUnionAgg(expressionOf(c))
      .toAggregateExpression(isDistinct = false))

  private def hexOf(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned lexicographic digest compare — identical ordering to
    * comparing the two digests' lowercase-hex renderings (each byte maps
    * monotonically to its two hex chars).
    */
  private def digestLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  /** Shared signature computation (one tight pass). Semantics are
    * unchanged from `min over md5hex(i ∥ "|" ∥ shingle)`; the loop works
    * byte-level — shingle UTF-8 encoded once (not once per hash), the
    * digest written into a reusable scratch buffer, minima kept as raw
    * digest bytes (same order as hex strings) and hex-rendered only for
    * the 16 winners. The per-(i, shingle) String/encode/hex allocations
    * this removes were the dominant cost of the corpus sketch queries.
    */
  private[functions] def signatureOf(text: String, numHashes: Int): Array[String] = {
    val sh = shingles(text)
    val md = digestTL.get()
    val prefixes = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < numHashes) {
      prefixes(i) = (i.toString + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val minDigest = new Array[Array[Byte]](numHashes)
    val scratch = new Array[Byte](16)
    var si = 0
    while (si < sh.length) {
      val sBytes = sh(si).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i = 0
      while (i < numHashes) {
        md.reset()
        md.update(prefixes(i))
        md.update(sBytes)
        md.digest(scratch, 0, 16)
        if (minDigest(i) == null || digestLess(scratch, minDigest(i))) {
          minDigest(i) = scratch.clone()
        }
        i += 1
      }
      si += 1
    }
    val sig = new Array[String](numHashes)
    i = 0
    while (i < numHashes) {
      sig(i) = if (minDigest(i) == null) null else hexOf(minDigest(i))
      i += 1
    }
    sig
  }

  /** Column API: 64-char '0'/'1' SimHash signature string. */
  def simhash64(c: Column): Column =
    expressionColumn(SimHash64(expressionOf(c)))

  /** Column API: struct(n_tokens, n_uniq_tokens, max_token_len). */
  def token_stats(c: Column): Column =
    expressionColumn(TokenStats(expressionOf(c)))

  // Spark 4 Column wraps a ColumnNode, not a catalyst Expression; these
  // two helpers bridge via the classic-API conversions.
  private def expressionOf(c: Column): Expression =
    org.apache.spark.sql.GraftExpressionBridge.expression(c)
  private def expressionColumn(e: Expression): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(e)
}

/** Static entry points for generated code. A top-level Scala object gets
  * static forwarders, so Janino-generated whole-stage code calls these
  * directly — the expressions below emit one static call per row instead
  * of falling back to interpreted eval (CodegenFallback would route every
  * row through boxed varargs + reflection-shaped dispatch).
  */
object HashExpressionRuntime {
  import HashExpressions._

  def minhashBands(text: UTF8String, numHashes: Int, numBands: Int): ArrayData = {
    val sig = signatureOf(text.toString, numHashes)
    val rows = numHashes / numBands
    val bands = new Array[AnyRef](numBands)
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder(32 * rows)
      var r = 0
      while (r < rows) { sb.append(sig(b * rows + r)); r += 1 }
      bands(b) = UTF8String.fromString(md5Hex(sb.toString))
      b += 1
    }
    new GenericArrayData(bands)
  }

  def minhashSignature(text: UTF8String, numHashes: Int): ArrayData =
    new GenericArrayData(
      signatureOf(text.toString, numHashes).map(UTF8String.fromString(_): AnyRef))

  def simhash64(text: UTF8String): UTF8String = {
    val toks = normTokens(text.toString)
    val counts = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val h = md5Hex(toks(ti))
      var b = 0
      while (b < 64) {
        val nib = Character.digit(h.charAt(b / 4), 16)
        counts(b) += (((nib >> (b % 4)) & 1) * 2) - 1
        b += 1
      }
      ti += 1
    }
    val bits = new Array[Char](64)
    var b = 0
    while (b < 64) { bits(b) = if (counts(b) > 0) '1' else '0'; b += 1 }
    UTF8String.fromString(new String(bits))
  }

  def tokenStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = normTokens(text.toString)
    val seen = new java.util.HashSet[String](toks.length * 2)
    var maxLen = 0
    var i = 0
    while (i < toks.length) {
      seen.add(toks(i))
      if (toks(i).length > maxLen) maxLen = toks(i).length
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(toks.length, seen.size, maxLen)
  }
}

/** `minhash_band_keys(text)`: the per-document half of minhash-LSH dedup
  * — 16 md5-based minhash rows banded 4×4 into 4 bucket keys.
  * One tight pass: tokenize once, shingle once, then 16 running minima.
  */
case class MinHashBandKeys(child: Expression,
    numHashes: Int = 16, numBands: Int = 4)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  override def nullSafeEval(input: Any): Any =
    HashExpressionRuntime.minhashBands(
      input.asInstanceOf[UTF8String], numHashes, numBands)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionRuntime.minhashBands($c, $numHashes, $numBands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_signature(text)`: the raw 16-row minhash signature as
  * array<string> — the per-document half that [[MinHashUnionAgg]]
  * combines per group.
  */
case class MinHashSignature(child: Expression, numHashes: Int = 16)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    HashExpressionRuntime.minhashSignature(input.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionRuntime.minhashSignature($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_union(sig)`: TypedImperativeAggregate taking per-row minhash
  * signatures to their element-wise minimum — which IS the signature of
  * the union of the underlying shingle sets (min commutes with set
  * union). The group sketch is 16 hex strings regardless of group size,
  * so partial aggregation ships constant-size state: the
  * `approx_count_distinct` design pattern applied to set similarity.
  */
case class MinHashUnionAgg(
    child: Expression,
    numHashes: Int = 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[String]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_union"

  override def createAggregationBuffer(): Array[String] = new Array[String](numHashes)

  override def update(buf: Array[String], input: org.apache.spark.sql.catalyst.InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), numHashes)
      var i = 0
      while (i < n) {
        val h = arr.getUTF8String(i).toString
        if (buf(i) == null || h.compareTo(buf(i)) < 0) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[String], other: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) != null && (buf(i) == null || other(i).compareTo(buf(i)) < 0))
        buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[String]): Any =
    if (buf.forall(_ == null)) null
    else new GenericArrayData(buf.map(s =>
      (if (s == null) null else UTF8String.fromString(s)): AnyRef))

  // hex strings never contain ',' — positional join/split is lossless
  override def serialize(buf: Array[String]): Array[Byte] =
    buf.map(s => if (s == null) "" else s).mkString("")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("", -1).map(s => if (s.isEmpty) null else s)
      .padTo(numHashes, null).take(numHashes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnionAgg =
    copy(child = newChild)
}

/** `token_stats(text)`: whitespace-token statistics in one tokenizer
  * pass — struct(n_tokens, n_uniq_tokens, max_token_len). The
  * compositional form (3 × split + array_distinct + transform/max) runs
  * each regex split per expression copy under interpreted HOF eval;
  * this costs one split and one hash-set per row.
  */
case class TokenStats(child: Expression)
  extends UnaryExpression {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq_tokens", IntegerType, nullable = false),
    StructField("max_token_len", IntegerType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any =
    HashExpressionRuntime.tokenStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionRuntime.tokenStats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(text)`: 64-bit SimHash over whitespace tokens (with
  * multiplicity) as a '0'/'1' string — bit b of token t is
  * (hexval(md5hex(t)[b/4]) >> (b%4)) & 1, weighted ±1, sign-aggregated.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    HashExpressionRuntime.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExpressionRuntime.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
