package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table-valued function (the UDTF tier): one input row
  * → many output rows, as a first-class `Generator` the planner places
  * in the same `Generate` node `explode`/`posexplode` use — so it
  * composes with LATERAL VIEW in SQL text and streams rows without
  * materializing an intermediate array per document (the HOF form
  * `posexplode(transform(sequence(...), ...))` builds the whole line
  * array in memory first; the generator emits lines as it walks the
  * token array once).
  *
  * `graft_lines(text, width)`: segment a document into fixed-width
  * token lines — the shared segmentation primitive under line-level
  * dedup, chunking, and packing. Tokenization is the house-portable
  * definition (lower+trim, `\s+`), locked to the DuckDB oracle by the
  * same rules as [[HashExpressions]].
  */
case class LinesGenerator(child: Expression, width: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, width)

  override def elementSchema: StructType = StructType(Seq(
    StructField("line_idx", IntegerType, nullable = false),
    StructField("line", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && width.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_lines expects (STRING, INT), got " +
        s"(${child.dataType.simpleString}, ${width.dataType.simpleString})")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else {
      val w = width.eval(input).asInstanceOf[Int]
      require(w > 0, s"graft_lines width must be positive, got $w")
      val toks = HashExpressions.normTokens(t.asInstanceOf[UTF8String].toString)
      val n = toks.length
      new Iterator[InternalRow] {
        private var i = 0
        private var idx = 0
        override def hasNext: Boolean = i < n
        override def next(): InternalRow = {
          val sb = new java.lang.StringBuilder
          val end = math.min(i + w, n)
          var j = i
          while (j < end) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          val row = InternalRow(idx, UTF8String.fromString(sb.toString))
          i += w
          idx += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LinesGenerator =
    copy(child = newChildren(0), width = newChildren(1))
}
