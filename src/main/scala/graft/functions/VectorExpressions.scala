package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector similarity primitives for the embedding column
  * (`array<float>`, 64-dim in the testdata).
  *
  * `cosine_similarity` is a custom Catalyst expression **with real
  * codegen** (`doGenCode`, not CodegenFallback): the whole scan → score →
  * top-k pipeline stays inside one whole-stage-codegen loop, which is
  * what makes brute-force scoring a scan-speed operation at 100 TB. A
  * higher-order-function formulation (zip_with + aggregate) would drop
  * the stage out of codegen and interpret ~64 expression-tree nodes per
  * row.
  *
  * Semantics: accumulate dot and both norms in double over the float
  * values, score = dot / (sqrt(na)·sqrt(nb)) — mirrored literally by the
  * DuckDB oracles (which must cast to DOUBLE: DuckDB's own
  * list_dot_product accumulates in float32).
  */
object VectorExpressions {

  def cosine_similarity(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      CosineSimilarity(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))

  def quantized_cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      QuantizedCosine(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b)))
}

case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine over 2²⁰-quantized integer components — the DEDUP-grade
  * variant: every float is snapped to floor(x·2²⁰) (floor, not round:
  * no tie semantics to disagree on) and dot/norms accumulate in exact
  * LONG arithmetic, so the accumulation is order-independent and any
  * engine that quantizes the same way derives bit-identical scores —
  * the final sqrt/divide are correctly-rounded IEEE ops on identical
  * integers. Plain double accumulation is engine-sensitive in the last
  * ulp (summation algorithm/order), and at pair-join volume a last-ulp
  * wobble WILL land on a round(·,6) boundary (the sf1 run caught
  * exactly one in 319k pairs). Quantization error is ~2⁻²⁰ relative —
  * irrelevant to near-dup thresholds; retrieval top-k keeps the full
  * double [[CosineSimilarity]].
  */
case class QuantizedCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = math.floor(a.getFloat(i).toDouble * 1048576.0).toLong
      val y = math.floor(b.getFloat(i).toDouble * 1048576.0).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1048576.0);
         |  long $y = (long) java.lang.Math.floor((double) $b.getFloat($i) * 1048576.0);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = (double) $dot
         |  / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
