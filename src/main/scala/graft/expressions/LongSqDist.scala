package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen squared-L2 distance over two BIGINT[] columns —
  * `Σ (aᵢ − bᵢ)²` accumulated left-to-right in Long, replacing the
  * `aggregate(zip_with(a, b, (x, y) -> (x − y) * (x − y)), 0L, …)`
  * higher-order-function fold (CodegenFallback: two interpreted lambda
  * calls per ELEMENT). Over the micro-unit-quantized embedding vectors
  * this is the assignment-step inner kernel of
  * [[graft.queries.Clustering]]'s Lloyd iterations and the codebook
  * scoring of the PQ / scalar-quantization operators: k≈64 distances ×
  * 64 dims per row made the interpreted fold the dominant term
  * (q_kmeans 5.1 → 2.0 s at sf0.1 when routed through this kernel).
  *
  * Integer arithmetic is EXACT, so unlike the float kernels there is no
  * accumulation-order caveat at all — any evaluation order yields the
  * identical BIGINT (the DuckDB oracle's list_sum replays it trivially).
  * Magnitudes: micro-unit coords are < 4·10⁶, so a 64-dim squared
  * distance is < 64·(8·10⁶)² ≈ 4·10¹⁵ — overflow is ~3 orders of
  * magnitude away, the same headroom the HOF fold had (both wrap
  * identically in the unchecked-Long semantics of the non-ANSI session
  * if a future input ever got there).
  *
  * Null handling mirrors [[FloatDot]]: a null ELEMENT nulls the whole
  * result (the HOF's null-propagating multiply), arrays of unequal
  * length stop at the shorter (both callers zip fixed 64-dim vectors,
  * so the case never arises in practice).
  */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"long_sqdist requires two ARRAY<BIGINT> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "long_sqdist"

  // result can be null via a null ELEMENT even when both array inputs are
  // non-nullable — without this override Catalyst folds the null away
  override def nullable: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val d = xs.getLong(i) - ys.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("anyNull")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)
}
