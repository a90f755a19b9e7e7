package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two FLOAT[] columns, accumulating
  * left-to-right in double — bit-identical to the
  * `aggregate(zip_with(a, b, …))` higher-order-function fold it replaces
  * (and to the DuckDB oracle's list_sum-over-list_transform), but executed
  * as one tight Java loop per row instead of two interpreted lambda calls
  * per element.
  *
  * This is the hot inner kernel of the similarity-search operators
  * ([[graft.queries.Embeddings]]): the ANN rerank evaluates it once per
  * candidate pair, so at corpus scale it dominates the stage — measured
  * ~5× end-to-end on q_embed_ann at sf0.1. Arrays shorter than the other
  * side stop at the shorter length (zip semantics); null arrays yield null
  * (BinaryExpression default null-intolerance).
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"float_dot requires two ARRAY<FLOAT> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  // result can be null via a null ELEMENT even when both array inputs are
  // non-nullable — without this override Catalyst folds the null away
  override def nullable: Boolean = true

  // A null ELEMENT nulls the whole result, exactly like the HOF fold
  // (null * x -> null -> acc + null -> null) and the oracle — getFloat on
  // a null slot would silently read 0.0 instead.
  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("anyNull")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** SQL-registry-backed Column wrapper (see [[RollingHash.rollingHash]]
    * for why construction goes through expr()). Args are column names. */
  def floatDot(a: String, b: String): Column =
    org.apache.spark.sql.functions.expr(s"float_dot(`$a`, `$b`)")
}
