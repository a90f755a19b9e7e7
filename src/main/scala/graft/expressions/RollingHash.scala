package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial content hash
  * h = fold(chars c): (h*131 + codePoint(c)) mod 1e9+7 — semantically
  * identical to the higher-order-function formulation in
  * [[graft.queries.TextAnalysis.qFingerprint]]'s original
  * `aggregate(sequence(1, length(s)), ...)` and to the DuckDB oracle's
  * list_reduce.
  *
  * Why a custom Expression (SURVEY §4 said none were *required* — this one
  * is perf-motivated): Catalyst higher-order functions are interpreted per
  * element (a lambda invocation and a substring allocation per character),
  * which measured 3.7 s over sf0.1 documents. This expression participates
  * in whole-stage codegen via [[doGenCode]] — one tight Java loop per row,
  * no allocations beyond the string itself. Same preference order the
  * builder brief mandates: built-in functions > native codegen Expression >
  * UDF.
  *
  * Character semantics: iterates UTF-16 units (String.charAt), which equals
  * the per-character `ascii(substring(s,i,1))` codepoint for all
  * basic-multilingual-plane text and the oracle's RE over ASCII corpora.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  protected override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 131L + $s.charAt($i)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Reference implementation (also the interpreted eval path). */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 131 + s.charAt(i)) % 1000000007L; i += 1 }
    h
  }

  /** Column wrapper for DataFrame use: goes through the session function
    * registry (populated by Sessions.tune / GraftExtensions) because the
    * Column-from-Expression constructor is private[sql] in Spark 4's
    * Connect-split API. `colName` must be a resolvable column name. */
  def rollingHash(colName: String): Column =
    org.apache.spark.sql.functions.expr(s"rolling_hash(`$colName`)")
}
