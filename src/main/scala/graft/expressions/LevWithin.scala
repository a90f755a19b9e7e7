package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded (Ukkonen) Levenshtein with early exit: `lev_within(a, b, k)`
  * returns the exact edit distance when it is ≤ k, and −1 otherwise —
  * computed in O(k·min(n,m)) cells instead of the full O(n·m) matrix the
  * built-in `levenshtein` fills. For a similarity JOIN the verifier only
  * needs the ≤ k decision (and a length gap > k short-circuits without
  * touching a single cell), so at corpus scale this is the difference
  * between the verify step costing k·n per candidate pair and n².
  *
  * Matches `levenshtein(a, b)` exactly on every pair whose distance is
  * ≤ k: the DP runs over Unicode CODE POINTS (surrogate pairs count as
  * one edit, matching the built-in — comparing UTF-16 chars would count
  * an emoji as two); LevWithinSpec proves the equivalence on random
  * pairs including supplementary characters. Oversized budgets clamp to
  * the longer length (the distance can never exceed it), so k =
  * Int.MaxValue degrades to the full computation instead of
  * overflowing. Null inputs → null (ternary null-intolerance).
  */
case class LevWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "lev_within requires (STRING, STRING, INT), got " +
          s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_within"

  protected override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    LevWithin.banded(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) => {
      val cls = LevWithin.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.banded($a.toString(), $b.toString(), $k);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LevWithin =
    copy(first = f, second = s, third = t)
}

object LevWithin {
  /** The kernel, shared by interpreted eval and codegen: diagonal band of
    * half-width k over the DP matrix; any row whose band minimum already
    * exceeds k aborts. Returns −1 for "distance > k". Operates on code
    * points (Spark's built-in counts code points, not UTF-16 units). */
  def banded(aStr: String, bStr: String, k0: Int): Int = {
    if (k0 < 0) return -1
    val a = aStr.codePoints().toArray
    val b = bStr.codePoints().toArray
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (m - n > k0) return -1 // length gap alone exceeds the budget
    if (n == 0) return m      // m - n <= k0 here
    // distance never exceeds m, so an oversized budget clamps — keeps
    // inf = k+1 and i+k inside Int for any caller-supplied k
    val k = math.min(k0, m)
    val inf = k + 1
    // prev(j) = distance for prefix (i-1, j); band j ∈ [i-k, i+k]
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      if (lo == 1) cur(0) = if (i <= k) i else inf
      var best = cur(0)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1)
        val del = if (prev(j) < inf) prev(j) + 1 else inf
        val ins = if (cur(j - 1) < inf) cur(j - 1) + 1 else inf
        var v = math.min(sub, math.min(del, ins))
        if (v > inf) v = inf
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best > k) return -1 // the whole band overflowed: early exit
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    if (prev(m) > k) -1 else prev(m)
  }
}
