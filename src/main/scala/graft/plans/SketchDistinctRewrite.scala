package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.expressions.KmvAgg

/** Opt-in approximate-query-processing switch: when
  * `spark.graft.sketchDistinct=true`, every single-column exact
  * COUNT(DISTINCT x) over an integral/string column rewrites to the native
  * `kmv` sketch (k = 64) plus its estimator arithmetic — the session-wide
  * "give me fast approximate distincts" dial, implemented as a
  * `Rule[LogicalPlan]` so EXISTING queries flip without a code change.
  *
  * Why a rule and not a function: q_profile_approx shows the sketch swap
  * per query; at 100 TB an analyst session (or a dashboard layer) wants
  * the swap GLOBALLY and reversibly. The rewrite changes plan shape
  * exactly as the manual swap does — the distinct's shuffle of every
  * (group, key) pair becomes O(groups × k), and multi-distinct Expand
  * plans collapse to one pass when all distincts rewrite.
  *
  * Determinism contract unchanged: the estimate is the same md5-derived
  * KMV as q_kmv_distinct, so a flipped session is still bit-reproducible
  * run to run (unlike approx_count_distinct's HLL). Estimates are emitted
  * as BIGINT (the type COUNT promises); off by the sketch's ~1/√k
  * relative error once a group exceeds k distinct keys, exact below that.
  *
  * Scope guards: only Complete-mode single-child distinct Counts over
  * integral/string children (exact string renderings; doubles would need
  * the DECIMAL canonicalization q_profile_approx applies per column), no
  * FILTER clause. Everything else is left alone. Idempotent (the rewrite
  * output contains no distinct Count), so it is safe under a fixed-point
  * batch.
  *
  * Injection paths differ in REACH (review finding, verified against the
  * Spark 4.1.2 optimizer batch order): `injectOptimizerRule`
  * (GraftExtensions) runs inside operator optimization, BEFORE Spark's
  * RewriteDistinctAggregates — it catches single- and multi-distinct
  * aggregates, and collapses the multi-distinct Expand. Runtime injection
  * via `spark.experimental.extraOptimizations` runs AFTER that batch, so
  * it reaches single-distinct aggregates only (a lone distinct stays a
  * logical Aggregate through the whole optimizer; multiple distincts have
  * already expanded by then and pass through unchanged).
  */
object SketchDistinctRewrite extends Rule[LogicalPlan] {
  val Flag = "spark.graft.sketchDistinct"
  private val K = 64

  override def apply(plan: LogicalPlan): LogicalPlan =
    // parseBoolean never throws — a malformed flag value must not crash
    // EVERY query's optimization in the session (review finding)
    if (!java.lang.Boolean.parseBoolean(
        conf.getConfString(Flag, "false").trim)) plan
    else plan.transform {
      case a: Aggregate => a.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, None, _)
            if c.children.size == 1 && supported(c.children.head.dataType) =>
          val x = c.children.head
          // the shared hash recipe: first 15 md5 hex digits as a uniform
          // 60-bit value (identical to Sketches.qKmvDistinct, so a flipped
          // session estimates exactly what the gated query estimates)
          // post-analysis rule: no implicit casts happen here, so the md5
          // input must be BINARY explicitly (string → utf8 bytes, the same
          // coercion the analyzer inserts for md5(string))
          val hash = Cast(Conv(Substring(
            Md5(Cast(Cast(x, StringType), BinaryType)),
            Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)
          val sk = ae.copy(aggregateFunction = KmvAgg(hash, Literal(K)),
            isDistinct = false)
          val nKept = Cast(GetStructField(sk, 0, Some("n_kept")), LongType)
          val kth = GetStructField(sk, 1, Some("kth"))
          If(LessThan(nKept, Literal(K.toLong)),
            nKept,
            Cast(Divide(Literal((K - 1).toDouble * 1152921504606846976.0),
              Cast(kth, DoubleType)), LongType))
      }
    }

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: StringType => true
    case _ => false
  }
}
