package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, GenericInternalRow, JoinedRow, RowNumber, SortOrder, UnsafeProjection, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** The (c)-tier operator extension: partition-less
  * `row_number() OVER (ORDER BY ...)` executed as a DISTRIBUTED
  * range-partitioned rank instead of Spark's single-task WindowExec.
  *
  * Spark's built-in plan for a global rank moves EVERY row into one
  * partition (the WindowExec warning this repo's WindowAuditSpec polices)
  * — the round-7/8 anti-pattern this round eliminated query-by-query
  * with [[graft.core.BandedRank]]. This extension closes the remaining
  * hole: a USER's own naive query gets the scale-safe plan without
  * rewriting their code. Opt-in via `spark.graft.distributedRank=true`:
  *
  *  1. [[DistributedRankRewrite]] (a `Rule[LogicalPlan]`) matches a
  *     `Window` node whose only window expression is `row_number()` with
  *     an EMPTY partition spec and swaps in the custom logical node;
  *  2. [[DistributedGlobalRank]] (the logical node) carries the rank
  *     attribute (same exprId, so downstream references resolve
  *     untouched) and the order;
  *  3. [[DistributedRankStrategy]] (a `SparkStrategy`) plans it as
  *     [[GlobalRankExec]];
  *  4. [[GlobalRankExec]] requires `OrderedDistribution` — Spark's
  *     EnsureRequirements inserts a RANGE exchange (sampled boundaries,
  *     a distributed sort across the cluster) — then runs one light job
  *     counting rows per partition and assigns `rank = broadcast prefix
  *     offset + local position`, the zipWithIndex construction. The
  *     shuffle files from the count pass are reused by the main pass, so
  *     the data moves once.
  *
  * Semantics are IDENTICAL to the window (same Int rank type, same
  * tie behavior: deterministic only when the order is total — the same
  * contract WindowExec has). Proven through the DuckDB gate by
  * `q_fact_rank_dist` (the naive window formulation under the flag,
  * compared against the plain `row_number()` oracle) and by
  * DistributedRankSpec's flag-on == flag-off equality.
  */
object DistributedRank {
  val Flag = "spark.graft.distributedRank"

  /** Idempotent runtime installation (the Verify/Bench path where
    * `spark.sql.extensions` cannot be set post-hoc): registers the
    * optimizer rule and planner strategy on the session's experimental
    * hooks. Inert until the flag is set. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.exists(
        _.isInstanceOf[DistributedRankStrategy.type]))
      spark.experimental.extraStrategies =
        DistributedRankStrategy +: spark.experimental.extraStrategies
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[DistributedRankRewrite.type]))
      spark.experimental.extraOptimizations =
        DistributedRankRewrite +: spark.experimental.extraOptimizations
  }
}

/** Logical placeholder for the distributed global rank; output = child
  * columns plus the rank attribute under its ORIGINAL exprId. */
case class DistributedGlobalRank(rankAttr: Attribute, order: Seq[SortOrder],
                                 child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): DistributedGlobalRank = copy(child = newChild)
}

/** The rewrite: a naive global row_number window becomes the distributed
  * rank node. Two triggers:
  *  - session-wide: `spark.graft.distributedRank=true` (every matching
  *    window in the session rewrites — the AQP-dial shape of
  *    [[SketchDistinctRewrite]]);
  *  - per-query: the rank column is NAMED with the `__dist_rank` prefix
  *    — the marker survives inside the plan itself, so EVERY
  *    QueryExecution built over it (including the fresh one a
  *    `df.write` constructs) rewrites deterministically without flipping
  *    session state for neighboring queries.
  * Scope guards: exactly one window expression, it is `row_number()`,
  * the partition spec is empty, the order is non-empty (RowNumber
  * ignores its frame, so any frame matches). Idempotent — the output
  * contains no Window node. */
object DistributedRankRewrite extends Rule[LogicalPlan] {
  val NameMarker = "__dist_rank"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // parseBoolean never throws — a malformed flag value must not crash
    // EVERY query's optimization in the session (review finding)
    val flagOn = java.lang.Boolean.parseBoolean(
      conf.getConfString(DistributedRank.Flag, "false").trim)
    plan.transform {
      case Window(Seq(a @ Alias(
            WindowExpression(_: RowNumber,
              WindowSpecDefinition(Nil, order, _)), _)),
          Nil, _, child, _)
          if order.nonEmpty && (flagOn || a.name.startsWith(NameMarker)) =>
        DistributedGlobalRank(a.toAttribute, order, child)
    }
  }
}

/** Plans the logical node; everything else falls through. */
object DistributedRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DistributedGlobalRank(rank, order, child) =>
      GlobalRankExec(rank, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical distributed global rank. `OrderedDistribution` makes
  * EnsureRequirements range-shuffle the child (a distributed sort whose
  * partition boundaries respect the order), after which rank assignment
  * is per-partition local work plus a broadcast offset table — the same
  * cost structure as `q_fact_rank`'s banded decomposition, derived
  * automatically. */
case class GlobalRankExec(rankAttr: Attribute, order: Seq[SortOrder],
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(order))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val input = child.execute()
    // pass 1 (light): rows per partition — the shuffle written for this
    // job is reused by pass 2, so the data is exchanged once
    val counts = input.mapPartitions({ it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }, preservesPartitioning = true).collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val outAttrs = output
    input.mapPartitionsWithIndex { (idx, it) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var rn = offsets(idx)
      it.map { row =>
        rn += 1
        // row_number is IntegerType (the window's own type and overflow
        // contract); the Long counter guards the offset arithmetic only
        rankRow.setInt(0, rn.toInt)
        proj(joined(row, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): GlobalRankExec = copy(child = newChild)
}
