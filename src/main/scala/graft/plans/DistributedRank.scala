package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Cast, CumeDist, CurrentRow, DenseRank, Expression, GenericInternalRow, JoinedRow, Lag, Lead, NamedExpression, NthValue, NTile, PercentRank, Rank, RangeFrame, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{First, Last}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ByteType, DataType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType}

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
    // stddev/variance-over-window decomposition (r14) — must precede the
    // routing decision, which the shared fixed-point batch guarantees
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[WindowVarianceDecompose.type]))
      spark.experimental.extraOptimizations =
        WindowVarianceDecompose +: spark.experimental.extraOptimizations
    // literal-offset RANGE-frame collapse (r14) — composes with the
    // decomposition above in the same fixed-point batch
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[RangeFrameCollapse.type]))
      spark.experimental.extraOptimizations =
        RangeFrameCollapse +: spark.experimental.extraOptimizations
    // stacked-window merge (r14 optimization round) — collapses the
    // Project-separated window stacks the decomposition leaves behind so
    // one DistributedWindowExec serves the whole stack; same fixed-point
    // batch, so it composes with the conversion in either firing order.
    // CollapseProject rides along because the extra-optimizations batch
    // does not include the main operator-optimization rules: without it
    // the decompose rule's formula Project stacks on the analyzer's
    // window-input Project and the merge rule's single-Project pattern
    // never sees the composed shape.
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[WindowStackMerge.type]))
      spark.experimental.extraOptimizations =
        Seq(WindowStackMerge,
          org.apache.spark.sql.catalyst.optimizer.CollapseProject) ++
          spark.experimental.extraOptimizations
  }
}

/** Routing transparency for the window extension: every Window node the
  * rewrite CONSIDERED (flag on or marker present) but DECLINED is recorded
  * here with the offending function + frame and the reason, and logged
  * once — so a user can SEE why a window stayed on WindowExec instead of
  * silently getting the single-task plan (r11 VERDICT item 6; the
  * motivating shape is RANGE-frame nth_value, whose null-vs-value answer
  * needs run-end lookahead). JVM-scoped, insertion-ordered, deduped,
  * bounded — a diagnostic ring, not a metrics system. */
object DistributedRankDiagnostics {
  private val MaxEntries = 64
  private val entries = new java.util.LinkedHashSet[String]()
  private[plans] def record(msg: String): Boolean = entries.synchronized {
    val fresh = entries.add(msg)
    if (entries.size > MaxEntries) {
      val it = entries.iterator(); it.next(); it.remove()
    }
    fresh
  }
  /** Recent declined-window descriptions, oldest first. */
  def declined: Seq[String] = entries.synchronized {
    import scala.jdk.CollectionConverters._
    entries.iterator().asScala.toSeq
  }
  def clear(): Unit = entries.synchronized(entries.clear())

  /** Milliseconds a DistributedWindowExec run spent on the driver between
    * its two jobs — prefix-merge plus every cross-partition chain (peer
    * runs, lag tails, lead/nth heads) — keyed by the PHYSICAL NODE's id,
    * so concurrent window queries (parallel suites, simultaneous sessions)
    * record independently instead of racing one JVM-global (r12 ADVICE).
    * The r11 VERDICT asked this cost to be PRICED at cluster partition
    * counts: it is a handful of linear walks over O(partitions) stats,
    * and DistributedRankSpec pins ITS OWN exec's value sub-second at a
    * 4096-partition exchange. Bounded like the declined ring. */
  private val chainMillis =
    new java.util.LinkedHashMap[Int, java.lang.Double]() {
      // insertion-ordered bound (r13 ADVICE): eviction drops the OLDEST
      // entry, never a concurrently running exec's just-written value —
      // a fresh exec records after it finishes, so its entry is youngest
      // exactly when its spec is about to read it
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, java.lang.Double]): Boolean =
        size() > 256
    }
  private[plans] def recordChain(id: Int, ms: Double): Unit =
    chainMillis.synchronized { chainMillis.put(id, ms); () }
  /** Chain-assembly cost of the exec with physical-plan id `id` (0.0 if
    * it has not run). */
  def chainMillisFor(id: Int): Double = chainMillis.synchronized {
    Option(chainMillis.get(id)).fold(0.0)(_.doubleValue())
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

/** The rewrite: a naive window becomes a distributed-window node. Two
  * triggers with DIFFERENT scopes (r9 ADVICE: a session flag must not
  * turn working queries into runtime failures):
  *  - session-wide `spark.graft.distributedRank=true` rewrites every
  *    GLOBAL (empty partition spec) window — those are exactly the
  *    single-task WindowExec plans, so the swap is always a win — and
  *    (r11) GROUPED windows routed by a stats-driven cardinality
  *    estimate: the size-based pair (ntile/percent_rank) needs the
  *    driver's per-group totals map, so a grouped rewrite happens only
  *    when catalog/CBO statistics PROVE the group count is at most
  *    [[DistributedRankRewrite.AutoGroupThreshold]] (conf-overridable) —
  *    unknown stats keep WindowExec, so the budget abort is unreachable
  *    from the session dial; every other shape runs in the exec's
  *    BOUNDARY-stats mode (driver state O(partitions), no budget at any
  *    cardinality), so it rewrites by default and stats only steer
  *    PERFORMANCE: a proven-high-cardinality key stays on WindowExec,
  *    whose hash exchange is already the right plan for many small
  *    groups and skips the range-sampling + pass-1 overhead;
  *  - per-query: a window column NAMED `__dist_rank` or
  *    `__dist_rank_<suffix>` (exact name or the reserved `_`-separated
  *    prefix — a bare `startsWith` would let an unrelated user column
  *    like `__dist_rankings` swap physical execution; r8 ADVICE) opts a
  *    GROUPED window in explicitly. The marker survives inside the plan
  *    itself, so EVERY QueryExecution built over it (including the fresh
  *    one a `df.write` constructs) rewrites deterministically without
  *    flipping session state for neighboring queries. Size-based grouped
  *    rewrites remain marker-only without stats because their
  *    driver-side totals map is budgeted
  *    ([[DistributedWindowExec.MaxCollectedGroups]]) — a
  *    high-cardinality partition key fails loudly mid-job, which is an
  *    acceptable contract for an explicit opt-in but not for a session
  *    dial.
  * Supported window-expression shapes (r10 — r9 shipped row_number +
  * running sum):
  *  - `row_number()`, `rank()`, `dense_rank()`, `percent_rank()`,
  *    `ntile(b)` (literal b), and `cume_dist()` (r11) over any partition
  *    spec (they ignore or fix their own frame); the size-based trio
  *    (percent_rank/ntile/cume_dist) reads its group total from the
  *    driver's prefix-merge endpoint — one O(groups) broadcast map, no
  *    extra pass — and cume_dist additionally reads each straddling
  *    run's END row count from a backward driver row chain;
  *  - `sum/min/max/count/avg(expr)` over `ROWS|RANGE UNBOUNDED
  *    PRECEDING .. CURRENT ROW` (the resolved default frame of an ORDER
  *    BY window), non-DISTINCT, un-FILTERed, over any numeric INCLUDING
  *    DecimalType (r14 — exact Decimal accumulation with WindowExec's
  *    per-row overflow contract; any type for `count`) — the
  *    running-total/extreme family;
  *  - the same five aggregates over a BOUNDED moving frame `ROWS
  *    BETWEEN k PRECEDING AND CURRENT ROW` with a literal k in
  *    [1, [[DistributedWindowExec.MaxLagOffset]]] (r11) — replayed from
  *    the same bounded per-group trailing ring lag uses, re-evaluated
  *    oldest→newest per row exactly as WindowExec's sliding frame does
  *    (so double sums match bitwise), history driver-chained across
  *    partition boundaries. Wider frames (and RANGE offset frames)
  *    belong on entity-keyed WindowExec;
  *  - `lag(expr, k [, default])` with a literal k in
  *    [1, [[DistributedWindowExec.MaxLagOffset]]], literal default, no
  *    IGNORE NULLS, numeric expr — replayed through a bounded per-group
  *    ring with driver-chained history across partition boundaries;
  *  - `lead(expr, k [, default])` under the same bounds (r11 — the r10
  *    documented gap): lead needs row LOOKAHEAD, so the exec holds a
  *    bounded pending buffer of ≤ max-offset rows per partition — the
  *    one shape that pays a per-row copy — and the driver chains each
  *    partition's trailing rows' lookahead from the LEADING values of
  *    the same group in later partitions (lag's tail chain, mirrored);
  *  - `first_value(expr)` and `nth_value(expr, k)` (literal k ≤
  *    MaxLagOffset), both null modes, over ANY running frame (ROWS or
  *    RANGE), replayed from a bounded first-k head buffer the driver
  *    chains FORWARD across partitions (r11). Under RANGE the
  *    null-vs-value answer depends on the current peer RUN's global end
  *    (r13 — previously declined): the answer is a per-RUN constant,
  *    decided by the cume_dist run-end machinery and served from the
  *    head buffer after the whole local run is captured, or from the
  *    BACKWARD head chain when a straddling run reaches its k-th
  *    value in a later partition. `last_value(expr) IGNORE NULLS`
  *    (the forward-fill carry) likewise runs under both frames — RANGE
  *    answers with the run-continuation's last non-null (a backward
  *    driver chain) orElse the local carry (r13).
  * The node rewrites only when EVERY window expression on it is
  * supported (one unsupported neighbor keeps the whole node on
  * WindowExec — correctness first) and the order is non-empty. The pure
  * global single-row_number shape keeps the dedicated r8 operator
  * ([[DistributedGlobalRank]]); everything else becomes
  * [[DistributedWindow]]. Idempotent — the output contains no Window
  * node. */
object DistributedRankRewrite extends Rule[LogicalPlan] {
  val NameMarker = "__dist_rank"

  /** Flag-auto grouped routing threshold: a key with at most this many
    * estimated distinct groups hash-exchanges into too few WindowExec
    * tasks (skew), so the range-partitioned operator wins; above it,
    * WindowExec's hash exchange is already the scale-correct plan. */
  val AutoGroupThreshold: Long = 4096L
  val AutoGroupThresholdKey = "spark.graft.distributedWindow.autoGroupThreshold"

  /** DEFAULT-ON size gate (r13 — the r12 VERDICT's default-on decision):
    * with `spark.graft.distributedRank.auto` (default TRUE), a GLOBAL
    * (partition-less) window whose child's estimated size reaches this
    * many bytes routes to the distributed operator WITHOUT any flag or
    * marker — a naive user's fact-scale global window gets the
    * scale-safe plan with no code change, which is the whole promise.
    * Below the gate, single-task WindowExec keeps the plan: the repo's
    * own 66 justified partition-less windows are all dim-sized bounded
    * aggregates where one task is both safe and FASTER than paying the
    * two-pass range exchange (measured: the 4096-partition spec's
    * tiny-task scheduling overhead is real on local mode, and the r13
    * flag-on parity sweep proves the flip is value-neutral either way).
    * sizeInBytes is Catalyst's always-available estimate; an
    * overestimate routes a window early — a performance trade, never a
    * wrong answer. Grouped windows above the same gate auto-route only
    * on a strict column-stats PROOF of low cardinality (r14 —
    * [[autoGroupedProven]]); without stats they stay flag/marker-routed,
    * because WindowExec's hash exchange is already scale-correct for
    * high-cardinality keys. */
  val AutoGlobalMinBytes: Long = 128L << 20
  val AutoGlobalMinBytesKey = "spark.graft.distributedWindow.autoGlobalMinBytes"
  val AutoKey = "spark.graft.distributedRank.auto"

  private def markerNamed(e: NamedExpression): Boolean =
    e.name == NameMarker || e.name.startsWith(NameMarker + "_")

  private def sizeBased(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(f, WindowSpecDefinition(_, _, frame)), _) =>
      f match {
        case _: PercentRank | _: NTile | _: CumeDist => true
        // whole-group frames need per-group TOTALS — the same budgeted
        // full-stats driver map as the SizeBasedWindowFunctions (r12)
        case AggregateExpression(
            _: Sum | _: Min | _: Max | _: Count | _: Average, _, _, _, _) =>
          frame match {
            case SpecifiedWindowFrame(_, UnboundedPreceding,
                                      UnboundedFollowing) => true
            case _ => false
          }
        case _ => false
      }
    case _ => false
  }

  /** Distinct-group estimate from the plan's OWN statistics (no job, no
    * sampling pass): the product of per-attribute distinct counts when
    * column stats (ANALYZE TABLE ... FOR COLUMNS + CBO propagation)
    * exist for every group expression, else the plan's row count as an
    * upper bound, else unknown.
    *
    * STALENESS CAVEAT (r11 ADVICE): these are catalog statistics — an
    * ANALYZE taken once on a table that then grows makes the estimate an
    * under-count, and a size-based grouped window the flag routed in on
    * stale "proof" can still hit the FULL-mode MaxCollectedGroups abort
    * mid-job. The margin is deliberate: routing needs est ≤ 4096
    * (AutoGroupThreshold) while the abort fires at 2^20 collected groups,
    * so stats must be ~256× stale before the abort is reachable from the
    * session dial — and the abort is a loud AnalysisException naming the
    * re-ANALYZE remedy, never a wrong answer. Opt-in marker routing
    * (NameMarker) carries no stats check and owns its budget by contract. */
  private def estimatedGroups(child: LogicalPlan,
                              groups: Seq[Expression]): Option[BigInt] =
    statsProvenGroups(child, groups).orElse(child.stats.rowCount)

  /** The strict column-stats-only estimate: the product of per-attribute
    * distinct counts when ANALYZE'd column stats (CBO-propagated) exist
    * for EVERY group expression — no row-count fallback. This is the
    * PROOF the default-on grouped path requires (r14); the session-flag
    * path accepts the row-count upper bound too ([[estimatedGroups]]). */
  private def statsProvenGroups(child: LogicalPlan,
                                groups: Seq[Expression]): Option[BigInt] = {
    val st = child.stats
    val attrs = groups.map {
      case a: Attribute => Some(a)
      case Alias(a: Attribute, _) => Some(a)
      case _ => None
    }
    if (attrs.nonEmpty && attrs.forall(_.isDefined)) {
      val ds = attrs.flatten
        .map(a => st.attributeStats.get(a).flatMap(_.distinctCount))
      if (ds.forall(_.isDefined)) Some(ds.flatten.product) else None
    } else None
  }

  /** DEFAULT-ON grouped routing (r14 — r13 VERDICT item 2): with the
    * auto conf on, a GROUPED window whose child crosses the same size
    * gate as the global path auto-routes ONLY when column statistics
    * PROVE the group count is at most the threshold — a proven-low-
    * cardinality key hash-exchanges into that few WindowExec tasks (the
    * skew the operator exists to kill), while unknown or proven-high
    * stats keep WindowExec, whose hash exchange is already the right
    * plan for many small groups. Strictly narrower than the session
    * flag's routing (which defaults unknown-stats non-size-based shapes
    * IN): a default must never surprise, so no proof → no flip. The
    * proof also bounds the size-based shapes' driver totals map, and
    * [[DistributedWindowExec.MaxCollectedGroups]] still backstops stale
    * stats with a loud abort (see the staleness caveat above). */
  private def autoGroupedProven(groups: Seq[Expression],
                                child: LogicalPlan): Boolean = {
    val threshold = BigInt(
      scala.util.Try(conf.getConfString(AutoGroupThresholdKey,
        AutoGroupThreshold.toString).trim.toLong)
        .getOrElse(AutoGroupThreshold))
    statsProvenGroups(child, groups).exists(_ <= threshold)
  }

  /** Flag-auto routing for a GROUPED window (scaladoc above): size-based
    * shapes need stats PROOF of low cardinality (their driver map is
    * budgeted); every other shape runs in the exec's O(partitions)
    * boundary-stats mode, so it defaults IN and stats only steer a
    * proven-high-cardinality key back to WindowExec for performance. */
  private def autoGroupedRoute(exprs: Seq[NamedExpression],
                               groups: Seq[Expression],
                               child: LogicalPlan): Boolean = {
    // Try for the same malformed-conf-must-not-throw invariant as the
    // size gate and the boolean flag parses
    val threshold = BigInt(
      scala.util.Try(conf.getConfString(AutoGroupThresholdKey,
        AutoGroupThreshold.toString).trim.toLong)
        .getOrElse(AutoGroupThreshold))
    val est = estimatedGroups(child, groups)
    if (exprs.exists(sizeBased)) est.exists(_ <= threshold)
    else est.forall(_ <= threshold)
  }

  /** The supported function/frame shapes; sync the scaladoc above.
    * (`private[plans]`: [[WindowStackMerge]] consults it so a merge can
    * never change a node's route — see its routing-compatibility guard.) */
  private[plans] def supported(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(f, WindowSpecDefinition(_, order, frame)), _)
        if order.nonEmpty =>
      def runningFrame: Boolean = frame match {
        case SpecifiedWindowFrame(RowFrame | RangeFrame,
                                  UnboundedPreceding, CurrentRow) => true
        case _ => false
      }
      // ROWS BETWEEN k PRECEDING AND CURRENT ROW, literal k within the
      // ring budget (r11) — RANGE offset frames stay on WindowExec
      def rollingFrame: Boolean = frame match {
        case SpecifiedWindowFrame(RowFrame, lo, CurrentRow)
            if lo.foldable && lo != UnboundedPreceding && lo != CurrentRow =>
          lo.eval() match {
            case i: Int =>
              i <= -1 && i >= -DistributedWindowExec.MaxLagOffset
            case _ => false
          }
        case _ => false
      }
      // ROWS/RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING:
      // the aggregate is a per-GROUP constant — served from the budgeted
      // full-stats totals map (the ntile/percent_rank machinery), zero
      // extra passes and zero buffering (r12)
      def fullFrame: Boolean = frame match {
        case SpecifiedWindowFrame(RowFrame | RangeFrame,
                                  UnboundedPreceding, UnboundedFollowing) =>
          true
        case _ => false
      }
      def aggFrame: Boolean = runningFrame || rollingFrame || fullFrame
      def numeric(dt: DataType): Boolean = dt match {
        case ByteType | ShortType | IntegerType | LongType
             | FloatType | DoubleType => true
        case _ => false
      }
      // r14: DECIMAL joins the aggregate family (sum/min/max/avg) — the
      // warehouse's own money columns are NUMERIC(12,2) (SURVEY §1.2;
      // reference combined_dw_schema.sql:66,84), so a fact-scale running
      // SUM(expense_amount) previously fell back to the single-task
      // WindowExec the operator exists to kill (r13 VERDICT item 1).
      // Decimal slots accumulate in Spark's exact Decimal (a third
      // accumulator channel beside the Long/Double pair), so block
      // association cannot diverge; overflow is checked at EMISSION per
      // row, the same point WindowExec's CheckOverflow fires. Offset
      // functions (lag/lead/first/nth/last) stay numeric-only: their
      // value channel is a primitive ring, and no mandate shape needs
      // decimal offsets.
      def aggInput(dt: DataType): Boolean =
        numeric(dt) || dt.isInstanceOf[DecimalType]
      f match {
        case _: RowNumber | _: Rank | _: DenseRank | _: PercentRank => true
        // cume_dist = (global index of the current run's END) / n: the
        // size-based machinery supplies n, the peer-run chain the end
        case _: CumeDist => true
        // ntile/percent_rank are SizeBasedWindowFunctions: the group
        // total they need is exactly the driver's prefix-merge endpoint,
        // so they cost one extra broadcast map, no extra pass
        case NTile(b) => b.foldable && (b.eval() match {
          case i: Int => i > 0
          case _ => false
        })
        case AggregateExpression(Sum(se, _), _, false, None, _) =>
          aggInput(se.dataType) && aggFrame
        case AggregateExpression(Min(se), _, false, None, _) =>
          aggInput(se.dataType) && aggFrame
        case AggregateExpression(Max(se), _, false, None, _) =>
          aggInput(se.dataType) && aggFrame
        case AggregateExpression(Average(se, _), _, false, None, _) =>
          aggInput(se.dataType) && aggFrame
        case AggregateExpression(c: Count, _, false, None, _) =>
          c.children.size == 1 && aggFrame
        // lag/lead ignore their frame (offset functions); literal offsets
        // in [1, MaxLagOffset] bound the per-group replay ring (lag) and
        // the per-partition pending buffer (lead). IGNORE NULLS variants
        // route too (r12): lag's ring simply skips null pushes; lead's
        // pending wait becomes null-run-bounded instead of offset-bounded
        // (budgeted — MaxPendingLead fails fast on pathological columns,
        // still strictly better than WindowExec's whole-partition buffer)
        case Lag(in, off, dflt, _) =>
          numeric(in.dataType) && off.foldable && (off.eval() match {
            case i: Int =>
              i >= 1 && i <= DistributedWindowExec.MaxLagOffset
            case _ => false
          }) && dflt.foldable &&
            (dflt.eval() == null || dflt.dataType == in.dataType)
        case Lead(in, off, dflt, _) =>
          numeric(in.dataType) && off.foldable && (off.eval() match {
            case i: Int =>
              i >= 1 && i <= DistributedWindowExec.MaxLagOffset
            case _ => false
          }) && dflt.foldable &&
            (dflt.eval() == null || dflt.dataType == in.dataType)
        // first_value (both null modes) over any running frame. RESPECT
        // NULLS is frame-end-independent (the frame always starts at the
        // group head); the IGNORE NULLS twin under RANGE is frame-END-
        // dependent (a null-prefixed peer run reaches its later non-null)
        // and routes via the exec's per-RUN evaluation: the answer is a
        // peer-run constant served from the run's global END index — the
        // cume_dist machinery — plus the backward head chain for
        // straddling runs (r13; was ROWS-only in r12)
        case AggregateExpression(First(in, _), _, false, None, _) =>
          numeric(in.dataType) && runningFrame
        // last_value IGNORE NULLS over a running frame — the forward-fill
        // carry: latest non-null at or before the frame end. ROWS: a
        // 1-deep skip-null ring chained across partitions like lag's
        // (r12). RANGE (r13): a per-run constant — the run-continuation's
        // last non-null (a backward driver chain) orElse the local carry
        case AggregateExpression(Last(in, true), _, false, None, _) =>
          numeric(in.dataType) && runningFrame
        // nth_value's null-vs-value answer depends on the FRAME END
        // (frame shorter than k rows → NULL). ROWS: the end is the
        // current row (r11). RANGE (r13): the end is the current peer
        // RUN's global end — a per-run constant from the cume_dist run-
        // end machinery, with the k-th value itself read from the head
        // buffer or, for a run straddling forward, the backward head
        // chain. Same for IGNORE NULLS (the k-th NON-NULL in the frame).
        case NthValue(in, off, _) =>
          numeric(in.dataType) && off.foldable && (off.eval() match {
            case i: Int =>
              i >= 1 && i <= DistributedWindowExec.MaxLagOffset
            case _ => false
          }) && runningFrame
        case _ => false
      }
    case _ => false
  }

  /** One human-readable line per window expression the rewrite declines,
    * special-casing the known near-misses (RANGE nth_value) so the
    * diagnostic names the fix, not just the refusal. */
  private def describeDeclined(e: NamedExpression): Option[String] = e match {
    case Alias(WindowExpression(f, WindowSpecDefinition(_, _, frame)), name)
        if !supported(e) =>
      val fn = f match {
        case AggregateExpression(af, _, _, _, _) => af.prettyName
        case other => other.prettyName
      }
      // r13 routed the RANGE per-run family; r14 routed decimal
      // aggregates, and stddev/variance windows now arrive here already
      // decomposed into routable sum/count shapes (WindowVarianceDecompose)
      // — what remains declined is deliberately out of scope
      // (non-literal offsets, DISTINCT/FILTER aggregates, decimal-input
      // OFFSET functions, RANGE offset frames)
      val reason = "unsupported function/frame shape for the distributed window"
      Some(s"declined window '$name' ($fn over ${frame.sql}): $reason")
    case _ => None
  }

  /** The default-on size gate (scaladoc at [[AutoGlobalMinBytes]]).
    * A malformed conf value falls back to the default instead of
    * throwing — this runs inside the optimizer for EVERY global window,
    * so a typo'd session conf must not fail unrelated queries (the same
    * invariant the boolean flag parse below holds). */
  private def autoGlobalRoute(child: LogicalPlan): Boolean = {
    val minBytes = BigInt(
      scala.util.Try(conf.getConfString(AutoGlobalMinBytesKey,
        AutoGlobalMinBytes.toString).trim.toLong)
        .getOrElse(AutoGlobalMinBytes))
    child.stats.sizeInBytes >= minBytes
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // parseBoolean never throws — a malformed flag value must not crash
    // EVERY query's optimization in the session (review finding)
    val flagOn = java.lang.Boolean.parseBoolean(
      conf.getConfString(DistributedRank.Flag, "false").trim)
    val autoOn = java.lang.Boolean.parseBoolean(
      conf.getConfString(AutoKey, "true").trim)
    // routing transparency: a node the user ASKED to route (flag or
    // marker) that stays on WindowExec gets its declined shapes recorded
    // + logged once (dedup in the diagnostics ring — this rule re-runs
    // per optimizer batch)
    plan.foreach {
      case Window(exprs, _, _, _, _)
          if exprs.nonEmpty && !exprs.forall(supported) &&
             (flagOn || exprs.exists(markerNamed)) =>
        exprs.flatMap(describeDeclined).foreach { msg =>
          if (DistributedRankDiagnostics.record(msg)) logInfo(msg)
        }
      case _ =>
    }
    plan.transform {
      // the r8 operator: pure global single row_number
      case Window(Seq(a @ Alias(
            WindowExpression(_: RowNumber,
              WindowSpecDefinition(Nil, order, _)), _)),
          Nil, _, child, _)
          if order.nonEmpty && (flagOn || markerNamed(a) ||
            (autoOn && autoGlobalRoute(child))) =>
        DistributedGlobalRank(a.toAttribute, order, child)
      // the generalized operator; the flag reaches every GLOBAL window
      // and stats-routed GROUPED windows (r11); the explicit marker
      // reaches everything supported (scaladoc above); and — default-on —
      // a GLOBAL window over a size-gated child routes with no flag or
      // marker at all (r13, scaladoc at AutoGlobalMinBytes), as does a
      // GROUPED window over a size-gated child whose group count column
      // stats PROVE low (r14, scaladoc at autoGroupedProven)
      case Window(exprs, parts, _, child, _)
          if exprs.nonEmpty && exprs.forall(supported) &&
             (exprs.exists(markerNamed) ||
              (flagOn && (parts.isEmpty ||
                autoGroupedRoute(exprs, parts, child))) ||
              (autoOn && autoGlobalRoute(child) &&
                (parts.isEmpty || autoGroupedProven(parts, child)))) =>
        // all expressions on one Window node share (partition, order);
        // take the order from the first spec (the node-level orderSpec
        // can carry extra resolution artifacts)
        val order = exprs.head match {
          case Alias(WindowExpression(_,
            WindowSpecDefinition(_, o, _)), _) => o
          case _ => Nil // unreachable: supported() proved the shape
        }
        DistributedWindow(exprs, parts, order, child)
    }
  }
}

/** Logical placeholder for the generalized distributed window: the
  * ORIGINAL window expressions are kept verbatim (Alias over
  * WindowExpression, same exprIds — downstream references resolve
  * untouched, and QueryPlan's expression traversal sees every column
  * the functions reference). */
case class DistributedWindow(windowExprs: Seq[NamedExpression],
                             groups: Seq[Expression], order: Seq[SortOrder],
                             child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] =
    child.output ++ windowExprs.map(_.toAttribute)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): DistributedWindow = copy(child = newChild)
}

/** Plans the logical nodes; everything else falls through. */
object DistributedRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DistributedGlobalRank(rank, order, child) =>
      GlobalRankExec(rank, order, planLater(child)) :: Nil
    case DistributedWindow(exprs, groups, order, child) =>
      DistributedWindowExec(exprs, groups, order, planLater(child)) :: Nil
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
  // streaming map over the sorted child — declare the child's (possibly
  // finer) ordering, as WindowExec does (see DistributedWindowExec)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
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
    RankOverflow.check(offsets.last) // fail fast, not wrap (r8 VERDICT #6)
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

/** Shared fail-fast guard for the IntegerType `row_number`/`rank` both
  * physical operators inherit from the window they replace: a rank past
  * Int.MaxValue would wrap silently in `toInt`, so the operators refuse
  * loudly instead (r8 VERDICT item 6 — the 2³¹ ceiling is now a STATED,
  * guarded contract). Emitting LongType instead would change the result
  * schema the oracle gate pins; a single ORDER BY group past 2³¹ rows is
  * also the point where the caller should rank banded/bucketed
  * ([[graft.core.BandedRank]]) rather than totally. The check runs on
  * DRIVER-side totals (per partition for the global rank, per group for
  * the grouped form), so the per-row hot path pays nothing. */
private[graft] object RankOverflow {
  def check(total: Long): Unit =
    if (total > Int.MaxValue.toLong) throw new ArithmeticException(
      s"distributed row_number would reach $total > Int.MaxValue: the " +
      "window's IntegerType rank cannot represent it; rank within narrower " +
      "partitions or use graft.core.BandedRank's LongType decomposition")
}

/** Physical generalized distributed window ([[DistributedWindow]]).
  * `OrderedDistribution` over (groups..., order...) makes
  * EnsureRequirements range-shuffle the child, so groups are CONTIGUOUS
  * runs in partition order — a huge group spans many partitions instead
  * of hash-exchanging into one task, which is the entire point — and
  * order-peers are nearly co-located. Each function is then
  * per-partition local work plus a per-(partition, group) offset table:
  *
  *  - pass 1 (light; its shuffle files are reused by pass 2, so the data
  *    moves once): per partition, per contiguous group run, the row
  *    count, each aggregate's (sum-or-extreme, non-null count), the
  *    peer-run count, and the first/last peer run's keys, row counts and
  *    partial aggregates;
  *  - driver: prefix-merge per group across partitions in partition
  *    order. Since groups are CONTIGUOUS, only each partition's FIRST
  *    and LAST group run can cross a boundary, so pass 1 retains just
  *    those two per partition (BOUNDARY mode, r11): driver state is
  *    O(partitions) at ANY group cardinality, and contained groups read
  *    zero prefix offsets by default. The one exception is the
  *    size-based pair (ntile/percent_rank), which needs a TOTAL per
  *    group — FULL mode retains every run's stat, O(Σ per-partition
  *    distinct groups), guarded by
  *    [[DistributedWindowExec.MaxCollectedGroups]] (a high-cardinality
  *    partition key with size-based functions belongs on plain
  *    WindowExec, whose hash exchange is already the scale-correct plan
  *    for many small groups). The driver also
  *    CHAINS peer runs across partition boundaries: `OrderedDistribution`
  *    is prefix-satisfiable, so a child already range-partitioned on a
  *    strictly FINER ordering (e.g. (flag, cents, orderkey) when the
  *    exec requires (flag, cents)) satisfies the requirement without a
  *    fresh exchange and an order-peer run CAN straddle partitions (r9
  *    ADVICE). The forward chain yields each partition's
  *    continuing-leading-run row count (rank/dense_rank continuation and
  *    double-count correction); a backward chain yields each partition's
  *    trailing-run tail contribution from later partitions (RANGE-frame
  *    aggregates must report the sum/extreme through the END of the
  *    run). Under a fresh exchange equal keys co-locate and every
  *    adjustment is zero — the common path costs nothing;
  *  - pass 2: stream each partition in order, resetting local state at
  *    group boundaries seeded from the group's offsets.
  *
  * RANGE frames buffer one PEER RUN at a time — bounded by the widest
  * tie, never the partition (WindowExec buffers whole window partitions).
  * ROWS frames, `row_number`, `rank` and `dense_rank` stream row-by-row
  * with no copies.
  *
  * Numeric semantics: Long sums honor the SESSION's ANSI setting — throw
  * on overflow when `spark.sql.ansi.enabled` is true, wrap (Java `+`)
  * when false — matching WindowExec's Add behavior in both modes (r9
  * VERDICT 4a). Double sums/averages accumulate per partition and add
  * the broadcast offset (block association), while WindowExec
  * accumulates strictly sequentially: results can differ in final-ULP
  * rounding on pathological float data — the standard distributed-FP
  * caveat, pinned with a tolerance comparison in DistributedRankSpec.
  * A running aggregate whose prefix is all-NULL is NULL, tracked via the
  * non-null counts; `count` is never NULL. */
case class DistributedWindowExec(windowExprs: Seq[NamedExpression],
                                 groups: Seq[Expression],
                                 order: Seq[SortOrder],
                                 child: SparkPlan) extends UnaryExecNode {
  import DistributedWindowExec._

  override def output: Seq[Attribute] =
    child.output ++ windowExprs.map(_.toAttribute)
  private def groupSort: Seq[SortOrder] =
    groups.map(g => SortOrder(g, Ascending))
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(groupSort ++ order))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupSort ++ order)
  // pass-2 is a streaming map over the sorted child, so the emitted order
  // is the CHILD's — declare it (WindowExec does the same) rather than the
  // coarser groupSort ++ order: when a lower stacked window or the
  // pre-sort carries a FINER ordering that already matches the terminal
  // presentation ORDER BY, EnsureRequirements can elide that final Sort
  // (r14 optimization round — q_fact_rolling_dist's plan kept a
  // full-width re-sort of already-sorted rows under the old declaration)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override def outputPartitioning = child.outputPartitioning

  /** Decode the supported window shapes (the rewrite proved them). */
  private def decode(): Array[FuncSpec] = windowExprs.map {
    case Alias(WindowExpression(f, WindowSpecDefinition(_, _, frame)), _) =>
      def peer: Boolean = frame match {
        case SpecifiedWindowFrame(RangeFrame, _, _) => true
        case _ => false
      }
      // ROWS k PRECEDING .. CURRENT ROW → k; the running frames → 0
      def slide: Int = frame match {
        case SpecifiedWindowFrame(RowFrame, lo, CurrentRow)
            if lo != UnboundedPreceding && lo.foldable =>
          lo.eval() match { case i: Int if i < 0 => -i; case _ => 0 }
        case _ => 0
      }
      def accDouble(dt: DataType): Boolean = dt match {
        case FloatType | DoubleType => true
        case _ => false
      }
      def agg(expr: Expression, kind: AggKind, isDouble: Boolean,
              outType: DataType, dec: DecInfo = null): FuncSpec = {
        val k = slide
        val full = frame match {
          case SpecifiedWindowFrame(RowFrame | RangeFrame,
                                    UnboundedPreceding, UnboundedFollowing) =>
            true
          case _ => false
        }
        if (k > 0) RollSpec(expr, k, kind, isDouble, outType, dec)
        // a whole-group frame is a per-group constant: no peer-run
        // accumulation (the value is frame-independent), served from the
        // driver's full-stats totals instead of the running prefix
        else AggSpec(expr, peer = peer && !full, kind, isDouble, outType,
          full = full, dec = dec)
      }
      def offsetDefault(dflt: Expression): (Boolean, Long, Double) =
        dflt.eval() match {
          case null => (true, 0L, 0d)
          case b: Byte => (false, b.toLong, 0d)
          case sh: Short => (false, sh.toLong, 0d)
          case i: Int => (false, i.toLong, 0d)
          case l: Long => (false, l, 0d)
          case fl: Float => (false, 0L, fl.toDouble)
          case db: Double => (false, 0L, db)
          case other => throw new IllegalStateException(
            s"unexpected offset-function default: $other")
        }
      f match {
        case _: RowNumber => RowNumSpec
        case _: Rank => RankSpec
        case _: DenseRank => DenseRankSpec
        case _: PercentRank => PercentRankSpec
        case NTile(b) => NTileSpec(b.eval().asInstanceOf[Int])
        case _: CumeDist => CumeDistSpec
        case ae @ AggregateExpression(Sum(se, _), _, _, _, _) =>
          se.dataType match {
            case _: DecimalType =>
              // decimal Sum's buffer AND result type are both
              // DecimalType(min(38, p+10), s): accumulate exactly in it,
              // check precision at per-row emission (WindowExec's
              // CheckOverflow point — null in legacy mode, throw in ANSI)
              val rt = ae.dataType.asInstanceOf[DecimalType]
              agg(Cast(se, rt), SumK, isDouble = false, outType = rt,
                dec = DecInfo(rt.precision, rt.scale, rt.precision, rt.scale))
            case _ =>
              // accumulate in the Sum's own result type (LongType for
              // integral inputs, DoubleType for fractional) via a widening
              // cast, so pass-1/pass-2 arithmetic matches the window's
              agg(Cast(se, ae.dataType), SumK,
                isDouble = ae.dataType == DoubleType, outType = ae.dataType)
          }
        case AggregateExpression(Min(se), _, _, _, _) =>
          se.dataType match {
            case dt: DecimalType =>
              // extremes return one of the INPUTS — no widening, no
              // overflow check
              agg(se, MinK, isDouble = false, outType = dt,
                dec = DecInfo(dt.precision, dt.scale, dt.precision, dt.scale))
            case _ =>
              val d = accDouble(se.dataType)
              agg(Cast(se, if (d) DoubleType else LongType), MinK,
                isDouble = d, outType = se.dataType)
          }
        case AggregateExpression(Max(se), _, _, _, _) =>
          se.dataType match {
            case dt: DecimalType =>
              agg(se, MaxK, isDouble = false, outType = dt,
                dec = DecInfo(dt.precision, dt.scale, dt.precision, dt.scale))
            case _ =>
              val d = accDouble(se.dataType)
              agg(Cast(se, if (d) DoubleType else LongType), MaxK,
                isDouble = d, outType = se.dataType)
          }
        case ae @ AggregateExpression(Average(se, _), _, _, _, _) =>
          se.dataType match {
            case dt: DecimalType =>
              // decimal Average: sum in DecimalType(min(38, p+10), s)
              // (Spark's own buffer), result DecimalType(min(38, p+4),
              // min(38, s+4)); emission replays Spark's exact pipeline —
              // CheckOverflowInSum on the sum, Decimal./ at scale 38,
              // CheckOverflow to the Divide's result scale, Cast to the
              // result type — all HALF_UP (see emitDec)
              val buf = DecimalType(math.min(38, dt.precision + 10), dt.scale)
              val rt = ae.dataType.asInstanceOf[DecimalType]
              // the Divide intermediate's scale per DecimalPrecision
              // (allowPrecisionLoss): count casts to Decimal(20, 0)
              val rScale0 = math.max(6, buf.scale + 20 + 1)
              val rPrec0 = buf.precision - buf.scale + rScale0
              val divScale =
                if (rPrec0 <= 38) rScale0
                else math.max(38 - (rPrec0 - rScale0), math.min(rScale0, 6))
              agg(Cast(se, buf), AvgK, isDouble = false, outType = rt,
                dec = DecInfo(buf.precision, buf.scale,
                  rt.precision, rt.scale, divScale))
            case _ =>
              // Average sums in DOUBLE for every non-decimal input
              // (Spark's own buffer layout) and emits sum/count
              agg(Cast(se, DoubleType), AvgK,
                isDouble = true, outType = DoubleType)
          }
        case AggregateExpression(c: Count, _, _, _, _) =>
          // only the child's null mask matters; the value is never read
          agg(c.children.head, CountK, isDouble = false, outType = LongType)
        case Lag(in, off, dflt, ign) =>
          val d = accDouble(in.dataType)
          val (dNull, dL, dD) = offsetDefault(dflt)
          LagSpec(Cast(in, if (d) DoubleType else LongType),
            off.eval().asInstanceOf[Int], dNull, dL, dD,
            isDouble = d, outType = in.dataType, ignoreNulls = ign)
        case Lead(in, off, dflt, ign) =>
          val d = accDouble(in.dataType)
          val (dNull, dL, dD) = offsetDefault(dflt)
          LeadSpec(Cast(in, if (d) DoubleType else LongType),
            off.eval().asInstanceOf[Int], dNull, dL, dD,
            isDouble = d, outType = in.dataType, ignoreNulls = ign)
        case AggregateExpression(First(in, ign), _, _, _, _) =>
          val d = accDouble(in.dataType)
          // RESPECT NULLS first is frame-end-independent even under RANGE
          // (the answer is always the group's first row) — keep it on the
          // streaming ROWS path; only the IGNORE NULLS twin needs the
          // per-run RANGE evaluation
          NthSpec(Cast(in, if (d) DoubleType else LongType), 1,
            isDouble = d, outType = in.dataType, ignoreNulls = ign,
            rangeFrame = peer && ign)
        case AggregateExpression(Last(in, true), _, _, _, _) =>
          val d = accDouble(in.dataType)
          LastIgnSpec(Cast(in, if (d) DoubleType else LongType),
            isDouble = d, outType = in.dataType, rangeFrame = peer)
        case NthValue(in, off, ign) =>
          val d = accDouble(in.dataType)
          NthSpec(Cast(in, if (d) DoubleType else LongType),
            off.eval().asInstanceOf[Int],
            isDouble = d, outType = in.dataType, ignoreNulls = ign,
            rangeFrame = peer)
        case other => throw new IllegalStateException(
          s"unsupported window function reached the exec: $other")
      }
    case other => throw new IllegalStateException(
      s"unsupported window expression reached the exec: $other")
  }.toArray

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val funcs = decode()
    val aggs: Array[AggSpec] = funcs.collect { case s: AggSpec => s }
    val nAggs = aggs.length
    val lags: Array[LagSpec] = funcs.collect { case l: LagSpec => l }
    val nLags = lags.length
    val rolls: Array[RollSpec] = funcs.collect { case r: RollSpec => r }
    val nRolls = rolls.length
    val leads: Array[LeadSpec] = funcs.collect { case l: LeadSpec => l }
    val nLeads = leads.length
    // RESPECT NULLS leads resolve positionally: the pending buffer must
    // hold at least their max offset before the head is guaranteed
    // filled. IGNORE NULLS leads resolve by explicit per-entry counters.
    val maxRespLead = leads.filter(!_.ignoreNulls)
      .foldLeft(0)((m, l) => math.max(m, l.off))
    val nIgnLeads = leads.count(_.ignoreNulls)
    val leadFuncIdx: Array[Int] =
      funcs.zipWithIndex.collect { case (_: LeadSpec, i) => i }
    val nths: Array[NthSpec] = funcs.collect { case n: NthSpec => n }
    val nNths = nths.length
    val lastIgns: Array[LastIgnSpec] = funcs.collect { case l: LastIgnSpec => l }
    val nLastIgns = lastIgns.length
    val maxPending =
      if (nIgnLeads == 0) Long.MaxValue
      else conf.getConfString(MaxPendingLeadKey, MaxPendingLead.toString).toLong
    // leading-values ("head") slots: lead lookahead first, then
    // first/nth_value group heads — one shared pass-1 collection and
    // GroupStat layout; the backward lead chain reads slots [0, nLeads),
    // the forward nth chain reads slots [nLeads, nHeads). IGNORE NULLS
    // slots skip null values at capture, so their heads are the first
    // `off` NON-NULL values — the chains are null-layout-agnostic.
    val headOffs: Array[Int] = leads.map(_.off) ++ nths.map(_.k)
    val headExprs: Array[Expression] = leads.map(_.expr) ++ nths.map(_.expr)
    val headIsD: Array[Boolean] = leads.map(_.isDouble) ++ nths.map(_.isDouble)
    val headSkip: Array[Boolean] =
      leads.map(_.ignoreNulls) ++ nths.map(_.ignoreNulls)
    val nHeads = headOffs.length
    // trailing-history ring slots: lag replay rings first, then rolling
    // frames (which need the previous k values of the group), then
    // last_value-IGNORE-NULLS carries (1-deep skip-null rings) — one
    // shared collection/chaining mechanism for all three
    val tailOffs: Array[Int] =
      lags.map(_.off) ++ rolls.map(_.k) ++ lastIgns.map(_ => 1)
    val tailExprs: Array[Expression] =
      lags.map(_.expr) ++ rolls.map(_.expr) ++ lastIgns.map(_.expr)
    val tailIsD: Array[Boolean] =
      lags.map(_.isDouble) ++ rolls.map(_.isDouble) ++ lastIgns.map(_.isDouble)
    val tailSkip: Array[Boolean] =
      lags.map(_.ignoreNulls) ++ rolls.map(_ => false) ++ lastIgns.map(_ => true)
    // decimal ring slots (r14): only rolling frames can carry decimals —
    // lag/lastIgn stay primitive (see supported())
    val tailDec: Array[DecInfo] =
      lags.map(_ => null: DecInfo) ++ rolls.map(_.dec) ++
        lastIgns.map(_ => null: DecInfo)
    val nTails = tailOffs.length
    val hasRowNum = funcs.contains(RowNumSpec)
    val hasRank = funcs.contains(RankSpec)
    val hasDense = funcs.contains(DenseRankSpec)
    val hasPct = funcs.contains(PercentRankSpec)
    val hasNtile = funcs.exists(_.isInstanceOf[NTileSpec])
    val hasCume = funcs.contains(CumeDistSpec)
    // size-based functions need the driver's per-group TOTALS map, so
    // pass 1 must retain every group run's stat (budgeted). Everything
    // else needs only the stats that can cross a partition boundary —
    // each partition's FIRST and LAST group run (groups are contiguous
    // under the range exchange, so only those straddle): BOUNDARY mode
    // retains exactly those two, making driver state O(partitions) and
    // the budget unreachable at ANY group cardinality (r11 — what lets
    // the session flag route grouped windows here safely).
    val hasFullAgg = aggs.exists(_.full)
    val fullStats = hasPct || hasNtile || hasCume || hasFullAgg
    val anyPeer = aggs.exists(_.peer)
    // RANGE-frame nth/first-ign/last-ign (r13): per-run constants that
    // need the current run's global END index — the cume_dist machinery
    val anyRangeNth = nths.exists(_.rangeFrame)
    val anyRangeLast = lastIgns.exists(_.rangeFrame)
    val needsRunEnd = hasCume || anyRangeNth || anyRangeLast
    // peer-run tracking is needed whenever a function's value depends on
    // run boundaries — RANGE aggregates, rank, dense_rank, percent_rank,
    // and the run-end family
    val needsPeer = anyPeer || hasRank || hasDense || hasPct || needsRunEnd
    val ansi = conf.ansiEnabled // WindowExec parity in BOTH modes (r9 4a)
    val groupExprs = groups
    val orderExprs = order.map(_.child)
    val input = child.execute()
    val nParts = input.getNumPartitions

    def addLong(a: Long, b: Long): Long =
      if (ansi) Math.addExact(a, b) else a + b

    /** Merge a non-empty accumulator pair per kind (caller guards nn); `a`
      * is always the accumulator covering EARLIER rows in window order.
      * Double extremes follow SPARK's ordering (NaN greatest — the
      * SQLOrderingUtil contract WindowExec's Min/Max apply), not
      * java.lang.Math's NaN-propagation: min must SKIP NaN unless
      * everything is NaN, max keeps NaN once seen. Ties are FIRST-WINS
      * via primitive `<`/`>` (which treat -0.0 == +0.0), matching
      * WindowExec's replace-only-on-strict-compare Min/Max updates —
      * `math.min/max` would instead pick the signed zero by sign bit and
      * diverge from the window on mixed ±0.0 input (r10 ADVICE). */
    def combine(kind: AggKind, aL: Long, aD: Double, bL: Long, bD: Double,
                isDouble: Boolean): (Long, Double) = kind match {
      case MinK => if (isDouble)
                     (0L, if (aD.isNaN) bD else if (bD.isNaN) aD
                          else if (bD < aD) bD else aD)
                   else (math.min(aL, bL), 0d)
      case MaxK => if (isDouble)
                     (0L, if (aD.isNaN) aD else if (bD.isNaN) bD
                          else if (bD > aD) bD else aD)
                   else (math.max(aL, bL), 0d)
      case _ => if (isDouble) (0L, aD + bD) else (addLong(aL, bL), 0d)
    }

    // ---- pass 1: per (partition, contiguous group run) counts + sums +
    // peer-run boundary stats
    val (statsPerPart: Array[Array[GroupStat]], maxContainedRows: Long) = {
      val collected = input.mapPartitionsWithIndex({ (idx, it) =>
        val gproj = UnsafeProjection.create(groupExprs, childOutput)
        val pproj = UnsafeProjection.create(orderExprs, childOutput)
        val aprojs = aggs.map(f =>
          UnsafeProjection.create(f.expr :: Nil, childOutput))
        val tprojs = tailExprs.map(e =>
          UnsafeProjection.create(e :: Nil, childOutput))
        val ldprojs = headExprs.map(e =>
          UnsafeProjection.create(e :: Nil, childOutput))
        // per-slot ring of the CURRENT group-run's trailing values (lag
        // replay history / rolling-frame history — the tail the driver
        // chains into the next partition's seed)
        val ringL = tailOffs.map(off => new Array[Long](off))
        val ringD = tailOffs.map(off => new Array[Double](off))
        val ringDec = tailOffs.map(off => new Array[Decimal](off))
        val ringN = tailOffs.map(off => new Array[Boolean](off))
        val ringCnt = new Array[Long](nTails)
        // per-slot LEADING values of the current group run (the heads the
        // driver chains BACKWARD for lead lookahead across partitions);
        // headP records each capture's 1-based row index within the
        // partition's group segment (r13 — run-relative positions for the
        // RANGE IGNORE NULLS shapes)
        val headL = headOffs.map(off => new Array[Long](off))
        val headD = headOffs.map(off => new Array[Double](off))
        val headN = headOffs.map(off => new Array[Boolean](off))
        val headP = headOffs.map(off => new Array[Long](off))
        val headCnt = new Array[Int](nHeads)
        def lagTails(): (Array[Array[Long]], Array[Array[Double]],
                         Array[Array[Decimal]], Array[Array[Boolean]]) = {
          val tl = new Array[Array[Long]](nTails)
          val td = new Array[Array[Double]](nTails)
          val tc = new Array[Array[Decimal]](nTails)
          val tn = new Array[Array[Boolean]](nTails)
          var i = 0
          while (i < nTails) {
            val off = tailOffs(i)
            val n = math.min(ringCnt(i), off.toLong).toInt
            val (ol, od, oc, on) =
              (new Array[Long](n), new Array[Double](n),
               new Array[Decimal](n), new Array[Boolean](n))
            var j = 0
            while (j < n) { // oldest → newest
              val idx2 = ((ringCnt(i) - n + j) % off).toInt
              ol(j) = ringL(i)(idx2); od(j) = ringD(i)(idx2)
              oc(j) = ringDec(i)(idx2)
              on(j) = ringN(i)(idx2)
              j += 1
            }
            tl(i) = ol; td(i) = od; tc(i) = oc; tn(i) = on
            i += 1
          }
          (tl, td, tc, tn)
        }
        def leadHeads(): (Array[Array[Long]], Array[Array[Double]],
                          Array[Array[Boolean]], Array[Array[Long]]) = {
          val hl = new Array[Array[Long]](nHeads)
          val hd = new Array[Array[Double]](nHeads)
          val hn = new Array[Array[Boolean]](nHeads)
          val hp = new Array[Array[Long]](nHeads)
          var i = 0
          while (i < nHeads) {
            hl(i) = java.util.Arrays.copyOf(headL(i), headCnt(i))
            hd(i) = java.util.Arrays.copyOf(headD(i), headCnt(i))
            hn(i) = java.util.Arrays.copyOf(headN(i), headCnt(i))
            hp(i) = java.util.Arrays.copyOf(headP(i), headCnt(i))
            i += 1
          }
          (hl, hd, hn, hp)
        }
        val buf = scala.collection.mutable.ArrayBuffer.empty[GroupStat]
        var cur: UnsafeRow = null
        var rows = 0L
        var runs = 0L
        val sl = new Array[Long](nAggs)
        val sd = new Array[Double](nAggs)
        val sc = new Array[Decimal](nAggs)
        val nn = new Array[Long](nAggs)
        // current / first peer-run accumulators (needsPeer only)
        var curPeer: UnsafeRow = null
        var runRows = 0L
        val rL = new Array[Long](nAggs)
        val rD = new Array[Double](nAggs)
        val rC = new Array[Decimal](nAggs)
        val rN = new Array[Long](nAggs)
        var firstPeer: UnsafeRow = null
        var fL = new Array[Long](nAggs)
        var fD = new Array[Double](nAggs)
        var fC = new Array[Decimal](nAggs)
        var fN = new Array[Long](nAggs)
        var fRows = 0L
        // per last_value-IGNORE-NULLS slot: last non-null within the
        // CURRENT peer run, frozen into the first run's copy (r13 — the
        // backward run-continuation chain's per-partition contribution)
        val rliHas = new Array[Boolean](nLastIgns)
        val rliL = new Array[Long](nLastIgns)
        val rliD = new Array[Double](nLastIgns)
        var fliHas = new Array[Boolean](nLastIgns)
        var fliL = new Array[Long](nLastIgns)
        var fliD = new Array[Double](nLastIgns)
        def freezeFirst(): Unit = if (runs == 1 && firstPeer == null) {
          firstPeer = curPeer
          fL = rL.clone(); fD = rD.clone(); fC = rC.clone(); fN = rN.clone()
          fliHas = rliHas.clone(); fliL = rliL.clone(); fliD = rliD.clone()
          fRows = runRows
        }
        var maxRunRows = 0L
        def flush(): Unit = if (cur != null) {
          freezeFirst()
          val (tl, td, tc, tn) = lagTails()
          val (hl, hd, hn, hp) = leadHeads()
          maxRunRows = math.max(maxRunRows, rows)
          // boundary mode keeps the partition's first + latest (= last
          // once the scan ends) group-run stats; contained groups need
          // no driver entry (their prefix offsets are zero by default)
          if (!fullStats && buf.length == 2) buf.remove(1)
          buf += GroupStat(cur, rows, sl.clone(), sd.clone(), sc.clone(),
            nn.clone(), runs,
            firstPeer, fL, fD, fC, fN, fRows,
            curPeer, runRows,
            tl, td, tc, tn, hl, hd, hn, hp,
            fliHas.clone(), fliL.clone(), fliD.clone())
        }
        while (it.hasNext) {
          val row = it.next()
          val k = gproj(row)
          if (cur == null || k != cur) {
            flush(); cur = k.copy(); rows = 0L; runs = 0L
            java.util.Arrays.fill(sl, 0L); java.util.Arrays.fill(sd, 0d)
            java.util.Arrays.fill(sc.asInstanceOf[Array[AnyRef]], null)
            java.util.Arrays.fill(nn, 0L)
            curPeer = null; runRows = 0L; firstPeer = null; fRows = 0L
            java.util.Arrays.fill(ringCnt, 0L)
            java.util.Arrays.fill(headCnt, 0)
            java.util.Arrays.fill(rliHas, false)
          }
          var li = 0
          while (li < nTails) {
            val v = tprojs(li)(row)
            val isNull = v.isNullAt(0)
            // skip-null slots (lag IGNORE NULLS, last_value carry) keep
            // only non-null history — the ring then holds the last `off`
            // NON-NULL values of the run
            if (!(isNull && tailSkip(li))) {
              val idx2 = (ringCnt(li) % tailOffs(li)).toInt
              if (isNull) ringN(li)(idx2) = true
              else {
                ringN(li)(idx2) = false
                if (tailDec(li) != null)
                  ringDec(li)(idx2) =
                    v.getDecimal(0, tailDec(li).prec, tailDec(li).scale)
                else if (tailIsD(li)) ringD(li)(idx2) = v.getDouble(0)
                else ringL(li)(idx2) = v.getLong(0)
              }
              ringCnt(li) += 1
            }
            li += 1
          }
          var hi = 0
          while (hi < nHeads) {
            if (headCnt(hi) < headOffs(hi)) {
              val v = ldprojs(hi)(row)
              val isNull = v.isNullAt(0)
              // skip-null slots keep capturing until `off` NON-NULLs
              if (!(isNull && headSkip(hi))) {
                val j = headCnt(hi)
                if (isNull) headN(hi)(j) = true
                else {
                  headN(hi)(j) = false
                  if (headIsD(hi)) headD(hi)(j) = v.getDouble(0)
                  else headL(hi)(j) = v.getLong(0)
                }
                headP(hi)(j) = rows + 1 // 1-based index within the segment
                headCnt(hi) += 1
              }
            }
            hi += 1
          }
          if (needsPeer) {
            val pk = pproj(row)
            if (curPeer == null || pk != curPeer) {
              freezeFirst()
              curPeer = pk.copy(); runs += 1; runRows = 0L
              java.util.Arrays.fill(rL, 0L); java.util.Arrays.fill(rD, 0d)
              java.util.Arrays.fill(rC.asInstanceOf[Array[AnyRef]], null)
              java.util.Arrays.fill(rN, 0L)
              java.util.Arrays.fill(rliHas, false)
            }
            runRows += 1
          }
          if (anyRangeLast) {
            // last non-null WITHIN the current peer run per lastIgn slot —
            // the backward run-continuation chain's raw material (r13)
            var li2 = 0
            while (li2 < nLastIgns) {
              val ti2 = nLags + nRolls + li2
              val v = tprojs(ti2)(row)
              if (!v.isNullAt(0)) {
                rliHas(li2) = true
                if (tailIsD(ti2)) rliD(li2) = v.getDouble(0)
                else rliL(li2) = v.getLong(0)
              }
              li2 += 1
            }
          }
          rows += 1
          var i = 0
          while (i < nAggs) {
            val v = aprojs(i)(row)
            if (!v.isNullAt(0)) {
              val a = aggs(i)
              if (a.dec != null) {
                val dv = v.getDecimal(0, a.dec.prec, a.dec.scale)
                sc(i) = if (nn(i) == 0L) dv else combineDec(a.kind, sc(i), dv)
                nn(i) += 1
                if (needsPeer) {
                  rC(i) = if (rN(i) == 0L) dv
                          else combineDec(a.kind, rC(i), dv)
                  rN(i) += 1
                }
              } else {
                val (vl, vd) =
                  if (a.kind == CountK) (0L, 0d)
                  else if (a.isDouble) (0L, v.getDouble(0))
                  else (v.getLong(0), 0d)
                if (nn(i) == 0L) { sl(i) = vl; sd(i) = vd }
                else {
                  val (ml, md) =
                    combine(a.kind, sl(i), sd(i), vl, vd, a.isDouble)
                  sl(i) = ml; sd(i) = md
                }
                nn(i) += 1
                if (needsPeer) {
                  if (rN(i) == 0L) { rL(i) = vl; rD(i) = vd }
                  else {
                    val (ml, md) =
                      combine(a.kind, rL(i), rD(i), vl, vd, a.isDouble)
                    rL(i) = ml; rD(i) = md
                  }
                  rN(i) += 1
                }
              }
            }
            i += 1
          }
        }
        flush()
        Iterator.single((idx, buf.toArray, maxRunRows))
      }, preservesPartitioning = true).collect()
      val arr = Array.fill(nParts)(Array.empty[GroupStat])
      var mx = 0L
      collected.foreach { case (i, a, m) => arr(i) = a; mx = math.max(mx, m) }
      (arr, mx)
    }
    // conf-overridable so specs can pin the fail-fast at a tiny edge
    // (r10 VERDICT 3b); production keeps the documented default. The
    // budget exists for FULL mode only — boundary mode retains at most
    // two stats per partition by construction.
    if (fullStats) {
      val maxGroups = conf.getConfString(MaxCollectedGroupsKey,
        MaxCollectedGroups.toString).toLong
      val collectedGroups = statsPerPart.iterator.map(_.length.toLong).sum
      if (collectedGroups > maxGroups) throw new IllegalStateException(
        s"distributed window collected $collectedGroups (partition, group) " +
        s"stats > $maxGroups: the partition key is too " +
        "high-cardinality for the range-partitioned rewrite — run without " +
        "the __dist_rank marker/flag so the hash-exchanged WindowExec plans it")
    }

    // ---- driver, forward: per-group prefix offsets in partition order,
    // chaining split peer runs (leading-run continuation per partition)
    val chainStartNanos = System.nanoTime() // priced: see Diagnostics
    val running = scala.collection.mutable.HashMap.empty[UnsafeRow, Offsets]
    val leadRowsPerPart = new Array[Long](nParts)
    val leadContinuesPerPart = new Array[Boolean](nParts)
    // the open run flowing into the NEXT partition: (group, peer, rows)
    var carryG: UnsafeRow = null
    var carryP: UnsafeRow = null
    var carryRows = 0L
    val offsetsPerPart: Array[Map[UnsafeRow, Offsets]] =
      statsPerPart.zipWithIndex.map { case (stats, pIdx) =>
        val m = Map.newBuilder[UnsafeRow, Offsets]
        stats.zipWithIndex.foreach { case (st, sIdx) =>
          // does this partition's FIRST run continue the open carry?
          val continues = needsPeer && sIdx == 0 && carryG != null &&
            carryG == st.key && st.firstPeer != null && carryP == st.firstPeer
          if (continues) {
            leadContinuesPerPart(pIdx) = true
            leadRowsPerPart(pIdx) = carryRows
          }
          val o = running.getOrElse(st.key, Offsets.zero(nAggs))
          m += st.key -> o
          val sl = new Array[Long](nAggs)
          val sd = new Array[Double](nAggs)
          val sc = new Array[Decimal](nAggs)
          val nn = new Array[Long](nAggs)
          var i = 0
          while (i < nAggs) {
            if (aggs(i).dec != null) {
              sc(i) =
                if (o.nonNull(i) == 0L) st.sumDec(i)
                else if (st.nonNull(i) == 0L) o.sumDec(i)
                else combineDec(aggs(i).kind, o.sumDec(i), st.sumDec(i))
            } else if (o.nonNull(i) == 0L) {
              sl(i) = st.sumL(i); sd(i) = st.sumD(i)
            } else if (st.nonNull(i) == 0L) {
              sl(i) = o.sumL(i); sd(i) = o.sumD(i)
            } else {
              val (ml, md) = combine(aggs(i).kind, o.sumL(i), o.sumD(i),
                st.sumL(i), st.sumD(i), aggs(i).isDouble)
              sl(i) = ml; sd(i) = md
            }
            nn(i) = o.nonNull(i) + st.nonNull(i)
            i += 1
          }
          // a continuing leading run was already counted in the previous
          // partition's trailing run — don't count it twice
          val runsDelta = st.runs - (if (continues) 1L else 0L)
          running(st.key) = Offsets(o.rows + st.rows, sl, sd, sc, nn,
            o.runsBefore + runsDelta)
        }
        if (needsPeer && stats.nonEmpty) {
          val last = stats.last
          val wholePartitionOneRun = stats.length == 1 && last.runs == 1
          if (wholePartitionOneRun && leadContinuesPerPart(pIdx))
            carryRows += last.rows // the same open run keeps flowing
          else {
            carryG = last.key; carryP = last.lastPeer; carryRows = last.lastRows
          }
        }
        m.result()
      }
    if (hasRowNum || hasRank || hasDense) {
      // straddling groups carry their true totals in `running`; a group
      // CONTAINED in one partition is bounded by that partition's largest
      // single run, which pass 1 tracked (boundary mode retains no stat
      // for contained middle groups, so check the tracked maximum)
      running.values.foreach(o => RankOverflow.check(o.rows))
      RankOverflow.check(maxContainedRows)
    }

    // group TOTALS — the SizeBasedWindowFunction input (ntile,
    // percent_rank): the forward prefix-merge's endpoint per group, one
    // broadcast map of O(groups) longs
    val groupTotals: Map[UnsafeRow, Long] =
      if (hasPct || hasNtile || hasCume)
        running.iterator.map { case (k, o) => k -> o.rows }.toMap
      else Map.empty
    // whole-group-frame aggregates read the SAME endpoint's accumulator
    // arrays — per-group totals for every agg slot, O(groups × nAggs)
    // under the fullStats budget (r12)
    val groupAggTotals: Map[UnsafeRow, Offsets] =
      if (hasFullAgg) running.toMap else Map.empty

    // ---- driver, forward: trailing-history chaining (lag replay rings +
    // rolling-frame history). A group's rows occupy a CONTIGUOUS span of
    // partitions, so only a partition's FIRST group can have
    // prior-partition history: its seed is the last `off` values of the
    // same group accumulated across preceding partitions (concatenate
    // trailing tails while the same group keeps flowing). Unlike the
    // peer-run carry this chains on GROUP equality alone — lag and ROWS
    // frames ignore order-peers.
    val lagSeedL = new Array[Array[Array[Long]]](nParts)
    val lagSeedD = new Array[Array[Array[Double]]](nParts)
    val lagSeedDec = new Array[Array[Array[Decimal]]](nParts)
    val lagSeedN = new Array[Array[Array[Boolean]]](nParts)
    if (nTails > 0) {
      var carryG: UnsafeRow = null
      var cL: Array[Array[Long]] = null
      var cD: Array[Array[Double]] = null
      var cC: Array[Array[Decimal]] = null
      var cN: Array[Array[Boolean]] = null
      var p = 0
      while (p < nParts) {
        val stats = statsPerPart(p)
        if (stats.nonEmpty) {
          if (carryG != null && stats.head.key == carryG) {
            lagSeedL(p) = cL; lagSeedD(p) = cD; lagSeedDec(p) = cC
            lagSeedN(p) = cN
          }
          val last = stats.last
          if (stats.length == 1 && carryG != null && last.key == carryG) {
            // the same group keeps flowing: append this partition's tail
            // and keep only the last `off` values per slot
            val (nl, nd, nc, nn2) = (new Array[Array[Long]](nTails),
              new Array[Array[Double]](nTails),
              new Array[Array[Decimal]](nTails),
              new Array[Array[Boolean]](nTails))
            var i = 0
            while (i < nTails) {
              val off = tailOffs(i)
              nl(i) = (cL(i) ++ last.lagL(i)).takeRight(off)
              nd(i) = (cD(i) ++ last.lagD(i)).takeRight(off)
              nc(i) = (cC(i) ++ last.lagDec(i)).takeRight(off)
              nn2(i) = (cN(i) ++ last.lagN(i)).takeRight(off)
              i += 1
            }
            cL = nl; cD = nd; cC = nc; cN = nn2
          } else {
            carryG = last.key
            cL = last.lagL; cD = last.lagD; cC = last.lagDec; cN = last.lagN
          }
        }
        p += 1
      }
    }

    // ---- driver, backward: lead-lookahead chaining — the forward tail
    // chain MIRRORED. A partition's trailing rows need the first
    // `off` values of the SAME group from LATER partitions: while the
    // group keeps flowing backward, prepend each wholly-one-group
    // partition's own heads before the accumulated carry. r13: the chain
    // covers ALL head slots (leads first, then first/nth_value slots —
    // the RANGE per-run shapes read the group's CONTINUATION values when
    // a straddling run's frame end lies in a later partition) and also
    // carries each value's position as a 1-based group-row offset counted
    // from the consuming partition's end (a deeper partition's positions
    // shift by the rows between).
    val leadSeedL = new Array[Array[Array[Long]]](nParts)
    val leadSeedD = new Array[Array[Array[Double]]](nParts)
    val leadSeedN = new Array[Array[Array[Boolean]]](nParts)
    val leadSeedP = new Array[Array[Array[Long]]](nParts)
    if (nLeads > 0 || anyRangeNth) {
      var carryG: UnsafeRow = null
      var cL: Array[Array[Long]] = null
      var cD: Array[Array[Double]] = null
      var cN: Array[Array[Boolean]] = null
      var cP: Array[Array[Long]] = null
      var p = nParts - 1
      while (p >= 0) {
        val stats = statsPerPart(p)
        if (stats.nonEmpty) {
          val last = stats.last
          if (carryG != null && last.key == carryG) {
            leadSeedL(p) = cL; leadSeedD(p) = cD; leadSeedN(p) = cN
            leadSeedP(p) = cP
          }
          val head = stats.head
          if (stats.length == 1 && carryG != null && head.key == carryG) {
            // one whole-partition group continuing into later partitions:
            // this partition's heads come FIRST, then the carry (its
            // positions shifted by this partition's group rows)
            val (nl, nd, nn2, np2) = (new Array[Array[Long]](nHeads),
              new Array[Array[Double]](nHeads),
              new Array[Array[Boolean]](nHeads),
              new Array[Array[Long]](nHeads))
            var i = 0
            while (i < nHeads) {
              val off = headOffs(i)
              nl(i) = (head.leadL(i) ++ cL(i)).take(off)
              nd(i) = (head.leadD(i) ++ cD(i)).take(off)
              nn2(i) = (head.leadN(i) ++ cN(i)).take(off)
              np2(i) = (head.leadP(i) ++ cP(i).map(_ + head.rows)).take(off)
              i += 1
            }
            cL = nl; cD = nd; cN = nn2; cP = np2
          } else {
            cL = head.leadL; cD = head.leadD; cN = head.leadN
            cP = head.leadP
          }
          carryG = head.key
        }
        p -= 1
      }
    }

    // ---- driver, backward: run-continuation last-non-null per
    // last_value-IGNORE-NULLS slot (r13) — the RANGE-aggregate tail chain
    // mirrored for the forward-fill carry: a partition whose trailing
    // peer run continues into later partitions must answer with the LAST
    // non-null of the whole run, so chain the open run's per-partition
    // first-run captures backward, later partitions' values winning.
    val rtliHas = new Array[Array[Boolean]](nParts)
    val rtliL = new Array[Array[Long]](nParts)
    val rtliD = new Array[Array[Double]](nParts)
    if (anyRangeLast) {
      var openG: UnsafeRow = null
      var openP: UnsafeRow = null
      var oHas = new Array[Boolean](nLastIgns)
      var oL = new Array[Long](nLastIgns)
      var oD = new Array[Double](nLastIgns)
      var p = nParts - 1
      while (p >= 0) {
        val stats = statsPerPart(p)
        if (stats.nonEmpty) {
          val last = stats.last
          if (openG != null && openG == last.key && openP == last.lastPeer) {
            rtliHas(p) = oHas.clone(); rtliL(p) = oL.clone()
            rtliD(p) = oD.clone()
          }
          val head = stats.head
          val wholePartitionOneRun = stats.length == 1 && head.runs == 1
          val keepTail = wholePartitionOneRun && openG != null &&
            openG == head.key && openP == head.firstPeer
          val nHas = new Array[Boolean](nLastIgns)
          val nL = new Array[Long](nLastIgns)
          val nD = new Array[Double](nLastIgns)
          var i = 0
          while (i < nLastIgns) {
            // the open run's rows in later partitions are LATER in window
            // order, so a deeper carry value wins over this partition's
            if (keepTail && oHas(i)) { nHas(i) = true; nL(i) = oL(i); nD(i) = oD(i) }
            else {
              nHas(i) = head.firstRunLIHas(i)
              nL(i) = head.firstRunLIL(i); nD(i) = head.firstRunLID(i)
            }
            i += 1
          }
          openG = head.key; openP = head.firstPeer
          oHas = nHas; oL = nL; oD = nD
        }
        p -= 1
      }
    }

    // ---- driver, forward: first/nth_value group-HEAD chaining — the
    // lag tail chain with take-FIRST instead of take-last: a partition
    // whose first group continues from earlier partitions reads the
    // group's GLOBAL first k values (slots [nLeads, nHeads) of the
    // shared head collection)
    val nthSeedL = new Array[Array[Array[Long]]](nParts)
    val nthSeedD = new Array[Array[Array[Double]]](nParts)
    val nthSeedN = new Array[Array[Array[Boolean]]](nParts)
    if (nNths > 0) {
      var carryG: UnsafeRow = null
      var cL: Array[Array[Long]] = null
      var cD: Array[Array[Double]] = null
      var cN: Array[Array[Boolean]] = null
      var p = 0
      while (p < nParts) {
        val stats = statsPerPart(p)
        if (stats.nonEmpty) {
          if (carryG != null && stats.head.key == carryG) {
            nthSeedL(p) = cL; nthSeedD(p) = cD; nthSeedN(p) = cN
          }
          val last = stats.last
          if (stats.length == 1 && carryG != null && last.key == carryG) {
            // the group keeps flowing: extend the carried heads with this
            // partition's, keeping the FIRST k per slot
            val (nl, nd, nn2) = (new Array[Array[Long]](nNths),
              new Array[Array[Double]](nNths),
              new Array[Array[Boolean]](nNths))
            var i = 0
            while (i < nNths) {
              val k = nths(i).k
              nl(i) = (cL(i) ++ last.leadL(nLeads + i)).take(k)
              nd(i) = (cD(i) ++ last.leadD(nLeads + i)).take(k)
              nn2(i) = (cN(i) ++ last.leadN(nLeads + i)).take(k)
              i += 1
            }
            cL = nl; cD = nd; cN = nn2
          } else {
            carryG = last.key
            cL = Array.tabulate(nNths)(i => last.leadL(nLeads + i))
            cD = Array.tabulate(nNths)(i => last.leadD(nLeads + i))
            cN = Array.tabulate(nNths)(i => last.leadN(nLeads + i))
          }
        }
        p += 1
      }
    }

    // ---- driver, backward: trailing-run ROW counts from later
    // partitions — cume_dist AND the RANGE nth/first-ign/last-ign family
    // (r13) emit per-run values off each run's global END index, so the
    // partition's last run must know how many of its peers live ahead
    // (the forward leading-run chain, mirrored)
    val tailRunRows = new Array[Long](nParts)
    if (needsRunEnd) {
      var bG: UnsafeRow = null
      var bP: UnsafeRow = null
      var bRows = 0L
      var p = nParts - 1
      while (p >= 0) {
        val stats = statsPerPart(p)
        if (stats.nonEmpty) {
          val last = stats.last
          if (bG != null && bG == last.key && bP == last.lastPeer)
            tailRunRows(p) = bRows
          val head = stats.head
          val wholePartitionOneRun = stats.length == 1 && head.runs == 1
          val keep = wholePartitionOneRun && bG != null &&
            bG == head.key && bP == head.firstPeer
          bRows = head.firstRows + (if (keep) bRows else 0L)
          bG = head.key; bP = head.firstPeer
        }
        p -= 1
      }
    }

    // ---- driver, backward: tail contributions to each partition's
    // trailing peer run from later partitions (RANGE aggregates only)
    val tailL = Array.fill(nParts)(new Array[Long](nAggs))
    val tailD = Array.fill(nParts)(new Array[Double](nAggs))
    val tailDecV = Array.fill(nParts)(new Array[Decimal](nAggs))
    val tailN = Array.fill(nParts)(new Array[Long](nAggs))
    if (anyPeer) {
      var openG: UnsafeRow = null
      var openP: UnsafeRow = null
      var oL = new Array[Long](nAggs)
      var oD = new Array[Double](nAggs)
      var oC = new Array[Decimal](nAggs)
      var oN = new Array[Long](nAggs)
      var p = nParts - 1
      while (p >= 0) {
        val stats = statsPerPart(p)
        if (stats.nonEmpty) {
          val last = stats.last
          if (openG != null && openG == last.key && openP == last.lastPeer) {
            tailL(p) = oL.clone(); tailD(p) = oD.clone()
            tailDecV(p) = oC.clone(); tailN(p) = oN.clone()
          }
          val head = stats.head
          val wholePartitionOneRun = stats.length == 1 && head.runs == 1
          // the run open toward partition p-1 = p's leading run, plus the
          // already-open tail when p is entirely that same run
          val keepTail = wholePartitionOneRun && openG != null &&
            openG == head.key && openP == head.firstPeer
          val nL = head.firstSumL.clone()
          val nD = head.firstSumD.clone()
          val nC = head.firstSumDec.clone()
          val nN = head.firstNN.clone()
          if (keepTail) {
            var i = 0
            while (i < nAggs) {
              if (aggs(i).dec != null) {
                if (nN(i) == 0L) nC(i) = oC(i)
                else if (oN(i) != 0L)
                  nC(i) = combineDec(aggs(i).kind, nC(i), oC(i))
              } else if (nN(i) == 0L) { nL(i) = oL(i); nD(i) = oD(i) }
              else if (oN(i) != 0L) {
                val (ml, md) = combine(aggs(i).kind, nL(i), nD(i),
                  oL(i), oD(i), aggs(i).isDouble)
                nL(i) = ml; nD(i) = md
              }
              nN(i) += oN(i)
              i += 1
            }
          }
          openG = head.key; openP = head.firstPeer
          oL = nL; oD = nD; oC = nC; oN = nN
        }
        p -= 1
      }
    }

    // all driver-side chain work ends here; record its cost so the
    // O(partitions) claim is measurable (r11 VERDICT item 9)
    val chainMs = (System.nanoTime() - chainStartNanos) / 1e6
    DistributedRankDiagnostics.recordChain(id, chainMs)
    logInfo(f"distributed window driver chains over $nParts partitions " +
      f"assembled in $chainMs%.2f ms")

    // ---- pass 2: stream, seeding group state from the offsets
    val outAttrs = output
    val nFuncs = funcs.length
    input.mapPartitionsWithIndex { (idx, it) =>
      val offs = offsetsPerPart(idx)
      val pLeadRows = leadRowsPerPart(idx)
      val pLeadContinues = leadContinuesPerPart(idx)
      val pTailL = tailL(idx)
      val pTailD = tailD(idx)
      val pTailDec = tailDecV(idx)
      val pTailN = tailN(idx)
      val pTailRunRows = tailRunRows(idx)
      val pSeedL = lagSeedL(idx)
      val pSeedD = lagSeedD(idx)
      val pSeedDec = lagSeedDec(idx)
      val pSeedN = lagSeedN(idx)
      val pLeadSeedL = leadSeedL(idx)
      val pLeadSeedD = leadSeedD(idx)
      val pLeadSeedN = leadSeedN(idx)
      val pLeadSeedP = leadSeedP(idx)
      val pRtliHas = rtliHas(idx)
      val pRtliL = rtliL(idx)
      val pRtliD = rtliD(idx)
      val pNthSeedL = nthSeedL(idx)
      val pNthSeedD = nthSeedD(idx)
      val pNthSeedN = nthSeedN(idx)
      val gproj = UnsafeProjection.create(groupExprs, childOutput)
      val pproj = UnsafeProjection.create(orderExprs, childOutput)
      val aprojs = aggs.map(f =>
        UnsafeProjection.create(f.expr :: Nil, childOutput))
      val tprojs = tailExprs.map(e =>
        UnsafeProjection.create(e :: Nil, childOutput))
      val ldprojs = leads.map(f =>
        UnsafeProjection.create(f.expr :: Nil, childOutput))
      val nthProjs = nths.map(f =>
        UnsafeProjection.create(f.expr :: Nil, childOutput))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val fRow = new GenericInternalRow(nFuncs)
      var curGroup: UnsafeRow = null
      var rn = 0L
      var runStart = 0L
      var dense = 0L
      var gTotal = 0L
      var prevPeer: UnsafeRow = null
      var firstUnit = true
      var firstGroupPending = true
      var accL = new Array[Long](nAggs)
      var accD = new Array[Double](nAggs)
      var accDec = new Array[Decimal](nAggs)
      var accNN = new Array[Long](nAggs)
      // whole-group totals of the CURRENT group (full-frame agg slots)
      var ftL = new Array[Long](nAggs)
      var ftD = new Array[Double](nAggs)
      var ftDec = new Array[Decimal](nAggs)
      var ftN = new Array[Long](nAggs)
      // per-slot buffers of the group's FIRST k values (first/nth_value),
      // seeded from the forward driver chain at the partition's first group
      val nthBufL = nths.map(n => new Array[Long](n.k))
      val nthBufD = nths.map(n => new Array[Double](n.k))
      val nthBufN = nths.map(n => new Array[Boolean](n.k))
      val nthCnt = new Array[Int](nNths)
      // per-UNIT answers of the RANGE-frame per-run-constant slots (r13):
      // computed once per peer run in the pre-capture pass, emitted for
      // every row of the unit
      val unitNthNull = new Array[Boolean](nNths)
      val unitNthL = new Array[Long](nNths)
      val unitNthD = new Array[Double](nNths)
      val unitLastNull = new Array[Boolean](nLastIgns)
      val unitLastL = new Array[Long](nLastIgns)
      val unitLastD = new Array[Double](nLastIgns)
      // per-slot trailing-history rings in the group: lag replay values
      // and rolling-frame history (slots [0,nLags) are lags, the rest
      // rolling frames)
      val tailRingL = tailOffs.map(off => new Array[Long](off))
      val tailRingD = tailOffs.map(off => new Array[Double](off))
      val tailRingDec = tailOffs.map(off => new Array[Decimal](off))
      val tailRingN = tailOffs.map(off => new Array[Boolean](off))
      val tailCnt = new Array[Long](nTails)
      // O(1) rolling frames for INVERTIBLE kinds (r14 optimization round):
      // the replay loop re-adds the whole k-deep ring per row — O(k)
      // exact-decimal adds per row per slot, the measured top cost of the
      // moment-window queries (6 bases × k=20 × every row). A running
      // ring aggregate (add on push, subtract on evict) is BIT-IDENTICAL
      // where the arithmetic is exact and association-free:
      //  - decimal sum/avg: every add/subtract is exact BigDecimal at one
      //    scale, and overflow is checked ONLY at emission (emitDec) on
      //    the exact frame value — which retract reproduces exactly;
      //  - long sum in LEGACY mode: wrap-around add is associative and
      //    invertible mod 2⁶⁴ (ANSI long keeps replay: Math.addExact can
      //    throw on an intermediate prefix whose order retract changes);
      //  - count: an integer, trivially invertible.
      // min/max (no inverse) and double sums (FP addition not
      // associative; WindowExec replays, bitwise parity requires the
      // same order) keep the O(k) replay.
      val rollRetract: Array[Boolean] = Array.tabulate(nTails) { i =>
        i >= nLags && i < nLags + nRolls && (rolls(i - nLags).kind match {
          case CountK => true
          case SumK | AvgK if rolls(i - nLags).dec != null => true
          case SumK if !rolls(i - nLags).isDouble && !ansi => true
          case _ => false
        })
      }
      val ringAggDec = new Array[Decimal](nTails) // null ⇔ ringAggNN == 0
      val ringAggL = new Array[Long](nTails)
      val ringAggNN = new Array[Long](nTails)
      def tailPut(i: Int, isNull: Boolean, l: Long, d: Double,
                  dec: Decimal = null): Unit = {
        val idx2 = (tailCnt(i) % tailOffs(i)).toInt
        if (rollRetract(i)) {
          // retract the evicted slot BEFORE overwriting it
          if (tailCnt(i) >= tailOffs(i) && !tailRingN(i)(idx2)) {
            ringAggNN(i) -= 1
            if (tailDec(i) != null)
              ringAggDec(i) =
                if (ringAggNN(i) == 0L) null
                else ringAggDec(i) - tailRingDec(i)(idx2)
            else ringAggL(i) -= tailRingL(i)(idx2)
          }
          if (!isNull) {
            if (tailDec(i) != null)
              ringAggDec(i) =
                if (ringAggNN(i) == 0L) dec else ringAggDec(i) + dec
            else ringAggL(i) += l
            ringAggNN(i) += 1
          }
        }
        tailRingN(i)(idx2) = isNull
        tailRingL(i)(idx2) = l
        tailRingD(i)(idx2) = d
        tailRingDec(i)(idx2) = dec
        tailCnt(i) += 1
      }
      // ---- lead lookahead state: rows are HELD until resolvable — for
      // RESPECT NULLS slots until the row `off` ahead arrives (bounded by
      // the max offset); for IGNORE NULLS slots until the off-th FUTURE
      // NON-NULL arrives (bounded by the longest null run + off, guarded
      // by maxPending). The one supported shape that pays a per-row copy;
      // everything else still streams.
      val pend = scala.collection.mutable.ArrayDeque.empty[LeadPend]
      var pendBase = 0L // group-local index of pend.head
      var grpIdx = 0L   // group-local index of the NEXT row to process
      // IGNORE NULLS lead bookkeeping: per slot, the running count of
      // non-null values seen in the group, and a FIFO of
      // (entry group-index, target non-null ordinal) awaiting resolution
      // — targets are non-decreasing along the queue, so each arriving
      // non-null resolves a prefix in O(resolved)
      val leadNN = new Array[Long](nLeads)
      val ignQ: Array[scala.collection.mutable.ArrayDeque[(Long, Long)]] =
        Array.fill(nLeads)(scala.collection.mutable.ArrayDeque.empty[(Long, Long)])
      def fillLeadDefault(g2: GenericInternalRow, i: Int): Unit = {
        val ld = leads(i)
        if (ld.defaultIsNull) g2.update(leadFuncIdx(i), null)
        else setNum(g2, leadFuncIdx(i), ld.outType, ld.dL, ld.dD)
      }
      /** Flush all pending rows at an INTERNAL group boundary: groups are
        * contiguous under the range exchange, so a group that ends inside
        * the partition ended globally — unfilled lookahead slots (no row
        * `off` ahead / no off-th non-null within the group) take the
        * default. */
      def groupFlush(): Array[LeadPend] = {
        val out = pend.toArray
        pend.clear()
        var i = 0
        while (i < nLeads) {
          if (leads(i).ignoreNulls) {
            val q = ignQ(i)
            while (q.nonEmpty) {
              val (eid, _) = q.removeHead()
              fillLeadDefault(out((eid - pendBase).toInt).g, i)
            }
          }
          i += 1
        }
        var o = 0
        while (o < out.length) {
          val idx2 = pendBase + o
          var i2 = 0
          while (i2 < nLeads) {
            if (!leads(i2).ignoreNulls && idx2 + leads(i2).off >= grpIdx)
              fillLeadDefault(out(o).g, i2)
            i2 += 1
          }
          o += 1
        }
        out
      }
      /** Flush at PARTITION end: the trailing group may continue in later
        * partitions — unfilled slots read the driver-chained HEADS of the
        * same group there (first `off` values for RESPECT NULLS slots,
        * first `off` NON-NULLs for IGNORE NULLS slots); past their end,
        * the default. */
      def finalFlush(): Iterator[InternalRow] =
        if (nLeads == 0 || pend.isEmpty) Iterator.empty
        else {
          var i = 0
          while (i < nLeads) {
            if (leads(i).ignoreNulls) {
              val q = ignQ(i)
              while (q.nonEmpty) {
                val (eid, tgt) = q.removeHead()
                val pe = pend((eid - pendBase).toInt)
                // how many MORE non-nulls this entry still needs — the
                // 1-based index into the chained non-null heads
                val rem = tgt - leadNN(i)
                if (pLeadSeedL != null && rem - 1 < pLeadSeedL(i).length)
                  setNum(pe.g, leadFuncIdx(i), leads(i).outType,
                    pLeadSeedL(i)((rem - 1).toInt),
                    pLeadSeedD(i)((rem - 1).toInt))
                else fillLeadDefault(pe.g, i)
              }
            }
            i += 1
          }
          val out = pend.toArray
          pend.clear()
          out.iterator.zipWithIndex.map { case (pe, o) =>
            val idx2 = pendBase + o
            var i2 = 0
            while (i2 < nLeads) {
              if (!leads(i2).ignoreNulls && idx2 + leads(i2).off >= grpIdx) {
                val sp = (idx2 + leads(i2).off - grpIdx).toInt
                if (pLeadSeedL != null && sp < pLeadSeedL(i2).length) {
                  if (pLeadSeedN(i2)(sp)) pe.g.update(leadFuncIdx(i2), null)
                  else setNum(pe.g, leadFuncIdx(i2), leads(i2).outType,
                    pLeadSeedL(i2)(sp), pLeadSeedD(i2)(sp))
                } else fillLeadDefault(pe.g, i2)
              }
              i2 += 1
            }
            outProj(joined(pe.row, pe.g))
          }
        }
      def addTo(i: Int, row: InternalRow): Unit = {
        val v = aprojs(i)(row)
        if (!v.isNullAt(0)) {
          val a = aggs(i)
          if (a.dec != null) {
            val dv = v.getDecimal(0, a.dec.prec, a.dec.scale)
            accDec(i) =
              if (accNN(i) == 0L) dv else combineDec(a.kind, accDec(i), dv)
          } else {
            val (vl, vd) =
              if (a.kind == CountK) (0L, 0d)
              else if (a.isDouble) (0L, v.getDouble(0))
              else (v.getLong(0), 0d)
            if (accNN(i) == 0L) { accL(i) = vl; accD(i) = vd }
            else {
              val (ml, md) =
                combine(a.kind, accL(i), accD(i), vl, vd, a.isDouble)
              accL(i) = ml; accD(i) = md
            }
          }
          accNN(i) += 1
        }
      }
      // emission units: one PEER RUN (copies) when a RANGE aggregate needs
      // run-total lookahead, else single rows streamed without copy; the
      // boolean flags the partition's LAST unit (tail-merge application —
      // only meaningful under anyPeer, so the single-row path never peeks
      // ahead: a BufferedIterator's lookahead would overwrite the REUSED
      // UnsafeRow before it is projected)
      // the run-end family (cume_dist, RANGE nth/first-ign/last-ign) also
      // needs whole-run units: every peer's value depends on the run's
      // END, known only once the local run is buffered
      val unitBuffered = anyPeer || needsRunEnd
      val units: Iterator[(Array[InternalRow], Boolean)] =
        if (!unitBuffered) it.map(r => (Array(r), false))
        else new Iterator[(Array[InternalRow], Boolean)] {
          private val b = it.buffered
          override def hasNext: Boolean = b.hasNext
          override def next(): (Array[InternalRow], Boolean) = {
            val first = b.next().copy()
            val gk = gproj(first).copy()
            val pk = pproj(first).copy()
            val buf = scala.collection.mutable.ArrayBuffer(first)
            var same = true
            while (same && b.hasNext) {
              if (gproj(b.head) == gk && pproj(b.head) == pk)
                buf += b.next().copy()
              else same = false
            }
            (buf.toArray, !b.hasNext)
          }
        }
      val mainOut = units.flatMap { case (unit, isLastUnit) =>
        val k = gproj(unit(0))
        var flushedPrev: Array[LeadPend] = null
        if (curGroup == null || k != curGroup) {
          // the previous group ended inside this partition: resolve its
          // held lead rows (defaults) BEFORE any new-group state resets
          if (nLeads > 0 && curGroup != null) flushedPrev = groupFlush()
          curGroup = k.copy()
          val base = offs.getOrElse(curGroup, Offsets.zero(nAggs))
          rn = base.rows
          dense = base.runsBefore
          runStart = rn
          gTotal = groupTotals.getOrElse(curGroup, 0L)
          prevPeer = null
          accL = base.sumL.clone(); accD = base.sumD.clone()
          accDec = base.sumDec.clone()
          accNN = base.nonNull.clone()
          if (hasFullAgg) {
            // fullStats mode: every group has a stats entry, so the
            // endpoint map is total-complete for straddlers AND
            // contained groups
            val t = groupAggTotals.getOrElse(curGroup, Offsets.zero(nAggs))
            ftL = t.sumL; ftD = t.sumD; ftDec = t.sumDec; ftN = t.nonNull
          }
          pendBase = 0L; grpIdx = 0L
          // IGNORE NULLS lead ordinals and queues restart per group
          // (groupFlush above already drained the queues' entries)
          if (nIgnLeads > 0) {
            java.util.Arrays.fill(leadNN, 0L)
            ignQ.foreach(_.clear())
          }
          // trailing-history replay restarts per group; the partition's
          // FIRST group preloads the driver-chained history of the same
          // group from preceding partitions (null when the group starts
          // here)
          java.util.Arrays.fill(tailCnt, 0L)
          // running ring aggregates restart with the rings (seeding below
          // goes through tailPut, which re-accumulates them)
          java.util.Arrays.fill(ringAggDec.asInstanceOf[Array[AnyRef]], null)
          java.util.Arrays.fill(ringAggL, 0L)
          java.util.Arrays.fill(ringAggNN, 0L)
          if (firstGroupPending && pSeedL != null) {
            var i = 0
            while (i < nTails) {
              var j = 0
              while (j < pSeedL(i).length) {
                tailPut(i, pSeedN(i)(j), pSeedL(i)(j), pSeedD(i)(j),
                  pSeedDec(i)(j))
                j += 1
              }
              i += 1
            }
          }
          java.util.Arrays.fill(nthCnt, 0)
          if (firstGroupPending && pNthSeedL != null) {
            // the group's GLOBAL first values from earlier partitions
            var i = 0
            while (i < nNths) {
              var j = 0
              while (j < pNthSeedL(i).length && j < nths(i).k) {
                nthBufN(i)(j) = pNthSeedN(i)(j)
                nthBufL(i)(j) = pNthSeedL(i)(j)
                nthBufD(i)(j) = pNthSeedD(i)(j)
                j += 1
              }
              nthCnt(i) = j
              i += 1
            }
          }
          firstGroupPending = false
        }
        if (needsPeer) {
          val pk = pproj(unit(0))
          if (prevPeer == null || pk != prevPeer) {
            if (prevPeer == null && firstUnit && pLeadContinues) {
              // the run started in an earlier partition: rank points at
              // the run's true global start; its dense index is already
              // inside runsBefore
              runStart = rn - pLeadRows
            } else {
              runStart = rn
              dense += 1
            }
            prevPeer = pk.copy()
          }
        }
        firstUnit = false
        // RANGE aggregates see their whole peer run before any peer emits
        var i = 0
        while (i < nAggs) {
          if (aggs(i).peer) unit.foreach(addTo(i, _))
          i += 1
        }
        // the partition's trailing run may continue into later partitions
        // (prefix-satisfied finer partitioning): merge the driver-chained
        // tail so every peer reports the TRUE end-of-run value
        val applyTail = isLastUnit && anyPeer
        // the current run's global END index (this unit's peers all share
        // it): rows before the unit + the local run + — for the
        // partition's trailing run — its driver-chained continuation
        val runEnd =
          if (!needsRunEnd) 0L
          else rn + unit.length + (if (isLastUnit) pTailRunRows else 0L)
        // ---- per-unit pre-pass for the RANGE per-run-constant slots
        // (r13): capture the WHOLE local run into the head buffers /
        // carry rings first (the RANGE frame reaches the run's end, so a
        // row may need a value captured later in its own run), then
        // compute each slot's run-constant answer once.
        if (anyRangeNth || anyRangeLast) {
          var ui = 0
          while (ui < unit.length) {
            val row = unit(ui)
            var ni2 = 0
            while (ni2 < nNths) {
              if (nths(ni2).rangeFrame && nthCnt(ni2) < nths(ni2).k) {
                val v = nthProjs(ni2)(row)
                val isNull = v.isNullAt(0)
                if (!(isNull && nths(ni2).ignoreNulls)) {
                  val j = nthCnt(ni2)
                  if (isNull) nthBufN(ni2)(j) = true
                  else {
                    nthBufN(ni2)(j) = false
                    if (nths(ni2).isDouble) nthBufD(ni2)(j) = v.getDouble(0)
                    else nthBufL(ni2)(j) = v.getLong(0)
                  }
                  nthCnt(ni2) += 1
                }
              }
              ni2 += 1
            }
            var li2 = 0
            while (li2 < nLastIgns) {
              if (lastIgns(li2).rangeFrame) {
                val ti2 = nLags + nRolls + li2
                val v = tprojs(ti2)(row)
                if (!v.isNullAt(0)) tailPut(ti2, isNull = false,
                  if (lastIgns(li2).isDouble) 0L else v.getLong(0),
                  if (lastIgns(li2).isDouble) v.getDouble(0) else 0d)
              }
              li2 += 1
            }
            ui += 1
          }
          // group rows THROUGH this unit's end (global, incl. offsets)
          val throughUnit = rn + unit.length
          var ni2 = 0
          while (ni2 < nNths) {
            val nv = nths(ni2)
            if (nv.rangeFrame) {
              if (nv.ignoreNulls) {
                // k captured non-nulls (all at positions ≤ the unit end ≤
                // the run end) → the k-th non-null is in-frame. Short of
                // k, a straddling trailing run may still reach its k-th
                // non-null in the continuation: the (k − captured)-th
                // chained non-null, in-frame iff its group-row offset
                // from this partition's end stays within the
                // continuation's row count.
                if (nthCnt(ni2) >= nv.k) {
                  unitNthNull(ni2) = nthBufN(ni2)(nv.k - 1)
                  unitNthL(ni2) = nthBufL(ni2)(nv.k - 1)
                  unitNthD(ni2) = nthBufD(ni2)(nv.k - 1)
                } else if (isLastUnit && pTailRunRows > 0L &&
                           pLeadSeedL != null) {
                  val hi2 = nLeads + ni2
                  val need = nv.k - nthCnt(ni2) // 1-based into the chain
                  if (need <= pLeadSeedL(hi2).length &&
                      pLeadSeedP(hi2)(need - 1) <= pTailRunRows) {
                    unitNthNull(ni2) = false
                    unitNthL(ni2) = pLeadSeedL(hi2)(need - 1)
                    unitNthD(ni2) = pLeadSeedD(hi2)(need - 1)
                  } else unitNthNull(ni2) = true
                } else unitNthNull(ni2) = true
              } else {
                // RESPECT NULLS: frame reaches the group's k-th row iff
                // the run's global end ≥ k; the value itself is in the
                // local first-k buffer, or — when the group has fewer
                // than k rows through this partition but the straddling
                // run reaches row k — in the backward head chain at
                // group-row offset (k − rows-through-unit).
                if (runEnd >= nv.k) {
                  if (nv.k <= nthCnt(ni2)) {
                    unitNthNull(ni2) = nthBufN(ni2)(nv.k - 1)
                    unitNthL(ni2) = nthBufL(ni2)(nv.k - 1)
                    unitNthD(ni2) = nthBufD(ni2)(nv.k - 1)
                  } else {
                    val hi2 = nLeads + ni2
                    val ahead = (nv.k - throughUnit).toInt // ≥ 1 here
                    if (pLeadSeedL != null &&
                        ahead <= pLeadSeedL(hi2).length) {
                      unitNthNull(ni2) = pLeadSeedN(hi2)(ahead - 1)
                      unitNthL(ni2) = pLeadSeedL(hi2)(ahead - 1)
                      unitNthD(ni2) = pLeadSeedD(hi2)(ahead - 1)
                    } else unitNthNull(ni2) = true // defensive: the chain
                      // covers ≥ (runEnd − throughUnit) ≥ k − throughUnit
                      // values whenever the run truly continues
                  }
                } else unitNthNull(ni2) = true
              }
            }
            ni2 += 1
          }
          var li2 = 0
          while (li2 < nLastIgns) {
            if (lastIgns(li2).rangeFrame) {
              val ti2 = nLags + nRolls + li2
              // the run-continuation's last non-null (later rows win),
              // orElse the carry after the whole local run was pushed
              if (isLastUnit && pRtliHas != null && pRtliHas(li2)) {
                unitLastNull(li2) = false
                unitLastL(li2) = pRtliL(li2)
                unitLastD(li2) = pRtliD(li2)
              } else if (tailCnt(ti2) > 0L) {
                unitLastNull(li2) = false
                unitLastL(li2) = tailRingL(ti2)(0)
                unitLastD(li2) = tailRingD(ti2)(0)
              } else unitLastNull(li2) = true
            }
            li2 += 1
          }
        }
        val bodyOut = unit.iterator.flatMap { row =>
          rn += 1
          // with lead lookahead each row needs its OWN function row (it
          // outlives this iteration inside the pending buffer); without,
          // the shared fRow streams zero-copy as before
          val g = if (nLeads == 0) fRow else new GenericInternalRow(nFuncs)
          var ai = 0
          var gi = 0
          var ri = 0
          var ni = 0
          var lii = 0
          var fi = 0
          while (fi < nFuncs) {
            funcs(fi) match {
              case RowNumSpec => g.setInt(fi, rn.toInt)
              case RankSpec => g.setInt(fi, (runStart + 1).toInt)
              case DenseRankSpec => g.setInt(fi, dense.toInt)
              case PercentRankSpec =>
                // (rank - 1) / (n - 1), 0.0 for a single-row group — the
                // RankLike evaluate contract
                g.setDouble(fi,
                  if (gTotal <= 1L) 0d
                  else runStart.toDouble / (gTotal - 1L))
              case CumeDistSpec =>
                // (global end of the current peer run) / n — the CumeDist
                // evaluate contract (row counts THROUGH the last peer)
                g.setDouble(fi, runEnd.toDouble / gTotal)
              case NTileSpec(b) =>
                // Spark's NTile: the first (n % b) buckets carry one
                // extra row; rn is already the 1-based within-group index
                // (it counts from the group's prior-partition offset)
                val j0 = rn - 1
                val size = gTotal / b
                val rem = gTotal % b
                val thresh = rem * (size + 1)
                val bucket =
                  if (j0 < thresh) j0 / (size + 1) + 1
                  else rem + (j0 - thresh) / size + 1
                g.setInt(fi, bucket.toInt)
              case lg: LagSpec =>
                // emit the value `off` rows back (the ring's oldest slot —
                // the next write position once full), then push this row
                if (tailCnt(gi) >= lg.off) {
                  val i0 = (tailCnt(gi) % lg.off).toInt
                  if (tailRingN(gi)(i0)) g.update(fi, null)
                  else setNum(g, fi, lg.outType,
                    tailRingL(gi)(i0), tailRingD(gi)(i0))
                } else if (lg.defaultIsNull) g.update(fi, null)
                else setNum(g, fi, lg.outType, lg.dL, lg.dD)
                val v = tprojs(gi)(row)
                if (v.isNullAt(0)) {
                  // IGNORE NULLS: nulls never enter the replay ring, so
                  // the ring holds the last `off` NON-NULLs and the read
                  // above is the off-th most recent non-null
                  if (!lg.ignoreNulls) tailPut(gi, isNull = true, 0L, 0d)
                } else tailPut(gi, isNull = false,
                  if (lg.isDouble) 0L else v.getLong(0),
                  if (lg.isDouble) v.getDouble(0) else 0d)
                gi += 1
              case rl: RollSpec if rl.dec != null =>
                // decimal rolling frame (r14): the same oldest→newest
                // replay over the ring's Decimal channel — adds are
                // exact, overflow checked at emission like the window
                val ti = nLags + ri
                val v = tprojs(ti)(row)
                val curNull = v.isNullAt(0)
                val cur = if (curNull) null
                          else v.getDecimal(0, rl.dec.prec, rl.dec.scale)
                var acc: Decimal = null
                var n = 0L
                if (rollRetract(ti)) {
                  // sum/avg: exact running ring aggregate (see rollRetract)
                  acc = ringAggDec(ti)
                  n = ringAggNN(ti)
                } else {
                  val kk = rl.k
                  val avail = math.min(tailCnt(ti), kk.toLong).toInt
                  var j = 0
                  while (j < avail) {
                    val s2 = ((tailCnt(ti) - avail + j) % kk).toInt
                    if (!tailRingN(ti)(s2)) {
                      val dv = tailRingDec(ti)(s2)
                      acc = if (n == 0L) dv else combineDec(rl.kind, acc, dv)
                      n += 1
                    }
                    j += 1
                  }
                }
                if (!curNull) {
                  acc = if (n == 0L) cur else combineDec(rl.kind, acc, cur)
                  n += 1
                }
                if (n == 0L) g.update(fi, null)
                else g.update(fi, emitDec(rl.kind, acc, n, rl.dec, ansi))
                tailPut(ti, curNull, 0L, 0d, cur)
                ri += 1
              case rl: RollSpec =>
                // ROWS k PRECEDING .. CURRENT ROW: re-evaluate the frame
                // oldest→newest over the trailing ring, then the current
                // row — the exact order WindowExec's sliding frame
                // replays, so double sums match bitwise and long sums
                // honor the same ANSI overflow point
                val ti = nLags + ri
                val v = tprojs(ti)(row)
                val curNull = v.isNullAt(0)
                var accl = 0L
                var accd = 0d
                var n = 0L
                if (rollRetract(ti)) {
                  // count / legacy long sum: exact running ring aggregate
                  accl = ringAggL(ti)
                  n = ringAggNN(ti)
                } else {
                  val kk = rl.k
                  val avail = math.min(tailCnt(ti), kk.toLong).toInt
                  var j = 0
                  while (j < avail) {
                    val s2 = ((tailCnt(ti) - avail + j) % kk).toInt
                    if (!tailRingN(ti)(s2)) {
                      val (vl2, vd2) =
                        if (rl.kind == CountK) (0L, 0d)
                        else (tailRingL(ti)(s2), tailRingD(ti)(s2))
                      if (n == 0L) { accl = vl2; accd = vd2 }
                      else {
                        val (ml, md) =
                          combine(rl.kind, accl, accd, vl2, vd2, rl.isDouble)
                        accl = ml; accd = md
                      }
                      n += 1
                    }
                    j += 1
                  }
                }
                if (!curNull) {
                  val (cvL, cvD) =
                    if (rl.kind == CountK) (0L, 0d)
                    else if (rl.isDouble) (0L, v.getDouble(0))
                    else (v.getLong(0), 0d)
                  if (n == 0L) { accl = cvL; accd = cvD }
                  else {
                    val (ml, md) =
                      combine(rl.kind, accl, accd, cvL, cvD, rl.isDouble)
                    accl = ml; accd = md
                  }
                  n += 1
                }
                if (rl.kind == CountK) g.setLong(fi, n)
                else if (n == 0L) g.update(fi, null)
                else rl.kind match {
                  case AvgK => g.setDouble(fi, accd / n)
                  case _ => setNum(g, fi, rl.outType, accl, accd)
                }
                // push the current row into the history ring AFTER use
                // (count slots never read the value — its child may be
                // any type; only the null mask matters)
                val (pvL, pvD) =
                  if (curNull || rl.kind == CountK) (0L, 0d)
                  else if (rl.isDouble) (0L, v.getDouble(0))
                  else (v.getLong(0), 0d)
                tailPut(ti, curNull, pvL, pvD)
                ri += 1
              case _: LeadSpec => () // resolved by a FUTURE row or a flush
              case nv: NthSpec if nv.rangeFrame =>
                // per-run constant, precomputed in the unit pre-pass
                if (unitNthNull(ni)) g.update(fi, null)
                else setNum(g, fi, nv.outType, unitNthL(ni), unitNthD(ni))
                ni += 1
              case nv: NthSpec =>
                // capture this row into the group's first-k buffer FIRST:
                // for the k-th row the answer is the row itself (the ROWS
                // running frame ends at the current row). IGNORE NULLS
                // captures only non-nulls — the buffer then holds the
                // group's first k NON-NULL values.
                if (nthCnt(ni) < nv.k) {
                  val v = nthProjs(ni)(row)
                  val isNull = v.isNullAt(0)
                  if (!(isNull && nv.ignoreNulls)) {
                    val j = nthCnt(ni)
                    if (isNull) nthBufN(ni)(j) = true
                    else {
                      nthBufN(ni)(j) = false
                      if (nv.isDouble) nthBufD(ni)(j) = v.getDouble(0)
                      else nthBufL(ni)(j) = v.getLong(0)
                    }
                    nthCnt(ni) += 1
                  }
                }
                // RESPECT NULLS: rn is the 1-based GLOBAL group row index
                // (seeded from the prior-partition offset) — frame shorter
                // than k → NULL. IGNORE NULLS: k captured non-nulls is the
                // only condition (the frame reached its k-th non-null).
                val ready =
                  if (nv.ignoreNulls) nthCnt(ni) >= nv.k
                  else rn >= nv.k && nthCnt(ni) >= nv.k
                if (ready) {
                  if (nthBufN(ni)(nv.k - 1)) g.update(fi, null)
                  else setNum(g, fi, nv.outType,
                    nthBufL(ni)(nv.k - 1), nthBufD(ni)(nv.k - 1))
                } else g.update(fi, null)
                ni += 1
              case ls: LastIgnSpec if ls.rangeFrame =>
                // per-run constant, precomputed in the unit pre-pass
                if (unitLastNull(lii)) g.update(fi, null)
                else setNum(g, fi, ls.outType, unitLastL(lii), unitLastD(lii))
                lii += 1
              case ls: LastIgnSpec =>
                // forward-fill carry: push a non-null current value into
                // the 1-deep skip-null ring FIRST (the ROWS running frame
                // includes the current row), then emit the ring's value —
                // the latest non-null at or before this row, seeded across
                // partitions by the lag-tail chain
                val ti = nLags + nRolls + lii
                val v = tprojs(ti)(row)
                if (!v.isNullAt(0)) tailPut(ti, isNull = false,
                  if (ls.isDouble) 0L else v.getLong(0),
                  if (ls.isDouble) v.getDouble(0) else 0d)
                if (tailCnt(ti) > 0L)
                  setNum(g, fi, ls.outType, tailRingL(ti)(0), tailRingD(ti)(0))
                else g.update(fi, null)
                lii += 1
              case a: AggSpec if a.full =>
                // whole-group frame: the per-group constant from the
                // driver totals — no per-row accumulation at all
                if (a.kind == CountK) g.setLong(fi, ftN(ai))
                else if (ftN(ai) == 0L) g.update(fi, null)
                else if (a.dec != null)
                  g.update(fi, emitDec(a.kind, ftDec(ai), ftN(ai), a.dec, ansi))
                else a.kind match {
                  case AvgK => g.setDouble(fi, ftD(ai) / ftN(ai))
                  case _ => setNum(g, fi, a.outType, ftL(ai), ftD(ai))
                }
                ai += 1
              case a: AggSpec if a.dec != null =>
                // decimal running/peer-run aggregate (r14): prefix +
                // local accumulation in exact Decimal, the driver-chained
                // run tail merged for the partition's trailing RANGE run,
                // overflow checked per row at emission
                if (!a.peer) addTo(ai, row)
                var dv = accDec(ai)
                var n = accNN(ai)
                if (applyTail && a.peer && pTailN(ai) != 0L) {
                  dv = if (n == 0L) pTailDec(ai)
                       else combineDec(a.kind, dv, pTailDec(ai))
                  n += pTailN(ai)
                }
                if (n == 0L) g.update(fi, null)
                else g.update(fi, emitDec(a.kind, dv, n, a.dec, ansi))
                ai += 1
              case a: AggSpec =>
                if (!a.peer) addTo(ai, row)
                var l = accL(ai)
                var d = accD(ai)
                var n = accNN(ai)
                if (applyTail && a.peer && pTailN(ai) != 0L) {
                  if (n == 0L) { l = pTailL(ai); d = pTailD(ai) }
                  else {
                    val (ml, md) = combine(a.kind, l, d,
                      pTailL(ai), pTailD(ai), a.isDouble)
                    l = ml; d = md
                  }
                  n += pTailN(ai)
                }
                if (a.kind == CountK) g.setLong(fi, n)
                else if (n == 0L) g.update(fi, null)
                else a.kind match {
                  case AvgK => g.setDouble(fi, d / n)
                  case _ => setNum(g, fi, a.outType, l, d)
                }
                ai += 1
            }
            fi += 1
          }
          if (nLeads == 0) Iterator.single(outProj(joined(row, g)))
          else {
            // resolve earlier pending rows' lookahead from THIS row —
            // positionally for RESPECT NULLS slots, by non-null ordinal
            // for IGNORE NULLS slots (the arriving non-null is ordinal
            // leadNN+1; queued targets are non-decreasing, so the
            // resolvable entries are exactly the matching queue prefix)
            var ei = 0
            while (ei < nLeads) {
              if (leads(ei).ignoreNulls) {
                val v = ldprojs(ei)(row)
                if (!v.isNullAt(0)) {
                  leadNN(ei) += 1
                  val q = ignQ(ei)
                  val vL = if (leads(ei).isDouble) 0L else v.getLong(0)
                  val vD = if (leads(ei).isDouble) v.getDouble(0) else 0d
                  while (q.nonEmpty && q.head._2 == leadNN(ei)) {
                    val (eid, _) = q.removeHead()
                    val pe = pend((eid - pendBase).toInt)
                    setNum(pe.g, leadFuncIdx(ei), leads(ei).outType, vL, vD)
                    pe.unresolved -= 1
                  }
                }
              } else {
                val tgt = grpIdx - leads(ei).off
                if (tgt >= pendBase) {
                  val pg = pend((tgt - pendBase).toInt).g
                  val v = ldprojs(ei)(row)
                  if (v.isNullAt(0)) pg.update(leadFuncIdx(ei), null)
                  else setNum(pg, leadFuncIdx(ei), leads(ei).outType,
                    if (leads(ei).isDouble) 0L else v.getLong(0),
                    if (leads(ei).isDouble) v.getDouble(0) else 0d)
                }
              }
              ei += 1
            }
            val pe = new LeadPend(row.copy(), g, nIgnLeads)
            pend.append(pe)
            ei = 0
            while (ei < nLeads) {
              if (leads(ei).ignoreNulls)
                ignQ(ei).append((grpIdx, leadNN(ei) + leads(ei).off))
              ei += 1
            }
            grpIdx += 1
            if (pend.size > maxPending) throw new IllegalStateException(
              s"distributed window holds ${pend.size} pending lead rows > " +
              s"$maxPending ($MaxPendingLeadKey): an IGNORE NULLS lead " +
              "column is null for that many consecutive rows in one group " +
              "— run without the __dist_rank marker/flag so WindowExec " +
              "plans it, or raise the budget")
            // emit every fully-resolved head: RESPECT NULLS slots are
            // guaranteed filled once the buffer is deeper than their max
            // offset; IGNORE NULLS slots are tracked per entry. One
            // arriving non-null can release a whole null run at once.
            if (pend.size > maxRespLead && pend.head.unresolved == 0) {
              val h0 = pend.removeHead()
              pendBase += 1
              val first = outProj(joined(h0.row, h0.g))
              if (!(pend.nonEmpty && pend.size > maxRespLead &&
                    pend.head.unresolved == 0))
                Iterator.single(first) // common case: zero-copy, as before
              else {
                val outBuf =
                  scala.collection.mutable.ArrayBuffer[UnsafeRow](first.copy())
                while (pend.nonEmpty && pend.size > maxRespLead &&
                       pend.head.unresolved == 0) {
                  val h = pend.removeHead()
                  pendBase += 1
                  outBuf += outProj(joined(h.row, h.g)).copy()
                }
                outBuf.iterator
              }
            } else Iterator.empty
          }
        }
        if (flushedPrev == null) bodyOut
        else flushedPrev.iterator.map { pe =>
          outProj(joined(pe.row, pe.g))
        } ++ bodyOut
      }
      mainOut ++ finalFlush()
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): DistributedWindowExec = copy(child = newChild)
}

object DistributedWindowExec {
  /** Driver-side budget on Σ per-partition distinct groups — the
    * documented low-cardinality contract of the rewrite (the same
    * dim-sized-collect discipline as the rest of the repo). Sizing: a
    * (partition, group-run) stat is one UnsafeRow group key plus
    * O(nAggs + nLags·off + nRolls·k + nLeads·off) primitives — ≈ 100–700
    * bytes for typical shapes (few functions, offsets ≤ 64), so the 2²⁰
    * default caps driver heap at low hundreds of MB; the conf key exists
    * for specs to pin the fail-fast at a tiny edge and for operators on
    * fat stat rows to LOWER it. */
  val MaxCollectedGroups: Long = 1L << 20
  val MaxCollectedGroupsKey = "spark.graft.distributedWindow.maxCollectedGroups"

  private[plans] sealed trait FuncSpec extends Serializable
  private[plans] case object RowNumSpec extends FuncSpec
  private[plans] case object RankSpec extends FuncSpec
  private[plans] case object DenseRankSpec extends FuncSpec
  private[plans] case object PercentRankSpec extends FuncSpec
  private[plans] case object CumeDistSpec extends FuncSpec
  private[plans] case class NTileSpec(buckets: Int) extends FuncSpec

  private[plans] sealed trait AggKind extends Serializable
  private[plans] case object SumK extends AggKind
  private[plans] case object MinK extends AggKind
  private[plans] case object MaxK extends AggKind
  private[plans] case object CountK extends AggKind
  private[plans] case object AvgK extends AggKind

  /** Decimal-slot contract (r14): `(prec, scale)` is the ACCUMULATION
    * type — the aggregate's own buffer (Sum/Avg: `(min(38, p+10), s)`;
    * Min/Max: the input type) that inputs are cast to, so every add is
    * an exact same-scale Decimal add and block association cannot
    * diverge. `(outPrec, outScale)` is the emission result type;
    * `divScale` is Avg's intermediate Divide scale under Spark's
    * DecimalPrecision rule (−1 for the other kinds). Overflow is checked
    * only at emission ([[emitDec]]) — per row, the same point
    * WindowExec's CheckOverflow fires. */
  private[plans] case class DecInfo(prec: Int, scale: Int,
                                    outPrec: Int, outScale: Int,
                                    divScale: Int = -1) extends Serializable

  /** Merge two non-null decimal accumulators; `a` covers EARLIER rows.
    * Adds are exact (Decimal falls back to BigDecimal past the compact
    * range); extremes are first-wins on ties like the primitive path. */
  private[plans] def combineDec(kind: AggKind, a: Decimal, b: Decimal): Decimal =
    kind match {
      case MinK => if (b.compare(a) < 0) b else a
      case MaxK => if (b.compare(a) > 0) b else a
      case _ => a + b // SumK / AvgK: exact
    }

  /** Per-row decimal emission — WindowExec's evaluate pipeline replayed:
    * Sum = CheckOverflow(sum, buffer type): precision check, null in
    * legacy mode / ArithmeticException in ANSI, at the SAME row the
    * window would fire (the running sum keeps its exact value past an
    * overflow, so a later negative input can bring rows back in range —
    * both engines agree). Min/Max = the value itself (an input — never
    * overflows). Avg = CheckOverflowInSum on the sum, then Spark's
    * Divide chain: Decimal./ rounds the quotient HALF_UP at scale 38,
    * CheckOverflow rounds to the Divide result's `divScale`, Cast rounds
    * to `(outPrec, outScale)` — each HALF_UP, replayed stepwise so even
    * the double-rounding edge matches. */
  private[plans] def emitDec(kind: AggKind, acc: Decimal, n: Long,
                             dec: DecInfo, ansi: Boolean): Decimal = {
    def checked(v: java.math.BigDecimal, p: Int, s: Int): Decimal = {
      val d = Decimal(BigDecimal(v))
      if (d.changePrecision(p, s)) d
      else if (ansi) throw new ArithmeticException(
        s"$v cannot be represented as Decimal($p, $s) " +
        "(distributed window aggregate, ANSI mode)")
      else null
    }
    kind match {
      case MinK | MaxK => acc
      case SumK => checked(acc.toJavaBigDecimal, dec.prec, dec.scale)
      case AvgK =>
        val s = checked(acc.toJavaBigDecimal, dec.prec, dec.scale)
        if (s == null) null
        else {
          val hu = java.math.RoundingMode.HALF_UP
          val q = s.toJavaBigDecimal
            .divide(java.math.BigDecimal.valueOf(n), 38, hu)
            .setScale(dec.divScale, hu)
            .setScale(dec.outScale, hu)
          // the final Cast honors the session's ANSI contract like Sum
          checked(q, dec.outPrec, dec.outScale)
        }
      case CountK => throw new IllegalStateException(
        "count never takes the decimal channel")
    }
  }

  /** Running/peer-run aggregate, or — with `full` — a whole-group-frame
    * aggregate (ROWS/RANGE UNBOUNDED PRECEDING .. UNBOUNDED FOLLOWING):
    * a per-group constant read from the driver's budgeted full-stats
    * totals map, the ntile/percent_rank machinery (r12). `dec` non-null
    * routes the slot through the exact Decimal channel (r14). */
  private[plans] case class AggSpec(expr: Expression, peer: Boolean,
                                    kind: AggKind, isDouble: Boolean,
                                    outType: DataType,
                                    full: Boolean = false,
                                    dec: DecInfo = null) extends FuncSpec

  /** lag(expr, off) with a literal default; the per-group replay buffer
    * is `off` widened values, bounded by [[MaxLagOffset]]. IGNORE NULLS
    * (r12) skips null pushes, so the ring holds the last `off` NON-NULL
    * values — same bound, same chain. */
  private[plans] case class LagSpec(expr: Expression, off: Int,
                                    defaultIsNull: Boolean, dL: Long,
                                    dD: Double, isDouble: Boolean,
                                    outType: DataType,
                                    ignoreNulls: Boolean) extends FuncSpec

  /** lead(expr, off) with a literal default — lag mirrored: the exec
    * buffers pending rows and the driver chains each partition's
    * lookahead from later partitions' leading values. RESPECT NULLS
    * resolves positionally (pending ≤ max offset); IGNORE NULLS (r12)
    * resolves by non-null ordinal — a row waits for the off-th non-null
    * AFTER it, so pending is bounded by the longest null run + off,
    * guarded by [[MaxPendingLead]]. */
  private[plans] case class LeadSpec(expr: Expression, off: Int,
                                     defaultIsNull: Boolean, dL: Long,
                                     dD: Double, isDouble: Boolean,
                                     outType: DataType,
                                     ignoreNulls: Boolean) extends FuncSpec

  /** last_value(expr) IGNORE NULLS over a running frame — the
    * forward-fill carry: a 1-deep skip-null tail ring (the latest
    * non-null at or before the current row), driver-chained across
    * partitions exactly like lag history (r12). With `rangeFrame` (r13)
    * the frame ends at the peer RUN's end: the answer is a per-run
    * constant — the run-continuation's last non-null (backward driver
    * chain over the open run) orElse the carry after the whole local
    * run is pushed. */
  private[plans] case class LastIgnSpec(expr: Expression, isDouble: Boolean,
                                        outType: DataType,
                                        rangeFrame: Boolean = false)
    extends FuncSpec

  /** sum/min/max/count/avg over ROWS k PRECEDING .. CURRENT ROW: the
    * frame is re-evaluated per row from a k-deep trailing ring (the same
    * O(k)-per-row cost WindowExec's sliding frame pays, distributed).
    * `dec` non-null stores Decimal ring values (r14). */
  private[plans] case class RollSpec(expr: Expression, k: Int,
                                     kind: AggKind, isDouble: Boolean,
                                     outType: DataType,
                                     dec: DecInfo = null) extends FuncSpec

  /** first_value (k=1) and nth_value(expr, k) from the group's first-k
    * head buffer, driver-chained forward across partitions. IGNORE NULLS
    * (r12) captures the first k NON-NULL values instead — same bound,
    * same chain. With `rangeFrame` (r13) the frame ends at the peer
    * RUN's end: the answer is a per-run constant — null-vs-value decided
    * by the run's global end index (the cume_dist machinery), the value
    * read from the head buffer after the whole local run is captured,
    * or from the backward head chain when the k-th row lives in a later
    * partition of a straddling run. */
  private[plans] case class NthSpec(expr: Expression, k: Int,
                                    isDouble: Boolean,
                                    outType: DataType,
                                    ignoreNulls: Boolean,
                                    rangeFrame: Boolean = false)
    extends FuncSpec

  /** Largest accepted literal lag/lead offset and rolling-frame depth —
    * bounds every replay ring, pending buffer, and per-(partition,
    * group) tail/head the driver chains. */
  val MaxLagOffset: Int = 64

  /** Pending-row budget for IGNORE NULLS lead: a row is held until the
    * off-th non-null AFTER it arrives, so the buffer is bounded by the
    * longest null run + off, not by the offset. A column that is null
    * for 2²⁰ consecutive rows within one group fails fast here rather
    * than accumulating executor heap — still strictly better than
    * WindowExec, which buffers the ENTIRE window partition regardless.
    * Conf-overridable for specs to pin the fail-fast at a tiny edge. */
  val MaxPendingLead: Long = 1L << 20
  val MaxPendingLeadKey = "spark.graft.distributedWindow.maxPendingLead"

  /** Per-row pending-buffer entry for lead lookahead: the copied input
    * row, its function row, and how many IGNORE NULLS lead slots are
    * still awaiting a future non-null. */
  private[plans] final class LeadPend(val row: InternalRow,
                                      val g: GenericInternalRow,
                                      var unresolved: Int)

  /** Write an accumulated extreme/sum back in the window's own output
    * type (the widening casts in decode() are exact, so the narrowing
    * here is too). */
  private[plans] def setNum(row: GenericInternalRow, i: Int, dt: DataType,
                            l: Long, d: Double): Unit = dt match {
    case LongType => row.setLong(i, l)
    case IntegerType => row.setInt(i, l.toInt)
    case ShortType => row.setShort(i, l.toShort)
    case ByteType => row.setByte(i, l.toByte)
    case DoubleType => row.setDouble(i, d)
    case FloatType => row.setFloat(i, d.toFloat)
    case other => throw new IllegalStateException(s"unexpected type $other")
  }

  /** Per (partition, contiguous group run) pass-1 stats. sumL/sumD/sumDec
    * carry sums for SUM/AVG and extremes for MIN/MAX (nonNull = 0 means
    * "no value yet"; the Dec channel is non-null only for decimal slots —
    * r14); first* are the boundary peer run's stats; lag* are
    * trailing-history tails, lead* the leading-value heads. leadP
    * (r13) records each head capture's 1-based row index within this
    * partition's group segment — what lets the backward head chain carry
    * RUN-relative positions for the RANGE IGNORE NULLS shapes. firstRunLI*
    * (r13) is, per last_value-IGNORE-NULLS slot, the last non-null WITHIN
    * the partition's first peer run — the backward run-continuation
    * chain's per-partition contribution. (The last peer run's aggregate
    * arrays were carried but never read — dropped in r14; lastPeer and
    * lastRows remain the carry chain's keys.) */
  private[plans] case class GroupStat(key: UnsafeRow, rows: Long,
                                      sumL: Array[Long], sumD: Array[Double],
                                      sumDec: Array[Decimal],
                                      nonNull: Array[Long],
                                      runs: Long,
                                      firstPeer: UnsafeRow,
                                      firstSumL: Array[Long],
                                      firstSumD: Array[Double],
                                      firstSumDec: Array[Decimal],
                                      firstNN: Array[Long],
                                      firstRows: Long,
                                      lastPeer: UnsafeRow, lastRows: Long,
                                      lagL: Array[Array[Long]],
                                      lagD: Array[Array[Double]],
                                      lagDec: Array[Array[Decimal]],
                                      lagN: Array[Array[Boolean]],
                                      leadL: Array[Array[Long]],
                                      leadD: Array[Array[Double]],
                                      leadN: Array[Array[Boolean]],
                                      leadP: Array[Array[Long]],
                                      firstRunLIHas: Array[Boolean],
                                      firstRunLIL: Array[Long],
                                      firstRunLID: Array[Double])
  private[plans] case class Offsets(rows: Long, sumL: Array[Long],
                                    sumD: Array[Double],
                                    sumDec: Array[Decimal],
                                    nonNull: Array[Long],
                                    runsBefore: Long)
  private[plans] object Offsets {
    def zero(n: Int): Offsets =
      Offsets(0L, new Array[Long](n), new Array[Double](n),
        new Array[Decimal](n), new Array[Long](n), 0L)
  }
}
