package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Cast, CurrentRow, Expression, GenericInternalRow, JoinedRow, NamedExpression, RangeFrame, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}

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

/** The rewrite: a naive `row_number()` / running-`sum` window becomes a
  * distributed-window node. Two triggers:
  *  - session-wide: `spark.graft.distributedRank=true` (every matching
  *    window in the session rewrites — the AQP-dial shape of
  *    [[SketchDistinctRewrite]]);
  *  - per-query: a window column NAMED `__dist_rank` or
  *    `__dist_rank_<suffix>` (exact name or the reserved `_`-separated
  *    prefix — a bare `startsWith` would let an unrelated user column
  *    like `__dist_rankings` swap physical execution; r8 ADVICE) — the
  *    marker survives inside the plan itself, so EVERY QueryExecution
  *    built over it (including the fresh one a `df.write` constructs)
  *    rewrites deterministically without flipping session state for
  *    neighboring queries.
  * Supported window-expression shapes (r9 — r8 shipped the global
  * row_number only):
  *  - `row_number()` over any partition spec (RowNumber ignores its
  *    frame, so any frame matches);
  *  - `sum(expr)` over `ROWS|RANGE UNBOUNDED PRECEDING .. CURRENT ROW`
  *    (the resolved default frame of an ORDER BY window), non-DISTINCT,
  *    un-FILTERed, over a non-decimal numeric — the running-total
  *    family (cumulative spend, CDF numerators, banded offsets).
  * The node rewrites only when EVERY window expression on it is
  * supported (one unsupported neighbor keeps the whole node on
  * WindowExec — correctness first) and the order is non-empty. The pure
  * global single-row_number shape keeps the dedicated r8 operator
  * ([[DistributedGlobalRank]]); everything else becomes
  * [[DistributedWindow]]. Idempotent — the output contains no Window
  * node. */
object DistributedRankRewrite extends Rule[LogicalPlan] {
  val NameMarker = "__dist_rank"

  private def markerNamed(e: NamedExpression): Boolean =
    e.name == NameMarker || e.name.startsWith(NameMarker + "_")

  /** The supported function/frame shapes; sync the scaladoc above. */
  private def supported(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(f, WindowSpecDefinition(_, order, frame)), _)
        if order.nonEmpty =>
      f match {
        case _: RowNumber => true
        case AggregateExpression(Sum(se, _), _, false, None, _) =>
          (se.dataType match {
            case ByteType | ShortType | IntegerType | LongType
                 | FloatType | DoubleType => true
            case _ => false
          }) && (frame match {
            case SpecifiedWindowFrame(RowFrame | RangeFrame,
                                      UnboundedPreceding, CurrentRow) => true
            case _ => false
          })
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // parseBoolean never throws — a malformed flag value must not crash
    // EVERY query's optimization in the session (review finding)
    val flagOn = java.lang.Boolean.parseBoolean(
      conf.getConfString(DistributedRank.Flag, "false").trim)
    plan.transform {
      // the r8 operator: pure global single row_number
      case Window(Seq(a @ Alias(
            WindowExpression(_: RowNumber,
              WindowSpecDefinition(Nil, order, _)), _)),
          Nil, _, child, _)
          if order.nonEmpty && (flagOn || markerNamed(a)) =>
        DistributedGlobalRank(a.toAttribute, order, child)
      // the r9 generalization: grouped row_number / running sums
      case Window(exprs, parts, _, child, _)
          if exprs.nonEmpty && exprs.forall(supported) &&
             (flagOn || exprs.exists(markerNamed)) =>
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

/** Shared fail-fast guard for the IntegerType `row_number` both physical
  * operators inherit from the window they replace: a rank past
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
  * order-peers are co-located. Each function is then per-partition local
  * work plus a per-(partition, group) offset table:
  *
  *  - pass 1 (light; its shuffle files are reused by pass 2, so the data
  *    moves once): per partition, per contiguous group run, the row
  *    count and each sum's (total, non-null count);
  *  - driver: prefix-merge per group across partitions in partition
  *    order — O(Σ per-partition distinct groups) entries, guarded by
  *    [[DistributedWindowExec.MaxCollectedGroups]] (the operator's
  *    documented LOW-CARDINALITY contract: a high-cardinality partition
  *    key belongs on plain WindowExec, whose hash exchange is already
  *    the scale-correct plan for many small groups);
  *  - pass 2: stream each partition in order, resetting local state at
  *    group boundaries seeded from the group's offsets.
  *
  * RANGE frames (running `sum` whose frame ends at CURRENT ROW but
  * includes its order-peers) buffer one PEER RUN at a time — bounded by
  * the widest tie, never the partition (WindowExec buffers whole window
  * partitions) — because every peer reports the sum through the END of
  * its run. ROWS frames and `row_number` stream row-by-row with no
  * copies. Long sums add with `Math.addExact` (ANSI's overflow-throws
  * contract); a sum whose prefix is all-NULL is NULL, tracked via the
  * non-null counts. */
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
  override def outputOrdering: Seq[SortOrder] = groupSort ++ order
  override def outputPartitioning = child.outputPartitioning

  /** Decode the supported window shapes (the rewrite proved them). */
  private def decode(): Array[FuncSpec] = windowExprs.map {
    case Alias(WindowExpression(f, WindowSpecDefinition(_, _, frame)), _) =>
      f match {
        case _: RowNumber => RowNumSpec
        case ae @ AggregateExpression(Sum(se, _), _, _, _, _) =>
          val peer = frame match {
            case SpecifiedWindowFrame(RangeFrame, _, _) => true
            case _ => false
          }
          // accumulate in the Sum's own result type (LongType for
          // integral inputs, DoubleType for fractional) via a widening
          // cast, so pass-1/pass-2 arithmetic matches the window's
          SumSpec(Cast(se, ae.dataType), peer,
            isDouble = ae.dataType == DoubleType)
        case other => throw new IllegalStateException(
          s"unsupported window function reached the exec: $other")
      }
    case other => throw new IllegalStateException(
      s"unsupported window expression reached the exec: $other")
  }.toArray

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val funcs = decode()
    val sums: Array[SumSpec] =
      funcs.collect { case s: SumSpec => s }
    val nSums = sums.length
    val hasRowNum = funcs.contains(RowNumSpec)
    val anyPeer = sums.exists(_.peer)
    val groupExprs = groups
    val orderExprs = order.map(_.child)
    val input = child.execute()
    val nParts = input.getNumPartitions

    // ---- pass 1: per (partition, contiguous group run) counts + sums
    val statsPerPart: Array[Array[GroupStat]] = {
      val collected = input.mapPartitionsWithIndex({ (idx, it) =>
        val gproj = UnsafeProjection.create(groupExprs, childOutput)
        val sprojs = sums.map(f =>
          UnsafeProjection.create(f.expr :: Nil, childOutput))
        val buf = scala.collection.mutable.ArrayBuffer.empty[GroupStat]
        var cur: UnsafeRow = null
        var rows = 0L
        val sl = new Array[Long](nSums)
        val sd = new Array[Double](nSums)
        val nn = new Array[Long](nSums)
        def flush(): Unit = if (cur != null)
          buf += GroupStat(cur, rows, sl.clone(), sd.clone(), nn.clone())
        while (it.hasNext) {
          val row = it.next()
          val k = gproj(row)
          if (cur == null || k != cur) {
            flush(); cur = k.copy(); rows = 0L
            java.util.Arrays.fill(sl, 0L); java.util.Arrays.fill(sd, 0d)
            java.util.Arrays.fill(nn, 0L)
          }
          rows += 1
          var i = 0
          while (i < nSums) {
            val v = sprojs(i)(row)
            if (!v.isNullAt(0)) {
              nn(i) += 1
              if (sums(i).isDouble) sd(i) += v.getDouble(0)
              else sl(i) = Math.addExact(sl(i), v.getLong(0))
            }
            i += 1
          }
        }
        flush()
        Iterator.single((idx, buf.toArray))
      }, preservesPartitioning = true).collect()
      val arr = Array.fill(nParts)(Array.empty[GroupStat])
      collected.foreach { case (i, a) => arr(i) = a }
      arr
    }
    val collectedGroups = statsPerPart.iterator.map(_.length.toLong).sum
    if (collectedGroups > MaxCollectedGroups) throw new IllegalStateException(
      s"distributed window collected $collectedGroups (partition, group) " +
      s"stats > $MaxCollectedGroups: the partition key is too " +
      "high-cardinality for the range-partitioned rewrite — run without " +
      "the __dist_rank marker/flag so the hash-exchanged WindowExec plans it")

    // ---- driver: per-group prefix offsets in partition order
    val running = scala.collection.mutable.HashMap.empty[UnsafeRow, Offsets]
    val offsetsPerPart: Array[Map[UnsafeRow, Offsets]] =
      statsPerPart.map { stats =>
        val m = Map.newBuilder[UnsafeRow, Offsets]
        stats.foreach { st =>
          val o = running.getOrElse(st.key, Offsets.zero(nSums))
          m += st.key -> o
          val sl = new Array[Long](nSums)
          val sd = new Array[Double](nSums)
          val nn = new Array[Long](nSums)
          var i = 0
          while (i < nSums) {
            sl(i) = Math.addExact(o.sumL(i), st.sumL(i))
            sd(i) = o.sumD(i) + st.sumD(i)
            nn(i) = o.nonNull(i) + st.nonNull(i)
            i += 1
          }
          running(st.key) = Offsets(o.rows + st.rows, sl, sd, nn)
        }
        m.result()
      }
    if (hasRowNum) running.values.foreach(o => RankOverflow.check(o.rows))

    // ---- pass 2: stream, seeding group state from the offsets
    val outAttrs = output
    val nFuncs = funcs.length
    input.mapPartitionsWithIndex { (idx, it) =>
      val offs = offsetsPerPart(idx)
      val gproj = UnsafeProjection.create(groupExprs, childOutput)
      val pproj = UnsafeProjection.create(orderExprs, childOutput)
      val sprojs = sums.map(f =>
        UnsafeProjection.create(f.expr :: Nil, childOutput))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val fRow = new GenericInternalRow(nFuncs)
      var curGroup: UnsafeRow = null
      var rn = 0L
      var accL = new Array[Long](nSums)
      var accD = new Array[Double](nSums)
      var accNN = new Array[Long](nSums)
      def addTo(i: Int, row: InternalRow): Unit = {
        val v = sprojs(i)(row)
        if (!v.isNullAt(0)) {
          accNN(i) += 1
          if (sums(i).isDouble) accD(i) += v.getDouble(0)
          else accL(i) = Math.addExact(accL(i), v.getLong(0))
        }
      }
      // emission units: one PEER RUN (copies) when a RANGE sum needs
      // run-total lookahead, else single rows streamed without copy
      val units: Iterator[Array[InternalRow]] =
        if (!anyPeer) it.map(r => Array(r))
        else new Iterator[Array[InternalRow]] {
          private val b = it.buffered
          override def hasNext: Boolean = b.hasNext
          override def next(): Array[InternalRow] = {
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
            buf.toArray
          }
        }
      units.flatMap { unit =>
        val k = gproj(unit(0))
        if (curGroup == null || k != curGroup) {
          curGroup = k.copy()
          val base = offs.getOrElse(curGroup, Offsets.zero(nSums))
          rn = base.rows
          accL = base.sumL.clone(); accD = base.sumD.clone()
          accNN = base.nonNull.clone()
        }
        // RANGE sums see their whole peer run before any peer emits
        var i = 0
        while (i < nSums) {
          if (sums(i).peer) unit.foreach(addTo(i, _))
          i += 1
        }
        unit.iterator.map { row =>
          rn += 1
          var si = 0
          var fi = 0
          while (fi < nFuncs) {
            funcs(fi) match {
              case RowNumSpec => fRow.setInt(fi, rn.toInt)
              case s: SumSpec =>
                if (!s.peer) addTo(si, row)
                if (accNN(si) == 0L) fRow.update(fi, null)
                else if (s.isDouble) fRow.setDouble(fi, accD(si))
                else fRow.setLong(fi, accL(si))
                si += 1
            }
            fi += 1
          }
          outProj(joined(row, fRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): DistributedWindowExec = copy(child = newChild)
}

object DistributedWindowExec {
  /** Driver-side budget on Σ per-partition distinct groups — the
    * documented low-cardinality contract of the rewrite (the same
    * dim-sized-collect discipline as the rest of the repo). */
  val MaxCollectedGroups: Long = 1L << 20

  private[plans] sealed trait FuncSpec extends Serializable
  private[plans] case object RowNumSpec extends FuncSpec
  private[plans] case class SumSpec(expr: Expression, peer: Boolean,
                                    isDouble: Boolean) extends FuncSpec

  private[plans] case class GroupStat(key: UnsafeRow, rows: Long,
                                      sumL: Array[Long], sumD: Array[Double],
                                      nonNull: Array[Long])
  private[plans] case class Offsets(rows: Long, sumL: Array[Long],
                                    sumD: Array[Double], nonNull: Array[Long])
  private[plans] object Offsets {
    def zero(n: Int): Offsets =
      Offsets(0L, new Array[Long](n), new Array[Double](n), new Array[Long](n))
  }
}
