package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{OracleParity => OP, Tables}

/** Window-function coverage (SURVEY.md §2.5) + the SCD2 interval algebra
  * (§2.7) re-expressed as windows over a change log.
  *
  * Scale note: every window here partitions by a high-cardinality key
  * (customer, supplier, user) — the shuffle distributes evenly and each
  * partition's state fits an executor. The one deliberate exception is
  * q_window_rownum (global ordering) which is only ever applied to dim-sized
  * inputs (SURVEY §2.5 W1: surrogate ids for tiny dims; facts use hash keys).
  */
object Windows {

  // ------------------------------------------------------- q_window_rownum
  /** W1: `row_number() over (order by name)` — deterministic surrogate ids
    * for a dim table (dbt dim_department.sql:4 pattern). Single-partition by
    * design: dims are tiny; fact surrogate keys use md5 (q_md5_surrogate). */
  def qWindowRownum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir)
      .select($"n_name", $"n_regionkey")
      .withColumn("nation_id", row_number().over(Window.orderBy($"n_name")))
      .orderBy($"nation_id")
  }

  private val qWindowRownumSql =
    """SELECT n_name, n_regionkey,
      |  CAST(ROW_NUMBER() OVER (ORDER BY n_name) AS INT) AS nation_id
      |FROM nation ORDER BY nation_id""".stripMargin

  // --------------------------------------------------------- q_window_topk
  /** Ranked top-k per group: each customer's 3 largest orders. Partition by
    * customer → fully parallel; tie-broken on orderkey for determinism. */
  def qWindowTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rank_in_cust", row_number().over(w))
      .filter($"rank_in_cust" <= 3)
      .select(
        $"o_custkey", $"rank_in_cust", $"o_orderkey",
        OP.dec2($"o_totalprice").cast("double").as("total_price"))
      .orderBy($"o_custkey", $"rank_in_cust")
  }

  private val qWindowTopkSql =
    """SELECT o_custkey, rank_in_cust, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
      |FROM (
      |  SELECT *, CAST(ROW_NUMBER() OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT)
      |    AS rank_in_cust
      |  FROM orders)
      |WHERE rank_in_cust <= 3
      |ORDER BY o_custkey, rank_in_cust""".stripMargin

  // --------------------------------------------------------- q_topk_native
  /** The SAME top-3-orders-per-customer result as [[qWindowTopk]], computed
    * by graft's native bounded-heap aggregate (`topk`,
    * graft.expressions.TopKAgg) instead of a row_number window. The window
    * plan shuffles EVERY order row to its customer's partition and sorts
    * each group in full before discarding all but 3; the aggregate is
    * map-side combinable — each mapper reduces its share of a customer to
    * ≤ 3 (price, orderkey) scalars before the exchange, so the shuffle
    * moves O(customers × 3) entries. Same oracle as q_window_topk: the two
    * operators are proven equal through the DuckDB gate, not just a spec. */
  def qTopkNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // rank by the RAW price (the window/oracle sort key — ranking by the
    // 2-decimal-rounded value would diverge on prices differing only past
    // 2 decimals); the dec2 rounding is applied to the OUTPUT column only,
    // same as qWindowTopk's projection
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(expr("topk(o_totalprice, o_orderkey, 3)").as("top"))
      .select($"o_custkey", posexplode($"top"))
      .select($"o_custkey", ($"pos" + 1).cast("int").as("rank_in_cust"),
        $"col.id".as("o_orderkey"),
        OP.dec2($"col.score").cast("double").as("total_price"))
      .orderBy($"o_custkey", $"rank_in_cust")
  }

  // ------------------------------------------------------ q_window_running
  /** Frame-spec window: running quantity per supplier in ship order
    * (rowsBetween unboundedPreceding..current). Decimal-exact running sum so
    * every prefix matches the oracle bit-for-bit. The sort key includes
    * l_quantity because lineitem deliberately carries duplicate
    * (l_orderkey, l_linenumber) rows (the q_fact_antidedup fixture): without
    * it the duplicates' relative order is engine-dependent and the prefix
    * sums between them diverge (surfaced at sf0.1, row 539799). */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .withColumn("running_qty", sum(OP.dec2($"l_quantity")).over(w).cast("double"))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
      // running_qty as final key: the duplicate line rows tie on the first
      // three columns but carry different prefixes — without it the
      // presentation order of the tied pair is engine-dependent
      .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
  }

  private val qWindowRunningSql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_qty
      |FROM lineitem
      |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin

  // ---------------------------------------------------------- q_window_lag
  /** lag/lead: inter-event gap per user in microseconds. Exact integer
    * arithmetic (unix_micros) so no fp drift vs the oracle. */
  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("gap_us", unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
      .select($"user_id", $"event_id", $"gap_us")
      .orderBy($"user_id", $"event_id")
  }

  private val qWindowLagSql =
    """SELECT user_id, event_id,
      |  epoch_us(CAST(ts AS TIMESTAMP))
      |    - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
      |        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |    AS gap_us
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------------- q_scd2_rebuild
  /** SURVEY §2.7: SCD Type 2 dimension rebuilt from a change log. Treating
    * each user's event stream as attribute changes (event_type = the tracked
    * attribute): keep rows where the attribute differs from its predecessor
    * (change detection = the `row_hash IS DISTINCT FROM` test,
    * TL_combine.sql:42-49), then close validity intervals with lead()
    * (valid_to = next change's valid_from; null = current row).
    *
    * This is the window-native formulation of SCD2 — one shuffle on the
    * business key, no iterative merge. The batch-merge variant (current ∪
    * staged) is `graft.warehouse.Scd2`. */
  def qScd2Rebuild(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    scd2Versions(s, dir).orderBy($"user_id", $"valid_from", $"event_id")
  }

  /** The unordered SCD2 version history (shared by q_scd2_rebuild and
    * q_scd2_prune). */
  private def scd2Versions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = Tables.events(s, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      // null-safe "IS DISTINCT FROM" — first event (prev null) is a change
      .filter(!($"event_type" <=> $"prev_type"))
    val byUserChanges = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    changes
      .withColumn("valid_from", $"ts")
      .withColumn("valid_to", lead($"ts", 1).over(byUserChanges))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"user_id", $"event_type".as("attr_value"),
        $"valid_from", $"valid_to", $"is_current", $"event_id")
  }

  private val qScd2RebuildSql =
    """WITH evts AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |changes AS (
      |  SELECT * FROM (
      |    SELECT *, LAG(event_type, 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |    FROM evts)
      |  WHERE event_type IS DISTINCT FROM prev_type)
      |SELECT user_id, event_type AS attr_value,
      |  ts AS valid_from,
      |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |    AS is_current,
      |  event_id
      |FROM changes
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  // ----------------------------------------------------------- q_scd2_prune
  /** SCD2 retention maintenance: drop versions that CLOSED before the
    * retention horizon — exactly the rows no as-of query at t ≥ horizon can
    * ever return (a version is visible at t iff valid_from ≤ t < valid_to,
    * so `valid_to ≤ horizon` ⟹ invisible for every retained t; the version
    * spanning the horizon and all current rows survive the filter by
    * construction, no special-casing). Each kept row reports how many of
    * its key's versions were pruned — the audit count a maintenance job
    * logs. One keyed window + a stateless filter; at 100 TB this is the
    * partition-rewrite that keeps PIT-join state bounded. */
  def qScd2Prune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val horizon = lit("2024-01-20 00:00:00").cast("timestamp")
    scd2Versions(s, dir)
      .withColumn("n_pruned_for_key",
        count(when($"valid_to" <= horizon, 1))
          .over(Window.partitionBy($"user_id")))
      .filter($"valid_to".isNull || $"valid_to" > horizon)
      .select($"user_id", $"attr_value", $"valid_from", $"valid_to",
        $"is_current", $"event_id", $"n_pruned_for_key")
      .orderBy($"user_id", $"valid_from", $"event_id")
  }

  private val qScd2PruneSql =
    """WITH evts AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |changes AS (
      |  SELECT * FROM (
      |    SELECT *, LAG(event_type, 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |    FROM evts)
      |  WHERE event_type IS DISTINCT FROM prev_type),
      |versions AS (
      |  SELECT user_id, event_type AS attr_value,
      |    ts AS valid_from,
      |    LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to,
      |    event_id
      |  FROM changes),
      |counted AS (
      |  SELECT *, valid_to IS NULL AS is_current,
      |    count(*) FILTER (valid_to <= TIMESTAMP '2024-01-20 00:00:00')
      |      OVER (PARTITION BY user_id) AS n_pruned_for_key
      |  FROM versions)
      |SELECT user_id, attr_value, valid_from, valid_to, is_current,
      |  event_id, n_pruned_for_key
      |FROM counted
      |WHERE valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-20 00:00:00'
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  // ------------------------------------------------------------- registry
  // -------------------------------------------------------------- q_fact_rank
  /** Global dense ranking of every lineitem by price WITHOUT a global
    * window — the distributed-rank primitive the Inference family's
    * scaladocs point to for fact-scale order statistics, riding THE
    * shared [[graft.core.BandedRank.rowNumber]] decomposition (r10:
    * this query's original hand-rolled fixed-width min/max banding —
    * the prototype BandedRank was factored FROM — is retired; the
    * library form brings the equi-depth sampled boundaries, so one
    * heavy-tailed outlier can no longer collapse the bulk of the fact
    * into band 0, and there is exactly ONE implementation of the
    * band/offset machinery left in the repo). Every window in the RANK
    * COMPUTATION is either band-partitioned or over the O(bands)
    * offset aggregate — no global window/sort feeds the rank, so the
    * shape holds at any scale (add bands, not sort width). The trailing
    * .orderBy(global_rank) IS a fact-sized global range sort, but it is
    * presentation-only for oracle row-order parity (the oracle's ORDER BY
    * pays the same) — drop it when consuming ranks downstream. The oracle
    * is the plain global row_number — the decomposition must be
    * invisible. */
  def qFactRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
    graft.core.BandedRank
      .rowNumber(li, "cents", Seq("l_orderkey", "l_linenumber"),
        "global_rank")
      .select($"l_orderkey", $"l_linenumber",
        ($"cents".cast("double") / 100).as("price"), $"global_rank")
      .orderBy($"global_rank")
  }

  private val qFactRankSql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(cents AS DOUBLE) / 100 AS price,
      |  row_number() OVER (ORDER BY cents, l_orderkey, l_linenumber)
      |    AS global_rank
      |FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |ORDER BY global_rank""".stripMargin

  // -------------------------------------------------------- q_fact_rank_dist
  /** The SAME global fact rank as [[qFactRank]], written the NAIVE way —
    * one partition-less `row_number()` window — and executed through the
    * [[graft.plans.DistributedRank]] extension: the `__dist_rank` column
    * marker triggers the Catalyst rewrite to [[graft.plans.GlobalRankExec]]
    * (range-exchange distributed sort + per-partition offsets), so the
    * single-task WindowExec never exists in ANY QueryExecution built over
    * this plan (incl. the driver's write). Gate: the identical plain
    * row_number oracle as q_fact_rank — three implementations (banded,
    * naive-window semantics, custom physical operator) proven equal
    * through one oracle. DistributedRankSpec pins the plan shape and
    * flag-on == flag-off equality. */
  def qFactRankDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s) // installs the rule + strategy
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn(graft.plans.DistributedRankRewrite.NameMarker,
        row_number().over(
          Window.orderBy($"cents", $"l_orderkey", $"l_linenumber")))
      .select($"l_orderkey", $"l_linenumber",
        ($"cents".cast("double") / 100).as("price"),
        col(graft.plans.DistributedRankRewrite.NameMarker).cast("long")
          .as("global_rank"))
      .orderBy($"global_rank")
  }

  // ------------------------------------------- q_fact_rank_grouped_dist
  /** GROUPED distributed rank (r9 — the r8 operator handled only the
    * global form): `row_number() PARTITION BY l_returnflag`, written
    * naively and executed through [[graft.plans.DistributedWindowExec]]
    * via the `__dist_rank_*` marker. Three fact-proportional groups
    * would hash-exchange into THREE tasks on WindowExec — the low-
    * distinct-key anti-pattern [[graft.core.BandedRank]]'s grouped form
    * kills query-by-query; the operator now kills it for a user's
    * un-rewritten window too: the range exchange on (flag, cents, ...)
    * spreads every group over many partitions and ranks are local
    * position + a per-(partition, group) broadcast offset. Gate: the
    * plain grouped row_number oracle. */
  def qFactRankGroupedDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s) // installs the rule + strategy
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn(graft.plans.DistributedRankRewrite.NameMarker + "_g",
        row_number().over(Window.partitionBy($"l_returnflag")
          .orderBy($"cents", $"l_orderkey", $"l_linenumber")))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        ($"cents".cast("double") / 100).as("price"),
        col(graft.plans.DistributedRankRewrite.NameMarker + "_g")
          .cast("long").as("flag_rank"))
      .orderBy($"l_returnflag", $"flag_rank")
  }

  private val qFactRankGroupedDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |  CAST(cents AS DOUBLE) / 100 AS price,
      |  row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY cents, l_orderkey, l_linenumber) AS flag_rank
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |ORDER BY l_returnflag, flag_rank""".stripMargin

  // ------------------------------------------------- q_fact_cumsum_dist
  /** GLOBAL running sum (ROWS UNBOUNDED PRECEDING..CURRENT ROW over a
    * total order) through the distributed-window operator — the naive
    * cumulative-spend window whose built-in plan is the single-task
    * WindowExec, now executed as range exchange + per-partition local
    * accumulation seeded by broadcast per-partition sum offsets (the
    * prefix-sum decomposition [[graft.core.BandedRank.prefixSum]]
    * proves, derived automatically; Long sums add with the ANSI
    * overflow-throws contract). Gate: the plain window oracle. */
  def qFactCumsumDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn(graft.plans.DistributedRankRewrite.NameMarker + "_cs",
        sum($"cents").over(Window
          .orderBy($"cents", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"l_orderkey", $"l_linenumber", $"cents",
        col(graft.plans.DistributedRankRewrite.NameMarker + "_cs")
          .as("run_cents"))
      .orderBy($"cents", $"l_orderkey", $"l_linenumber")
  }

  private val qFactCumsumDistSql =
    """SELECT l_orderkey, l_linenumber, cents,
      |  CAST(sum(cents) OVER (ORDER BY cents, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS run_cents
      |FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |ORDER BY cents, l_orderkey, l_linenumber""".stripMargin

  // ----------------------------------------- q_fact_cumsum_grouped_dist
  /** Grouped RANGE-frame running sum — the resolved DEFAULT frame of an
    * ORDER BY window, where every order-peer (duplicate price) reports
    * the sum through the END of its peer run. Exercises the operator's
    * peer-run buffering (bounded by the widest tie, never the
    * partition) on top of the grouped offsets; ties on `cents` are real
    * in lineitem, and the result is deterministic BECAUSE the RANGE sum
    * is tie-insensitive. Gate: the plain default-frame window oracle
    * (DuckDB's ORDER BY-window default is the same RANGE frame). */
  def qFactCumsumGroupedDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn(graft.plans.DistributedRankRewrite.NameMarker + "_gcs",
        sum($"cents").over(Window.partitionBy($"l_returnflag")
          .orderBy($"cents")))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"cents",
        col(graft.plans.DistributedRankRewrite.NameMarker + "_gcs")
          .as("run_cents"))
      .orderBy($"l_returnflag", $"cents", $"l_orderkey", $"l_linenumber")
  }

  private val qFactCumsumGroupedDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, cents,
      |  CAST(sum(cents) OVER (PARTITION BY l_returnflag ORDER BY cents)
      |    AS BIGINT) AS run_cents
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |ORDER BY l_returnflag, cents, l_orderkey, l_linenumber""".stripMargin

  // ----------------------------------------------- q_fact_cumsum_decimal
  /** DECIMAL window-aggregate family through the distributed operator
    * (r14 — r13 VERDICT item 1): the warehouse's money columns are
    * NUMERIC(12,2) (reference `combined_dw_schema.sql:66,84`), and until
    * this round a fact-scale running `SUM(expense_amount)` DECLINED the
    * rewrite and fell back to the single-task WindowExec the operator
    * exists to kill. ONE Window node carries all three decimal frame
    * families over orders' totalprice as DECIMAL(12,2): running
    * sum/min/avg (ROWS UNBOUNDED..CURRENT → exact Decimal prefix +
    * broadcast offsets), a 4-row rolling avg (Decimal ring replay), and
    * a whole-group max (driver totals) — grouped by orderpriority,
    * totally ordered by (price, orderkey).
    *
    * Gate strategy: decimals never reach the OUTPUT — every column is
    * presented as an exact INTEGER (cents / micros), so the DuckDB
    * comparison is bit-exact with no float or decimal-dtype hazards
    * (oracle_check rejects DECIMAL final selects). The oracle replays
    * Spark's decimal avg — HALF_UP at scale 6 of sum/count — in pure
    * integer arithmetic: `(2·sum_cents·10⁴ + n) // (2·n)` (valid here:
    * totalprice is strictly positive at every SF). Spark's own pipeline
    * rounds the quotient at scales 38→18→6; diverging from the oracle's
    * single rounding would need ~17 consecutive 9s at digit 19 of the
    * exact quotient — unobserved at every gate scale, and the gate
    * would catch it. */
  def qFactCumsumDecimal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"price", $"o_orderkey")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderpriority",
        $"o_totalprice".cast("decimal(12,2)").as("price"))
      .withColumn(s"${m}_ds", sum($"price").over(run))
      .withColumn(s"${m}_dmn", min($"price").over(run))
      .withColumn(s"${m}_dav", avg($"price").over(run))
      .withColumn(s"${m}_ra", avg($"price").over(w.rowsBetween(-3, 0)))
      .withColumn(s"${m}_gx", max($"price").over(w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"o_orderkey", $"o_orderpriority",
        ($"price" * 100).cast("long").as("price_cents"),
        (col(s"${m}_ds") * 100).cast("long").as("run_sum_cents"),
        (col(s"${m}_dmn") * 100).cast("long").as("run_min_cents"),
        (col(s"${m}_dav") * 1000000).cast("long").as("run_avg_micros"),
        (col(s"${m}_ra") * 1000000).cast("long").as("roll_avg_micros"),
        (col(s"${m}_gx") * 100).cast("long").as("grp_max_cents"))
      // original-column ORDER BY — price_cents is a monotone bijection of
      // price, so this is the SAME total order and Spark elides the
      // terminal Exchange+Sort against the window's output ordering
      // (sort elision, see qFactRegrDist)
      .orderBy($"o_orderpriority", $"price", $"o_orderkey")
  }

  private val qFactCumsumDecimalSql =
    """SELECT o_orderkey, o_orderpriority, price_cents,
      |  CAST(sum(price_cents) OVER run AS BIGINT) AS run_sum_cents,
      |  CAST(min(price_cents) OVER run AS BIGINT) AS run_min_cents,
      |  CAST((2 * sum(price_cents) OVER run * 10000
      |        + count(price_cents) OVER run)
      |       // (2 * count(price_cents) OVER run) AS BIGINT)
      |    AS run_avg_micros,
      |  CAST((2 * sum(price_cents) OVER roll * 10000
      |        + count(price_cents) OVER roll)
      |       // (2 * count(price_cents) OVER roll) AS BIGINT)
      |    AS roll_avg_micros,
      |  CAST(max(price_cents) OVER grp AS BIGINT) AS grp_max_cents
      |FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS price_cents
      |  FROM orders)
      |WINDOW run AS (PARTITION BY o_orderpriority
      |    ORDER BY price_cents, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  roll AS (PARTITION BY o_orderpriority
      |    ORDER BY price_cents, o_orderkey
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
      |  grp AS (PARTITION BY o_orderpriority
      |    ORDER BY price_cents, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderpriority, price_cents, o_orderkey""".stripMargin

  // -------------------------------------------------- q_fact_vol_dist
  /** stddev/variance window family through the distributed operator via
    * [[graft.plans.WindowVarianceDecompose]] (r14): `stddev_samp`,
    * `var_pop` and `stddev_pop` OVER running / 20-row rolling /
    * whole-group frames on orders' totalprice as the warehouse
    * NUMERIC(12,2) money type — the rolling-volatility shape. The
    * decomposition turns each into exact-decimal `sum(x)` / `sum(x·x)` /
    * `count(x)` window aggregates (shapes [[graft.plans.DistributedWindowExec]]
    * routes over every frame family) plus one projection computing
    * `m2 = max(0, Σx² − (Σx)²/n)` — so the fact-scale volatility query
    * gets the distributed plan instead of declining to a single-task
    * WindowExec.
    *
    * Engine parity: both moment sums are EXACT decimals ((12,2) input,
    * (25,4) squares) in both engines; each is cast to double once, and
    * the remaining arithmetic (mul/div/sub/greatest/sqrt) is the same
    * IEEE op sequence. Two float hazards were hit and retired during
    * gating:
    *   - presenting RAW variance: variance of cents data is a terminating
    *     rational (denominator 10⁴·n²) that lands an exact `.xxxx5`
    *     rounding tie in ~10% of rows (the q_vwap landmine; 36/1500 rows
    *     at sf0.001) — every measure is presented THROUGH sqrt, whose
    *     output cannot terminate at the tie digit;
    *   - CANCELLATION: with the sequence windows ordered BY PRICE, a
    *     20-row frame holds 20 near-equal prices, so Σx² − (Σx)²/n
    *     cancels ~10 significant digits and sub-ULP differences in the
    *     engines' decimal→double casts flip the 4th decimal (29/150k rows
    *     at sf0.1) — the textbook two-pass-formula failure the rule's
    *     scaladoc warns about. The sequence windows (run/roll/grp) order
    *     by o_orderkey instead: each frame spans the full price
    *     distribution, variance is mean²-scale, no cancellation. The
    *     RANGE window keeps ORDER BY price (peer-run semantics are the
    *     point); its prefixes are safe because small prefixes hold small
    *     prices (small absolute noise) and large prefixes have
    *     full-spread variance.
    * The var_pop/var_samp FUNCTIONS are still exercised through the rule
    * — the query sqrt's their output. Flag-on/flag-off checksums agree
    * exactly: the decomposed bases are exact decimals in BOTH executors,
    * so routing cannot surface (unlike a Welford chain). */
  def qFactVolDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_orderkey")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val roll = w.rowsBetween(-19, 0)
    // RANGE orders by price ALONE — peers are price ties; adding the id
    // tiebreak would make every run a singleton and silently degrade the
    // peer-run test to ROWS
    val rng = Window.partitionBy($"o_orderpriority").orderBy($"price")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val grp = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_orderpriority",
        $"o_totalprice".cast("decimal(12,2)").as("price"))
      // the rng window (different ORDER BY) is added LAST so the three
      // (o_orderkey)-ordered windows stack adjacently and WindowStackMerge
      // collapses them into one DistributedWindowExec — interleaved, the
      // incompatible node would split the stack (2 nodes, not 3)
      .withColumn(s"${m}_rs", stddev_samp($"price").over(run))
      .withColumn(s"${m}_rv", var_pop($"price").over(roll))
      .withColumn(s"${m}_gv", var_samp($"price").over(grp))
      .withColumn(s"${m}_ng", stddev_pop($"price").over(rng))
      .select($"o_orderkey", $"o_orderpriority",
        ($"price" * 100).cast("long").as("price_cents"),
        // n=1 prefix → NULL by the divide-by-zero contract (non-legacy)
        round(col(s"${m}_rs"), 4).as("run_stddev"),
        round(sqrt(col(s"${m}_rv")), 4).as("roll_sd"),
        round(col(s"${m}_ng"), 4).as("rng_stddev"),
        round(sqrt(col(s"${m}_gv")), 4).as("grp_sd"))
      // original-column ORDER BY (sort elision, see qFactRegrDist): the
      // top rng node's child is sorted (priority, price), so the terminal
      // sort needs only the okey tiebreak pass and no exchange
      .orderBy($"o_orderpriority", $"price", $"o_orderkey")
  }

  private val qFactVolDistSql =
    """SELECT o_orderkey, o_orderpriority, price_cents,
      |  CASE WHEN n_run = 1 THEN NULL
      |       ELSE round(sqrt(greatest(0, sxx_run - sx_run * sx_run / n_run)
      |                       / (n_run - 1)), 4) END AS run_stddev,
      |  round(sqrt(greatest(0, sxx_roll - sx_roll * sx_roll / n_roll)
      |             / n_roll), 4) AS roll_sd,
      |  round(sqrt(greatest(0, sxx_rng - sx_rng * sx_rng / n_rng)
      |             / n_rng), 4) AS rng_stddev,
      |  CASE WHEN n_grp = 1 THEN NULL
      |       ELSE round(sqrt(greatest(0, sxx_grp - sx_grp * sx_grp / n_grp)
      |                       / (n_grp - 1)), 4) END AS grp_sd
      |FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(price * 100 AS BIGINT) AS price_cents,
      |    CAST(sum(price) OVER run AS DOUBLE) AS sx_run,
      |    CAST(sum(price * price) OVER run AS DOUBLE) AS sxx_run,
      |    CAST(count(price) OVER run AS DOUBLE) AS n_run,
      |    CAST(sum(price) OVER roll AS DOUBLE) AS sx_roll,
      |    CAST(sum(price * price) OVER roll AS DOUBLE) AS sxx_roll,
      |    CAST(count(price) OVER roll AS DOUBLE) AS n_roll,
      |    CAST(sum(price) OVER rng AS DOUBLE) AS sx_rng,
      |    CAST(sum(price * price) OVER rng AS DOUBLE) AS sxx_rng,
      |    CAST(count(price) OVER rng AS DOUBLE) AS n_rng,
      |    CAST(sum(price) OVER grp AS DOUBLE) AS sx_grp,
      |    CAST(sum(price * price) OVER grp AS DOUBLE) AS sxx_grp,
      |    CAST(count(price) OVER grp AS DOUBLE) AS n_grp
      |  FROM (
      |    SELECT o_orderkey, o_orderpriority,
      |      CAST(o_totalprice AS DECIMAL(12,2)) AS price
      |    FROM orders)
      |  WINDOW run AS (PARTITION BY o_orderpriority
      |      ORDER BY o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    roll AS (PARTITION BY o_orderpriority
      |      ORDER BY o_orderkey
      |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
      |    rng AS (PARTITION BY o_orderpriority
      |      ORDER BY price
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    grp AS (PARTITION BY o_orderpriority
      |      ORDER BY o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |ORDER BY o_orderpriority, price_cents, o_orderkey""".stripMargin

  // ------------------------------------------------- q_fact_corr_dist
  /** The TWO-INPUT moment window family through
    * [[graft.plans.WindowVarianceDecompose]] (r14): `corr`, `covar_samp`
    * and `covar_pop` OVER running / 20-row rolling / whole-group frames
    * on lineitem's (extendedprice, quantity) pair — strongly positively
    * correlated by TPC-H construction (price = qty × unit price), so the
    * co-moment is never cancellation-dominated. Decomposed, each becomes
    * six exact-decimal sum/count bases the distributed operator routes;
    * Spark's CovarianceAgg/PearsonCorrelation buffers would DECLINE.
    *
    * Window order: (l_orderkey, l_linenumber, price, qty) — lineitem's
    * duplicate (orderkey, linenumber) rows DIFFER in measures, and any
    * residual tie after the measure tiebreaks has identical (price, qty),
    * so every prefix multiset (hence every running sum) is deterministic.
    *
    * Presentation: corr is a dimensionless ratio (noise ~1e-15 relative,
    * boundary-safe at 4 dp). Raw covariances are NOT presentable — their
    * absolute 1-ULP operand noise (the engines' >2^53 decimal→double
    * casts can double-round differently) scales with Σxy — so each is
    * presented as the dimensionless `cov·n²/(Σx·Σy)` with the
    * normalizing sums taken as exact decimal window aggregates in the
    * same query: absolute noise ~1e-16, sign preserved, engine-exact at
    * 4 dp. */
  def qFactCorrDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"price", $"qty")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val roll = w.rowsBetween(-19, 0)
    val grp = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    def ratio(cov: Column, n: Column, sx: Column, sy: Column): Column =
      cov * n.cast("double") * n.cast("double") /
        (sx.cast("double") * sy.cast("double"))
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_extendedprice".cast("decimal(12,2)").as("price"),
        $"l_quantity".cast("decimal(12,2)").as("qty"))
      .withColumn(s"${m}_cr", corr($"price", $"qty").over(run))
      .withColumn(s"${m}_cs", covar_samp($"price", $"qty").over(run))
      .withColumn(s"${m}_cp", covar_pop($"price", $"qty").over(roll))
      .withColumn(s"${m}_gc", corr($"price", $"qty").over(grp))
      .withColumn(s"${m}_nr", count($"price").over(run))
      .withColumn(s"${m}_sxr", sum($"price").over(run))
      .withColumn(s"${m}_syr", sum($"qty").over(run))
      .withColumn(s"${m}_nl", count($"price").over(roll))
      .withColumn(s"${m}_sxl", sum($"price").over(roll))
      .withColumn(s"${m}_syl", sum($"qty").over(roll))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        ($"price" * 100).cast("long").as("price_cents"),
        ($"qty" * 100).cast("long").as("qty_cents"),
        // `+ 0d` normalizes −0.0 → +0.0 (the q_fact_skew_dist pattern):
        // a 2-row frame with equal qty has true co-moment 0 whose double
        // replay is a tiny negative; Spark's round() drops the sign but
        // DuckDB's keeps it, and the driver hashes "-0.0" ≠ "0.0" — the
        // exact r14 driver-red class (315 cells at sf0.01, all sign-of-zero)
        (round(col(s"${m}_cr"), 4) + lit(0d)).as("corr_run"),
        (round(ratio(col(s"${m}_cs"), col(s"${m}_nr"),
          col(s"${m}_sxr"), col(s"${m}_syr")), 4) + lit(0d)).as("cs_run_ratio"),
        (round(ratio(col(s"${m}_cp"), col(s"${m}_nl"),
          col(s"${m}_sxl"), col(s"${m}_syl")), 4) + lit(0d)).as("cp_roll_ratio"),
        (round(col(s"${m}_gc"), 4) + lit(0d)).as("corr_grp"))
      // original-column ORDER BY — sort elision, see qFactRegrDist
      .orderBy($"l_returnflag", $"l_orderkey", $"l_linenumber",
        $"price", $"qty")
  }

  private val qFactCorrDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, price_cents, qty_cents,
      |  CASE WHEN n_run = 1 THEN NULL
      |       ELSE round((sxy_run - sx_run * sy_run / n_run)
      |                  / sqrt(greatest(0, sxx_run - sx_run * sx_run / n_run)
      |                         * greatest(0, syy_run - sy_run * sy_run / n_run)),
      |                  4) + 0 END AS corr_run,
      |  CASE WHEN n_run = 1 THEN NULL
      |       ELSE round((sxy_run - sx_run * sy_run / n_run) / (n_run - 1)
      |                  * n_run * n_run / (sx_run * sy_run), 4) + 0
      |       END AS cs_run_ratio,
      |  round((sxy_roll - sx_roll * sy_roll / n_roll) / n_roll
      |        * n_roll * n_roll / (sx_roll * sy_roll), 4) + 0 AS cp_roll_ratio,
      |  CASE WHEN n_grp = 1 THEN NULL
      |       ELSE round((sxy_grp - sx_grp * sy_grp / n_grp)
      |                  / sqrt(greatest(0, sxx_grp - sx_grp * sx_grp / n_grp)
      |                         * greatest(0, syy_grp - sy_grp * sy_grp / n_grp)),
      |                  4) + 0 END AS corr_grp
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(price * 100 AS BIGINT) AS price_cents,
      |    CAST(qty * 100 AS BIGINT) AS qty_cents,
      |    CAST(sum(price) OVER run AS DOUBLE) AS sx_run,
      |    CAST(sum(qty) OVER run AS DOUBLE) AS sy_run,
      |    CAST(sum(price * qty) OVER run AS DOUBLE) AS sxy_run,
      |    CAST(sum(price * price) OVER run AS DOUBLE) AS sxx_run,
      |    CAST(sum(qty * qty) OVER run AS DOUBLE) AS syy_run,
      |    CAST(count(price) OVER run AS DOUBLE) AS n_run,
      |    CAST(sum(price) OVER roll AS DOUBLE) AS sx_roll,
      |    CAST(sum(qty) OVER roll AS DOUBLE) AS sy_roll,
      |    CAST(sum(price * qty) OVER roll AS DOUBLE) AS sxy_roll,
      |    CAST(count(price) OVER roll AS DOUBLE) AS n_roll,
      |    CAST(sum(price) OVER grp AS DOUBLE) AS sx_grp,
      |    CAST(sum(qty) OVER grp AS DOUBLE) AS sy_grp,
      |    CAST(sum(price * qty) OVER grp AS DOUBLE) AS sxy_grp,
      |    CAST(sum(price * price) OVER grp AS DOUBLE) AS sxx_grp,
      |    CAST(sum(qty * qty) OVER grp AS DOUBLE) AS syy_grp,
      |    CAST(count(price) OVER grp AS DOUBLE) AS n_grp
      |  FROM (
      |    SELECT l_orderkey, l_linenumber, l_returnflag,
      |      CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |      CAST(l_quantity AS DECIMAL(12,2)) AS qty
      |    FROM lineitem)
      |  WINDOW run AS (PARTITION BY l_returnflag
      |      ORDER BY l_orderkey, l_linenumber, price, qty
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    roll AS (PARTITION BY l_returnflag
      |      ORDER BY l_orderkey, l_linenumber, price, qty
      |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
      |    grp AS (PARTITION BY l_returnflag
      |      ORDER BY l_orderkey, l_linenumber, price, qty
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      |ORDER BY l_returnflag, l_orderkey, l_linenumber, price_cents,
      |  qty_cents""".stripMargin

  // ------------------------------------------------- q_fact_regr_dist
  /** The LINEAR-REGRESSION window family through
    * [[graft.plans.WindowVarianceDecompose]] (r14): `regr_slope`,
    * `regr_intercept`, `regr_r2`, `regr_sxy` (decomposed onto the same
    * six exact-decimal bases as corr), `regr_sxx`/`regr_syy` (via the
    * analyzer's RegrReplacement), and `regr_count` (via the multi-child
    * count rewrite) OVER running / 20-row rolling / whole-group frames
    * on lineitem's (extendedprice ~ quantity) pair — the rolling-beta
    * shape. All seven are Welford-buffer DeclarativeAggregates that
    * would DECLINE the distributed window; decomposed, every one routes.
    *
    * Presentation: slope/intercept/r2 are already ratio-formed (the
    * Σ-scale cast noise divides out; values O(10³) at most, 4 dp safe);
    * the raw moment sums sxy/sxx/syy are NOT presentable (the corr
    * query's >2^53 double-rounding caveat) and ride as the
    * dimensionless `M·n/(Σa·Σb)` with the normalizing sums taken as
    * exact decimal window aggregates in the same query. regr_count is
    * exact BIGINT. Window order totalizes exactly as q_fact_corr_dist. */
  def qFactRegrDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"price", $"qty")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val roll = w.rowsBetween(-19, 0)
    val grp = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_extendedprice".cast("decimal(12,2)").as("price"),
        $"l_quantity".cast("decimal(12,2)").as("qty"))
      .withColumn(s"${m}_sl", expr("regr_slope(price, qty)").over(run))
      .withColumn(s"${m}_ic", expr("regr_intercept(price, qty)").over(run))
      .withColumn(s"${m}_r2", expr("regr_r2(price, qty)").over(roll))
      .withColumn(s"${m}_sxy", expr("regr_sxy(price, qty)").over(roll))
      .withColumn(s"${m}_sxx", expr("regr_sxx(price, qty)").over(run))
      .withColumn(s"${m}_syy", expr("regr_syy(price, qty)").over(grp))
      .withColumn(s"${m}_rc", expr("regr_count(price, qty)").over(run))
      .withColumn(s"${m}_nl", count($"qty").over(roll))
      .withColumn(s"${m}_sxl", sum($"qty").over(roll))
      .withColumn(s"${m}_syl", sum($"price").over(roll))
      .withColumn(s"${m}_nr", count($"qty").over(run))
      .withColumn(s"${m}_sxr", sum($"qty").over(run))
      .withColumn(s"${m}_ng", count($"price").over(grp))
      .withColumn(s"${m}_syg", sum($"price").over(grp))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        ($"price" * 100).cast("long").as("price_cents"),
        ($"qty" * 100).cast("long").as("qty_cents"),
        // `+ 0d` −0.0-normalization on every rounded double — see
        // qFactCorrDist (the r14 driver-red sign-of-zero class)
        (round(col(s"${m}_sl"), 4) + lit(0d)).as("slope_run"),
        (round(col(s"${m}_ic"), 4) + lit(0d)).as("icept_run"),
        (round(col(s"${m}_r2"), 4) + lit(0d)).as("r2_roll"),
        (round(col(s"${m}_sxy") * col(s"${m}_nl").cast("double") /
          (col(s"${m}_sxl").cast("double") *
            col(s"${m}_syl").cast("double")), 4) + lit(0d)).as("sxy_roll_ratio"),
        (round(col(s"${m}_sxx") * col(s"${m}_nr").cast("double") /
          (col(s"${m}_sxr").cast("double") *
            col(s"${m}_sxr").cast("double")), 4) + lit(0d)).as("sxx_run_ratio"),
        (round(col(s"${m}_syy") * col(s"${m}_ng").cast("double") /
          (col(s"${m}_syg").cast("double") *
            col(s"${m}_syg").cast("double")), 4) + lit(0d)).as("syy_grp_ratio"),
        col(s"${m}_rc").as("rc_run"))
      // ORDER BY the original (price, qty) — monotone bijections of the
      // presented (price_cents, qty_cents), so the SAME total order — lets
      // Spark prove the merged window's output ordering already satisfies
      // the presentation sort: the terminal Exchange+Sort (and its
      // RangePartitioner sampling job, a full re-execution of the window
      // pipeline) vanish from the plan (guide §2.4). Oracle-gated: same
      // rows, same order, same hash.
      .orderBy($"l_returnflag", $"l_orderkey", $"l_linenumber",
        $"price", $"qty")
  }

  private val qFactRegrDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, price_cents,
      |  qty_cents,
      |  CASE WHEN m2x_run = 0 THEN NULL
      |       ELSE round(m11_run / m2x_run, 4) + 0 END AS slope_run,
      |  CASE WHEN m2x_run = 0 THEN NULL
      |       ELSE round(sy_run / n_run
      |                  - m11_run / m2x_run * (sx_run / n_run), 4) + 0
      |       END AS icept_run,
      |  round(CASE WHEN m2x_roll = 0 THEN NULL
      |             WHEN m2y_roll = 0 THEN 1.0
      |             ELSE m11_roll * m11_roll / (m2x_roll * m2y_roll)
      |        END, 4) + 0 AS r2_roll,
      |  round(m11_roll * n_roll / (sx_roll * sy_roll), 4) + 0
      |    AS sxy_roll_ratio,
      |  round(m2x_run * n_run / (sx_run * sx_run), 4) + 0 AS sxx_run_ratio,
      |  round(m2y_grp * n_grp / (sy_grp * sy_grp), 4) + 0 AS syy_grp_ratio,
      |  CAST(n_run AS BIGINT) AS rc_run
      |FROM (
      |  SELECT *,
      |    sxy_run - sx_run * sy_run / n_run AS m11_run,
      |    greatest(0, sxx_run - sx_run * sx_run / n_run) AS m2x_run,
      |    sxy_roll - sx_roll * sy_roll / n_roll AS m11_roll,
      |    greatest(0, sxx_roll - sx_roll * sx_roll / n_roll) AS m2x_roll,
      |    greatest(0, syy_roll - sy_roll * sy_roll / n_roll) AS m2y_roll,
      |    greatest(0, syy_grp - sy_grp * sy_grp / n_grp) AS m2y_grp
      |  FROM (
      |    SELECT l_orderkey, l_linenumber, l_returnflag,
      |      CAST(price * 100 AS BIGINT) AS price_cents,
      |      CAST(qty * 100 AS BIGINT) AS qty_cents,
      |      CAST(sum(qty) OVER run AS DOUBLE) AS sx_run,
      |      CAST(sum(price) OVER run AS DOUBLE) AS sy_run,
      |      CAST(sum(qty * price) OVER run AS DOUBLE) AS sxy_run,
      |      CAST(sum(qty * qty) OVER run AS DOUBLE) AS sxx_run,
      |      CAST(count(qty) OVER run AS DOUBLE) AS n_run,
      |      CAST(sum(qty) OVER roll AS DOUBLE) AS sx_roll,
      |      CAST(sum(price) OVER roll AS DOUBLE) AS sy_roll,
      |      CAST(sum(qty * price) OVER roll AS DOUBLE) AS sxy_roll,
      |      CAST(sum(qty * qty) OVER roll AS DOUBLE) AS sxx_roll,
      |      CAST(sum(price * price) OVER roll AS DOUBLE) AS syy_roll,
      |      CAST(count(qty) OVER roll AS DOUBLE) AS n_roll,
      |      CAST(sum(price) OVER grp AS DOUBLE) AS sy_grp,
      |      CAST(sum(price * price) OVER grp AS DOUBLE) AS syy_grp,
      |      CAST(count(price) OVER grp AS DOUBLE) AS n_grp
      |    FROM (
      |      SELECT l_orderkey, l_linenumber, l_returnflag,
      |        CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |        CAST(l_quantity AS DECIMAL(12,2)) AS qty
      |      FROM lineitem)
      |    WINDOW run AS (PARTITION BY l_returnflag
      |        ORDER BY l_orderkey, l_linenumber, price, qty
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |      roll AS (PARTITION BY l_returnflag
      |        ORDER BY l_orderkey, l_linenumber, price, qty
      |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
      |      grp AS (PARTITION BY l_returnflag
      |        ORDER BY l_orderkey, l_linenumber, price, qty
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)))
      |ORDER BY l_returnflag, l_orderkey, l_linenumber, price_cents,
      |  qty_cents""".stripMargin

  // ------------------------------------------------- q_fact_skew_dist
  /** The THIRD/FOURTH-moment window family through
    * [[graft.plans.WindowVarianceDecompose]] (r14): `skewness` and
    * `kurtosis` OVER running / 20-row rolling / whole-group frames on
    * lineitem's extendedprice — the rolling higher-moment risk shape.
    * Both are CentralMomentAgg Welford buffers that would DECLINE the
    * distributed window; decomposed they ride FIVE bases, and because
    * g1/g2 are scale-invariant the decimal input is rebased to exact
    * unscaled cents summed as DECIMAL(38,0) — every base is exact, both
    * engines replay the identical double formula from identical
    * integers.
    *
    * Float discipline (the q_fact_vol_dist lessons): frames order by
    * (l_orderkey, l_linenumber, price, qty), so every frame spans the
    * full price distribution — the two-pass central moments are at
    * μ³/μ⁴ scale, never cancellation-dominated, and the presented
    * statistics are dimensionless O(1)–O(10) ratios through sqrt /
    * non-terminating divisions (no exact rounding ties). `round(·,4)+0`
    * normalizes a −0.0 from tiny-negative M3 frames (a symmetric 2-row
    * frame's M3 rounds to ±1e-12) to +0.0 in both engines. n=1 frames
    * hit the m2=0 guard → NULL (default divide-by-zero mode), replayed
    * by the oracle's CASE. */
  def qFactSkewDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"price", $"qty")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val roll = w.rowsBetween(-19, 0)
    val grp = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_extendedprice".cast("decimal(12,2)").as("price"),
        $"l_quantity".cast("decimal(12,2)").as("qty"))
      .withColumn(s"${m}_skr", skewness($"price").over(run))
      .withColumn(s"${m}_kur", kurtosis($"price").over(run))
      .withColumn(s"${m}_skl", skewness($"price").over(roll))
      .withColumn(s"${m}_kug", kurtosis($"price").over(grp))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        ($"price" * 100).cast("long").as("price_cents"),
        ($"qty" * 100).cast("long").as("qty_cents"),
        (round(col(s"${m}_skr"), 4) + lit(0d)).as("sk_run"),
        (round(col(s"${m}_kur"), 4) + lit(0d)).as("ku_run"),
        (round(col(s"${m}_skl"), 4) + lit(0d)).as("sk_roll"),
        (round(col(s"${m}_kug"), 4) + lit(0d)).as("ku_grp"))
      // original-column ORDER BY — sort elision, see qFactRegrDist
      .orderBy($"l_returnflag", $"l_orderkey", $"l_linenumber",
        $"price", $"qty")
  }

  private val qFactSkewDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, price_cents,
      |  qty_cents,
      |  round(CASE WHEN m2_run = 0 THEN NULL
      |    ELSE sqrt(n_run) * ((s3_run - 3 * mu_run * s2_run)
      |           + 2 * n_run * (mu_run * mu_run * mu_run))
      |         / sqrt(m2_run * m2_run * m2_run) END, 4) + 0 AS sk_run,
      |  round(CASE WHEN m2_run = 0 THEN NULL
      |    ELSE n_run * greatest(0, (s4_run - 4 * mu_run * s3_run)
      |           + 6 * (mu_run * mu_run) * s2_run
      |           - 3 * n_run * ((mu_run * mu_run) * (mu_run * mu_run)))
      |         / (m2_run * m2_run) - 3 END, 4) + 0 AS ku_run,
      |  round(CASE WHEN m2_roll = 0 THEN NULL
      |    ELSE sqrt(n_roll) * ((s3_roll - 3 * mu_roll * s2_roll)
      |           + 2 * n_roll * (mu_roll * mu_roll * mu_roll))
      |         / sqrt(m2_roll * m2_roll * m2_roll) END, 4) + 0 AS sk_roll,
      |  round(CASE WHEN m2_grp = 0 THEN NULL
      |    ELSE n_grp * greatest(0, (s4_grp - 4 * mu_grp * s3_grp)
      |           + 6 * (mu_grp * mu_grp) * s2_grp
      |           - 3 * n_grp * ((mu_grp * mu_grp) * (mu_grp * mu_grp)))
      |         / (m2_grp * m2_grp) - 3 END, 4) + 0 AS ku_grp
      |FROM (
      |  SELECT *,
      |    s1_run / n_run AS mu_run,
      |    greatest(0, s2_run - s1_run * s1_run / n_run) AS m2_run,
      |    s1_roll / n_roll AS mu_roll,
      |    greatest(0, s2_roll - s1_roll * s1_roll / n_roll) AS m2_roll,
      |    s1_grp / n_grp AS mu_grp,
      |    greatest(0, s2_grp - s1_grp * s1_grp / n_grp) AS m2_grp
      |  FROM (
      |    SELECT l_orderkey, l_linenumber, l_returnflag,
      |      CAST(price * 100 AS BIGINT) AS price_cents,
      |      CAST(qty * 100 AS BIGINT) AS qty_cents,
      |      CAST(sum(u) OVER run AS DOUBLE) AS s1_run,
      |      CAST(sum(u * u) OVER run AS DOUBLE) AS s2_run,
      |      CAST(sum(u * u * u) OVER run AS DOUBLE) AS s3_run,
      |      CAST(sum((u * u) * (u * u)) OVER run AS DOUBLE) AS s4_run,
      |      CAST(count(u) OVER run AS DOUBLE) AS n_run,
      |      CAST(sum(u) OVER roll AS DOUBLE) AS s1_roll,
      |      CAST(sum(u * u) OVER roll AS DOUBLE) AS s2_roll,
      |      CAST(sum(u * u * u) OVER roll AS DOUBLE) AS s3_roll,
      |      CAST(count(u) OVER roll AS DOUBLE) AS n_roll,
      |      CAST(sum(u) OVER grp AS DOUBLE) AS s1_grp,
      |      CAST(sum(u * u) OVER grp AS DOUBLE) AS s2_grp,
      |      CAST(sum(u * u * u) OVER grp AS DOUBLE) AS s3_grp,
      |      CAST(sum((u * u) * (u * u)) OVER grp AS DOUBLE) AS s4_grp,
      |      CAST(count(u) OVER grp AS DOUBLE) AS n_grp
      |    FROM (
      |      SELECT l_orderkey, l_linenumber, l_returnflag, price, qty,
      |        CAST(CAST(price * 100 AS BIGINT) AS HUGEINT) AS u
      |      FROM (
      |        SELECT l_orderkey, l_linenumber, l_returnflag,
      |          CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |          CAST(l_quantity AS DECIMAL(12,2)) AS qty
      |        FROM lineitem))
      |    WINDOW run AS (PARTITION BY l_returnflag
      |        ORDER BY l_orderkey, l_linenumber, price, qty
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |      roll AS (PARTITION BY l_returnflag
      |        ORDER BY l_orderkey, l_linenumber, price, qty
      |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
      |      grp AS (PARTITION BY l_returnflag
      |        ORDER BY l_orderkey, l_linenumber, price, qty
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)))
      |ORDER BY l_returnflag, l_orderkey, l_linenumber, price_cents,
      |  qty_cents""".stripMargin

  // ------------------------------------------------ q_fact_timewindow
  /** The literal-offset RANGE frame — `sum(price) OVER (ORDER BY day
    * RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)`, the rolling-7/30-day
    * revenue shape — through [[graft.plans.RangeFrameCollapse]] (r14).
    * This frame family is the one shape the distributed window operator
    * deliberately DECLINES (a frame's reach-back is value- not
    * row-bounded, so partition chaining cannot budget it); the collapse
    * rule replaces the single-task WindowExec with the scale-correct
    * plan a human would write: per-(flag, day) partial aggregation
    * (map-side combinable), the same RANGE window replayed over the
    * ~2.5k-row day table, and a broadcast-size equi-join back to the
    * fact. sum/count/min/max compose exactly over whole peer runs —
    * every value is an exact decimal/integer, so the gate hashes cents
    * with no float anywhere. */
  def qFactTimewindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag").orderBy($"day")
    val w7 = w.rangeBetween(-6, 0)
    val w30 = w.rangeBetween(-29, 0)
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        datediff(to_date($"l_shipdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("day"),
        $"l_extendedprice".cast("decimal(12,2)").as("price"))
      .withColumn(s"${m}_s7", sum($"price").over(w7))
      .withColumn(s"${m}_c7", count($"price").over(w7))
      .withColumn(s"${m}_mn7", min($"price").over(w7))
      .withColumn(s"${m}_mx7", max($"price").over(w7))
      .withColumn(s"${m}_s30", sum($"price").over(w30))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"day",
        ($"price" * 100).cast("long").as("price_cents"),
        (col(s"${m}_s7") * 100).cast("long").as("sum7_cents"),
        col(s"${m}_c7").as("cnt7"),
        (col(s"${m}_mn7") * 100).cast("long").as("min7_cents"),
        (col(s"${m}_mx7") * 100).cast("long").as("max7_cents"),
        (col(s"${m}_s30") * 100).cast("long").as("sum30_cents"))
      .orderBy($"l_returnflag", $"day", $"l_orderkey", $"l_linenumber",
        $"price_cents")
  }

  private val qFactTimewindowSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, day,
      |  CAST(price * 100 AS BIGINT) AS price_cents,
      |  CAST(sum(price) OVER w7 * 100 AS BIGINT) AS sum7_cents,
      |  count(price) OVER w7 AS cnt7,
      |  CAST(min(price) OVER w7 * 100 AS BIGINT) AS min7_cents,
      |  CAST(max(price) OVER w7 * 100 AS BIGINT) AS max7_cents,
      |  CAST(sum(price) OVER w30 * 100 AS BIGINT) AS sum30_cents
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
      |      AS day,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      |  FROM lineitem)
      |WINDOW w7 AS (PARTITION BY l_returnflag ORDER BY day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
      |  w30 AS (PARTITION BY l_returnflag ORDER BY day
      |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
      |ORDER BY l_returnflag, day, l_orderkey, l_linenumber,
      |  price_cents""".stripMargin

  // ------------------------------------------------ q_fact_ranks_dist
  /** `rank()` + `dense_rank()` PARTITION BY flag ORDER BY cents through
    * [[graft.plans.DistributedWindowExec]] (r10 — the operator grew the
    * full rank family). Ties on cents are real in lineitem, and both
    * functions are tie-INSENSITIVE (every peer reports the run's rank),
    * so the result is deterministic without an id tiebreak — which is
    * exactly what makes them a sharper distribution test than
    * row_number: a peer run that straddles a range-exchange boundary
    * must still report ONE rank, the cross-partition run-chaining
    * DistributedRankSpec's straddle case pins. Gate: the plain
    * rank/dense_rank window oracle. */
  def qFactRanksDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag").orderBy($"cents")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn(s"${m}_rk", rank().over(w))
      .withColumn(s"${m}_dr", dense_rank().over(w))
      .withColumn(s"${m}_pr", percent_rank().over(w))
      .withColumn(s"${m}_cd", cume_dist().over(w))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"cents",
        col(s"${m}_rk").cast("long").as("price_rank"),
        col(s"${m}_dr").cast("long").as("price_dense_rank"),
        // percent_rank is (rank−1)/(n−1) off exact integers — identical
        // division both engines, tie-insensitive like its rank inputs
        round(col(s"${m}_pr"), 9).as("price_pct_rank"),
        // cume_dist = (run end)/n off exact integers (r11 — the peer
        // run's END comes from the backward driver row chain when the
        // run straddles partitions); tie-insensitive like rank
        round(col(s"${m}_cd"), 9).as("price_cume_dist"))
      .orderBy($"l_returnflag", $"cents", $"l_orderkey", $"l_linenumber")
  }

  private val qFactRanksDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, cents,
      |  rank() OVER (PARTITION BY l_returnflag ORDER BY cents)
      |    AS price_rank,
      |  dense_rank() OVER (PARTITION BY l_returnflag ORDER BY cents)
      |    AS price_dense_rank,
      |  round(percent_rank() OVER (PARTITION BY l_returnflag
      |    ORDER BY cents), 9) AS price_pct_rank,
      |  round(cume_dist() OVER (PARTITION BY l_returnflag
      |    ORDER BY cents), 9) AS price_cume_dist
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |ORDER BY l_returnflag, cents, l_orderkey, l_linenumber""".stripMargin

  // ----------------------------------------------- q_fact_runagg_dist
  /** The running-aggregate family — `min`/`max`/`count`/`avg` over the
    * RANGE default frame, grouped — through the distributed-window
    * operator (r10). All four are tie-insensitive under RANGE (peers
    * share the end-of-run value), so the cents order needs no tiebreak;
    * the avg rides exact integer cents in a double (< 2⁵³ at any test
    * scale), so block-associated accumulation is bit-equal to the
    * sequential window and the gate can hash it. Gate: the plain
    * four-function window oracle. */
  def qFactRunaggDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag").orderBy($"cents")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn(s"${m}_mn", min($"cents").over(w))
      .withColumn(s"${m}_mx", max($"cents").over(w))
      .withColumn(s"${m}_ct", count($"cents").over(w))
      .withColumn(s"${m}_av", avg($"cents").over(w))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"cents",
        col(s"${m}_mn").as("run_min"), col(s"${m}_mx").as("run_max"),
        col(s"${m}_ct").as("run_count"), col(s"${m}_av").as("run_avg"))
      .orderBy($"l_returnflag", $"cents", $"l_orderkey", $"l_linenumber")
  }

  private val qFactRunaggDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, cents,
      |  CAST(min(cents) OVER w AS BIGINT) AS run_min,
      |  CAST(max(cents) OVER w AS BIGINT) AS run_max,
      |  CAST(count(cents) OVER w AS BIGINT) AS run_count,
      |  CAST(sum(cents) OVER w AS DOUBLE) / count(cents) OVER w AS run_avg
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |WINDOW w AS (PARTITION BY l_returnflag ORDER BY cents)
      |ORDER BY l_returnflag, cents, l_orderkey, l_linenumber""".stripMargin

  // ------------------------------------------------ q_fact_delta_dist
  /** Per-flag price STEP in BOTH directions — `cents − lag(cents, 1)`
    * and `lead(cents, 1) − cents` over the total (cents, orderkey,
    * linenumber) order — through the distributed window (r10: lag joined
    * the operator's family; r11: lead closed the documented gap). Lag is
    * replayed from a bounded per-group ring whose history the driver
    * chains FORWARD across partition boundaries; lead holds a bounded
    * pending buffer whose lookahead the driver chains BACKWARD (each
    * partition's trailing rows read the next partitions' leading
    * values), so a flag group spanning many range partitions sees both
    * neighbors at every boundary. First/last row per flag yield NULL
    * (no default). Gate: the plain lag/lead window oracle. */
  def qFactDeltaDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"cents", $"l_orderkey", $"l_linenumber")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      // the marker must name the BARE window expression — a composite
      // like `cents - lag(...)` would reach the Window node under an
      // internal extraction alias the rewrite can't see
      .withColumn(s"${m}_lag", lag($"cents", 1).over(w))
      .withColumn(s"${m}_lead", lead($"cents", 1).over(w))
      .withColumn(s"${m}_nt", ntile(10).over(w))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"cents",
        ($"cents" - col(s"${m}_lag")).as("step_c"),
        (col(s"${m}_lead") - $"cents").as("step_next"),
        // ntile rides the same total order (it is tie-order-dependent
        // like row_number); deciles of the per-flag price distribution
        col(s"${m}_nt").cast("long").as("price_decile"))
      .orderBy($"l_returnflag", $"cents", $"l_orderkey", $"l_linenumber")
  }

  private val qFactDeltaDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, cents,
      |  cents - lag(cents, 1) OVER (PARTITION BY l_returnflag
      |    ORDER BY cents, l_orderkey, l_linenumber) AS step_c,
      |  lead(cents, 1) OVER (PARTITION BY l_returnflag
      |    ORDER BY cents, l_orderkey, l_linenumber) - cents AS step_next,
      |  ntile(10) OVER (PARTITION BY l_returnflag
      |    ORDER BY cents, l_orderkey, l_linenumber) AS price_decile
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |ORDER BY l_returnflag, cents, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------- q_fact_rolling_dist
  /** BOUNDED moving frame — sum/min/count/avg over `ROWS BETWEEN 6
    * PRECEDING AND CURRENT ROW`, grouped by flag over the total price
    * order — through the distributed window (r11: rolling frames joined
    * the operator). The frame is re-evaluated per row from a k-deep
    * trailing ring (the identical O(k)-per-row cost WindowExec's sliding
    * frame pays — but distributed over range partitions instead of one
    * hash task per flag), with ring history driver-chained across
    * partition boundaries so the first rows of each partition see the
    * previous partition's tail. The avg rides exact integer cents (7-row
    * frame sums ≪ 2⁵³ in a double), so the left-to-right frame replay is
    * bit-equal to the window and the gate can hash it. Gate: the plain
    * sliding-frame window oracle. */
  def qFactRollingDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"cents", $"l_orderkey", $"l_linenumber")
      .rowsBetween(-6, Window.currentRow)
    // second node: the ROWS running frame carrying the group-HEAD pair
    // (first_value / nth_value — r11's forward head chain): each flag's
    // cheapest price and third-cheapest price, NULL for the first two
    // rows of the flag (frame shorter than 3)
    val w2 = Window.partitionBy($"l_returnflag")
      .orderBy($"cents", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // third node (r13): the RANGE default frame — real tie runs under
    // ORDER BY cents alone — carrying the previously-DECLINED per-run
    // shapes: RANGE nth_value and RANGE IGNORE NULLS first/last. The
    // value column pv derives from the sort key (NULL on every third
    // cent value), so each per-run answer is tie-insensitive and the
    // gate can hash it.
    val w3 = Window.partitionBy($"l_returnflag").orderBy($"cents")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("pv",
        when($"cents" % 3 === 0, lit(null).cast("long"))
          .otherwise($"cents"))
      .withColumn(s"${m}_rs", sum($"cents").over(w))
      .withColumn(s"${m}_rm", min($"cents").over(w))
      .withColumn(s"${m}_rc", count($"cents").over(w))
      .withColumn(s"${m}_ra", avg($"cents").over(w))
      .withColumn(s"${m}_fv", first($"cents").over(w2))
      .withColumn(s"${m}_n3", nth_value($"cents", 3).over(w2))
      .withColumn(s"${m}_r3", nth_value($"pv", 3).over(w3))
      .withColumn(s"${m}_r2i", nth_value($"pv", 2, ignoreNulls = true).over(w3))
      .withColumn(s"${m}_rfi", first($"pv", ignoreNulls = true).over(w3))
      .withColumn(s"${m}_rli", last($"pv", ignoreNulls = true).over(w3))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"cents",
        col(s"${m}_rs").as("roll_sum"), col(s"${m}_rm").as("roll_min"),
        col(s"${m}_rc").as("roll_count"), col(s"${m}_ra").as("roll_avg"),
        col(s"${m}_fv").as("flag_first"), col(s"${m}_n3").as("flag_third"),
        col(s"${m}_r3").as("rng_third"),
        col(s"${m}_r2i").as("rng_second_nn"),
        col(s"${m}_rfi").as("rng_first_nn"),
        col(s"${m}_rli").as("rng_carry_nn"))
      .orderBy($"l_returnflag", $"cents", $"l_orderkey", $"l_linenumber")
  }

  private val qFactRollingDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, cents,
      |  CAST(sum(cents) OVER w AS BIGINT) AS roll_sum,
      |  CAST(min(cents) OVER w AS BIGINT) AS roll_min,
      |  CAST(count(cents) OVER w AS BIGINT) AS roll_count,
      |  CAST(sum(cents) OVER w AS DOUBLE) / count(cents) OVER w
      |    AS roll_avg,
      |  CAST(first_value(cents) OVER w2 AS BIGINT) AS flag_first,
      |  CAST(nth_value(cents, 3) OVER w2 AS BIGINT) AS flag_third,
      |  CAST(nth_value(pv, 3) OVER w3 AS BIGINT) AS rng_third,
      |  CAST(nth_value(pv, 2 IGNORE NULLS) OVER w3 AS BIGINT)
      |    AS rng_second_nn,
      |  CAST(first_value(pv IGNORE NULLS) OVER w3 AS BIGINT)
      |    AS rng_first_nn,
      |  CAST(last_value(pv IGNORE NULLS) OVER w3 AS BIGINT)
      |    AS rng_carry_nn
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag, cents,
      |    CASE WHEN cents % 3 = 0 THEN NULL ELSE cents END AS pv
      |  FROM (
      |    SELECT l_orderkey, l_linenumber, l_returnflag,
      |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        AS cents
      |    FROM lineitem))
      |WINDOW w AS (PARTITION BY l_returnflag
      |  ORDER BY cents, l_orderkey, l_linenumber
      |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |w2 AS (PARTITION BY l_returnflag
      |  ORDER BY cents, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |w3 AS (PARTITION BY l_returnflag ORDER BY cents)
      |ORDER BY l_returnflag, cents, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------- q_fact_fullframe_dist
  /** WHOLE-GROUP frames — sum/min/count/avg over `ROWS BETWEEN UNBOUNDED
    * PRECEDING AND UNBOUNDED FOLLOWING`, mixed with a running sum on the
    * same node, grouped by flag — through the distributed window (r12:
    * full frames joined the operator). A whole-group aggregate is a
    * per-group CONSTANT: it reads the driver's budgeted full-stats totals
    * map (the ntile/percent_rank machinery), so the exec buffers NOTHING
    * for it — where WindowExec materializes the whole partition to
    * evaluate an unbounded-following frame. The avg rides exact integer
    * cents (flag sums ≪ 2⁵³ in a double). Gate: the plain full-frame
    * window oracle. */
  def qFactFullframeDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val ord = Window.partitionBy($"l_returnflag")
      .orderBy($"cents", $"l_orderkey", $"l_linenumber")
    val full = ord.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn(s"${m}_fs", sum($"cents").over(full))
      .withColumn(s"${m}_fm", min($"cents").over(full))
      .withColumn(s"${m}_fc", count($"cents").over(full))
      .withColumn(s"${m}_fa", avg($"cents").over(full))
      .withColumn(s"${m}_rs", sum($"cents").over(run))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"cents",
        col(s"${m}_fs").as("flag_sum"), col(s"${m}_fm").as("flag_min"),
        col(s"${m}_fc").as("flag_count"), col(s"${m}_fa").as("flag_avg"),
        col(s"${m}_rs").as("run_sum"))
      .orderBy($"l_returnflag", $"cents", $"l_orderkey", $"l_linenumber")
  }

  private val qFactFullframeDistSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, cents,
      |  CAST(sum(cents) OVER f AS BIGINT) AS flag_sum,
      |  CAST(min(cents) OVER f AS BIGINT) AS flag_min,
      |  CAST(count(cents) OVER f AS BIGINT) AS flag_count,
      |  CAST(sum(cents) OVER f AS DOUBLE) / count(cents) OVER f
      |    AS flag_avg,
      |  CAST(sum(cents) OVER r AS BIGINT) AS run_sum
      |FROM (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem)
      |WINDOW f AS (PARTITION BY l_returnflag
      |  ORDER BY cents, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |r AS (PARTITION BY l_returnflag
      |  ORDER BY cents, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_returnflag, cents, l_orderkey, l_linenumber""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fact_fullframe_dist" -> (qFactFullframeDist _),
    "q_fact_rank" -> (qFactRank _),
    "q_fact_ranks_dist" -> (qFactRanksDist _),
    "q_fact_runagg_dist" -> (qFactRunaggDist _),
    "q_fact_delta_dist" -> (qFactDeltaDist _),
    "q_fact_rolling_dist" -> (qFactRollingDist _),
    "q_fact_rank_dist" -> (qFactRankDist _),
    "q_fact_rank_grouped_dist" -> (qFactRankGroupedDist _),
    "q_fact_cumsum_dist" -> (qFactCumsumDist _),
    "q_fact_cumsum_decimal" -> (qFactCumsumDecimal _),
    "q_fact_vol_dist" -> (qFactVolDist _),
    "q_fact_corr_dist" -> (qFactCorrDist _),
    "q_fact_regr_dist" -> (qFactRegrDist _),
    "q_fact_skew_dist" -> (qFactSkewDist _),
    "q_fact_timewindow" -> (qFactTimewindow _),
    "q_fact_cumsum_grouped_dist" -> (qFactCumsumGroupedDist _),
    "q_window_rownum"  -> (qWindowRownum _),
    "q_window_topk"    -> (qWindowTopk _),
    "q_topk_native"    -> (qTopkNative _),
    "q_window_running" -> (qWindowRunning _),
    "q_window_lag"     -> (qWindowLag _),
    "q_scd2_rebuild"   -> (qScd2Rebuild _),
    "q_scd2_prune"     -> (qScd2Prune _))

  val oracle: Map[String, String] = Map(
    "q_fact_rank" -> qFactRankSql,
    // the custom physical operator must reproduce the plain global
    // row_number exactly — same oracle as q_fact_rank (operators proven
    // equal through the gate, the q_topk_native precedent)
    "q_fact_rank_dist" -> qFactRankSql,
    // the r9 generalized operator shapes, each against the PLAIN window
    // oracle — the custom physical execution must be invisible
    "q_fact_rank_grouped_dist" -> qFactRankGroupedDistSql,
    "q_fact_cumsum_dist" -> qFactCumsumDistSql,
    "q_fact_cumsum_decimal" -> qFactCumsumDecimalSql,
    "q_fact_vol_dist" -> qFactVolDistSql,
    "q_fact_corr_dist" -> qFactCorrDistSql,
    "q_fact_regr_dist" -> qFactRegrDistSql,
    "q_fact_skew_dist" -> qFactSkewDistSql,
    "q_fact_timewindow" -> qFactTimewindowSql,
    "q_fact_cumsum_grouped_dist" -> qFactCumsumGroupedDistSql,
    "q_fact_ranks_dist" -> qFactRanksDistSql,
    "q_fact_runagg_dist" -> qFactRunaggDistSql,
    "q_fact_delta_dist" -> qFactDeltaDistSql,
    "q_fact_rolling_dist" -> qFactRollingDistSql,
    "q_fact_fullframe_dist" -> qFactFullframeDistSql,
    "q_window_rownum"  -> qWindowRownumSql,
    "q_window_topk"    -> qWindowTopkSql,
    // the native-aggregate variant must reproduce the window result exactly
    "q_topk_native"    -> qWindowTopkSql,
    "q_window_running" -> qWindowRunningSql,
    "q_window_lag"     -> qWindowLagSql,
    "q_scd2_rebuild"   -> qScd2RebuildSql,
    "q_scd2_prune"     -> qScd2PruneSql)
}
