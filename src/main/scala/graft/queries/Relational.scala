package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{OracleParity => OP, Tables}

/** Core relational operator coverage (SURVEY.md §2.2–§2.4) over the harness
  * testdata. Each query has a DuckDB oracle in [[oracle]]; aliases match
  * column-for-column (the driver sorts columns by name before hashing), and
  * every query ends with a deterministic ORDER BY whose suffix is a unique
  * key, so row-order-sensitive hashing also matches.
  *
  * Scale notes are inline per query — these run at sf0.1 locally but are
  * written for a 1000-executor / 100 TB deployment: broadcast the dim side,
  * keep aggregates partial (map-side combine), let filters reach the scan.
  */
object Relational {
  import OP._

  // ---------------------------------------------------------------- q1_agg
  /** TPC-H Q1-style pricing summary. SURVEY §2.4 A3/A4 (grouped SUM+AVG,
    * ROUND), §2.2 P5 (pushed-down date filter). Low-cardinality group-by =
    * one shuffle of tiny partial aggregates regardless of input size. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumExact($"l_quantity").as("sum_qty"),
        sumExact($"l_extendedprice").as("sum_base_price"),
        sum(discounted($"l_extendedprice", $"l_discount"))
          .cast(DoubleType).as("sum_disc_price"),
        avgExact($"l_quantity").as("avg_qty"),
        avgExact($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------ q_filter_project
  /** SURVEY §2.2 P1/P2/P5: projection + rename + predicate. Both the filter
    * and the 3-column projection reach the parquet scan (PushedFilters /
    * ReadSchema in explain) — the scan never materializes unused columns. */
  def qFilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .filter($"p_size" >= 30 && $"p_brand" === "Brand#1")
      .select(
        $"p_partkey".as("part_id"),
        $"p_name".as("part_name"),
        $"p_retailprice".cast(DecimalType(12, 2)).cast(DoubleType)
          .as("retail_price"))
      .orderBy($"part_id")
  }

  private val qFilterProjectSql =
    """SELECT p_partkey AS part_id, p_name AS part_name,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retail_price
      |FROM part WHERE p_size >= 30 AND p_brand = 'Brand#1'
      |ORDER BY part_id""".stripMargin

  // -------------------------------------------------------- q_derived_flag
  /** SURVEY §2.2 P3: derived boolean column (is_refund analogue) kept
    * row-level, like stg_finance_expense's `is_refund = amount < 0`. */
  def qDerivedFlag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id",
        $"event_type",
        OP.dec2($"value").cast(DoubleType).as("value"),
        ($"value" < 50.0).as("is_small"),
        ($"event_type" === "error").as("is_error"))
      .orderBy($"event_id")
  }

  private val qDerivedFlagSql =
    """SELECT event_id, event_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |  value < 50.0 AS is_small,
      |  event_type = 'error' AS is_error
      |FROM events ORDER BY event_id""".stripMargin

  // --------------------------------------------------------- q_join_enrich
  /** SURVEY §2.3 J7 + §2.8 coalesce: left-join FK enrichment keeping
    * unmatched rows with a default — the dbt fact pattern. Customer is the
    * dim side → broadcast; no shuffle of the big (orders) side. */
  def qJoinEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    // deliberately shrunken dim so some FKs miss (exercises null handling)
    val custDim = Tables.customer(s, dir)
      .filter($"c_acctbal" > 0)
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    orders
      .join(broadcast(custDim), $"o_custkey" === custDim("c_custkey"), "left")
      .select(
        $"o_orderkey",
        $"o_custkey",
        coalesce($"c_name", lit("UNKNOWN")).as("customer_name"),
        coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"),
        OP.dec2($"o_totalprice").cast(DoubleType).as("total_price"))
      .orderBy($"o_orderkey")
  }

  private val qJoinEnrichSql =
    """SELECT o_orderkey, o_custkey,
      |  COALESCE(c.c_name, 'UNKNOWN') AS customer_name,
      |  COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
      |FROM orders o
      |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
      |  ON o.o_custkey = c.c_custkey
      |ORDER BY o_orderkey""".stripMargin

  // ----------------------------------------------------------- q_star_join
  /** SURVEY §2.3 J2: 4-way star join (fact ⋈ dims), the KPI-view shape.
    * All dims broadcast → the lineitem scan is never shuffled for the join;
    * the only exchange is the final group-by. At 100 TB: identical plan —
    * dims stay broadcast-able by definition. */
  def qStarJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name".as("region_name"), year($"o_orderdate").as("order_year"))
      .agg(
        sum(discounted($"l_extendedprice", $"l_discount"))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"region_name", $"order_year")
  }

  private val qStarJoinSql =
    """SELECT r_name AS region_name, year(o_orderdate) AS order_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, year(o_orderdate)
      |ORDER BY region_name, order_year""".stripMargin

  // ----------------------------------------------------------- q_anti_join
  /** SURVEY §2.3 J5 (NOT IN → left_anti): customers with no pending ('P')
    * order. left_anti broadcasts the smaller build side under AQE. */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pending = Tables.orders(s, dir).filter($"o_orderstatus" === "P")
      .select($"o_custkey")
    Tables.customer(s, dir)
      .join(pending, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val qAntiJoinSql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_orderstatus = 'P' AND o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ----------------------------------------------------------- q_semi_join
  /** SURVEY §2.3 (EXISTS → left_semi): customers with at least one
    * high-value order. Semi-join never duplicates the probe side. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.orders(s, dir).filter($"o_totalprice" > 400000.0)
      .select($"o_custkey")
    Tables.customer(s, dir)
      .join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val qSemiJoinSql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_totalprice > 400000.0 AND o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------- q_fk_miss_log
  /** SURVEY §2.3 J4 + §2.9: the FK-miss DQ pattern — fact rows whose key is
    * absent from the (filtered) dimension are logged, not dropped. Mirrors
    * TL_combine.sql:141-153's unmatched-employee logging. */
  def qFkMissLog(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val smallParts = Tables.part(s, dir).filter($"p_size" < 45)
      .select($"p_partkey")
    Tables.lineitem(s, dir)
      .join(broadcast(smallParts), $"l_partkey" === $"p_partkey", "left_anti")
      .groupBy($"l_partkey".as("missing_partkey"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy($"missing_partkey")
  }

  private val qFkMissLogSql =
    """SELECT l_partkey AS missing_partkey, COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE NOT EXISTS (SELECT 1 FROM part
      |                  WHERE p_size < 45 AND p_partkey = l_partkey)
      |GROUP BY l_partkey
      |ORDER BY missing_partkey""".stripMargin

  // ------------------------------------------------------ q_count_distinct
  /** SURVEY §2.4 A2: exact COUNT(DISTINCT) per month — the KPI headcount
    * shape. Exact distinct = 2-phase shuffle; at 100 TB switch the KPI tier
    * to approx_count_distinct unless an oracle requires exactness. */
  def qCountDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(
        year($"o_orderdate").as("order_year"),
        month($"o_orderdate").as("order_month"))
      .agg(
        countDistinct($"o_custkey").as("active_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy($"order_year", $"order_month")
  }

  private val qCountDistinctSql =
    """SELECT year(o_orderdate) AS order_year, month(o_orderdate) AS order_month,
      |  COUNT(DISTINCT o_custkey) AS active_customers, COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY order_year, order_month""".stripMargin

  // --------------------------------------------------------- q_group_mean
  /** SURVEY §2.4 A1: 2-decimal-rounded group mean (the ops downtime
    * imputation source aggregate, C2_ops_etl.py:63-70). */
  def qGroupMean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        round(sum(OP.dec2($"value")).cast(DoubleType) / count($"value"), 2)
          .as("avg_value"),
        sumExact($"value").as("total_value"))
      .orderBy($"event_type")
  }

  private val qGroupMeanSql =
    """SELECT event_type,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value), 2) AS avg_value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -------------------------------------------------------- q_global_stats
  /** SURVEY §2.4 A5: scalar audit counts (rows_processed-style) in one pass. */
  def qGlobalStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"),
        sumExact($"l_quantity").as("total_qty"))
  }

  private val qGlobalStatsSql =
    """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem""".stripMargin

  // ----------------------------------------------------- q_hwm_incremental
  /** SURVEY §2.4 A6 + §2.1 S8: incremental high-watermark load — only rows
    * newer than max(existing date) - 90 days. The scalar max is a 1-row
    * aggregate cross-joined in (Catalyst broadcasts it); with date-
    * partitioned facts this filter becomes partition pruning for free.
    *
    * NOTE (r1 verdict item 5): this query is the ALGEBRA demo only — the
    * max-aggregate here is a full fact scan per batch. The shipped
    * incremental-loader design is [[graft.warehouse.Incremental]], which
    * reads the watermark from a tiny state table and bounds the dedup
    * anti-join to the partition tail. */
  def qHwmIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val hwm = orders.agg((max($"o_orderdate") - expr("INTERVAL 90 DAYS")).as("hwm"))
    orders.crossJoin(broadcast(hwm))
      .filter($"o_orderdate" > $"hwm")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), sumExact($"o_totalprice").as("total_price"))
      .orderBy($"o_orderstatus")
  }

  private val qHwmIncrementalSql =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_orderdate > (SELECT MAX(o_orderdate) - INTERVAL 90 DAY FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // --------------------------------------------------------- q_dedup_exact
  /** SURVEY §2.4 A7: DISTINCT projection (dim-values extraction, the
    * `SELECT DISTINCT name` dim-upsert source). */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderstatus", $"o_orderpriority")
      .distinct()
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  private val qDedupExactSql =
    """SELECT DISTINCT o_orderstatus, o_orderpriority
      |FROM orders ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ------------------------------------------------------ q_fact_antidedup
  /** SURVEY §2.3 J6 + §2.1 S8: append-dedup — candidate batch anti-joined
    * against already-loaded facts on the full key (the NOT EXISTS insert
    * guard, TL_combine.sql:189-203). */
  def qFactAntidedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val existing = li.filter($"l_shipdate" < lit("1998-01-01").cast(TimestampType))
      .select($"l_orderkey", $"l_linenumber")
    val candidates = li.filter($"l_shipdate" < lit("1999-01-01").cast(TimestampType))
    candidates
      .join(existing, Seq("l_orderkey", "l_linenumber"), "left_anti")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_new_rows"), sumExact($"l_quantity").as("qty"))
      .orderBy($"l_returnflag")
  }

  private val qFactAntidedupSql =
    """WITH existing AS (
      |  SELECT l_orderkey, l_linenumber FROM lineitem
      |  WHERE l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
      |candidates AS (
      |  SELECT * FROM lineitem
      |  WHERE l_shipdate < TIMESTAMP '1999-01-01 00:00:00')
      |SELECT c.l_returnflag, COUNT(*) AS n_new_rows,
      |  CAST(SUM(CAST(c.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM candidates c
      |WHERE NOT EXISTS (SELECT 1 FROM existing e
      |                  WHERE e.l_orderkey = c.l_orderkey
      |                    AND e.l_linenumber = c.l_linenumber)
      |GROUP BY c.l_returnflag ORDER BY c.l_returnflag""".stripMargin

  // --------------------------------------------------------- q_salted_join
  /** The skew-salted join (core.Skew.saltedJoin) under the correctness
    * gate: lineitem⋈supplier on the salted composite key (l_suppkey, salt),
    * aggregated to revenue per supplier nation. The oracle is the PLAIN
    * join + groupBy — proving salting is a pure physical rewrite: the hot
    * key's rows spread over `factor` tasks, the answer is bit-identical
    * (decimal-exact revenue, so even the sums can't drift). ScaleSpec
    * already asserts the mechanics on a manufactured hot key; this makes
    * the equivalence a driver-checked fact on real tables. */
  def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Tables.supplier(s, dir)
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    val joined = graft.core.Skew.saltedJoin(
      Tables.lineitem(s, dir)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice"),
      dim, "l_suppkey", factor = 8,
      saltFrom = Seq($"l_orderkey", $"l_linenumber"))
    joined.groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        graft.core.OracleParity.sumExact($"l_extendedprice").as("revenue"))
      .orderBy($"s_nationkey")
  }

  private val qSaltedJoinSql =
    """SELECT s_nationkey, count(*) AS n_rows,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------- q_full_outer
  /** FULL OUTER join as cohort churn: per-customer order counts in 1996 vs
    * 1998, joined full-outer on the customer key — "churned" (left only),
    * "new" (right only), "retained" (both). The join type the rest of the
    * suite never needed, exercised on the analysis shape it actually
    * serves; both sides are pre-aggregated to one row per key, so the full
    * outer join is key-to-key (no row explosion) and AQE-sizable. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def cohort(y: Int, as: String) = Tables.orders(s, dir)
      .filter(year($"o_orderdate") === y)
      .groupBy($"o_custkey").agg(count(lit(1)).as(as))
    cohort(1996, "n96").join(cohort(1998, "n98"), Seq("o_custkey"), "full_outer")
      .select($"o_custkey",
        coalesce($"n96", lit(0L)).as("n96"),
        coalesce($"n98", lit(0L)).as("n98"),
        when($"n96".isNotNull && $"n98".isNotNull, "retained")
          .when($"n96".isNotNull, "churned").otherwise("new").as("status"))
      .orderBy($"o_custkey")
  }

  private val qFullOuterSql =
    """SELECT o_custkey,
      |  coalesce(n96, 0) AS n96, coalesce(n98, 0) AS n98,
      |  CASE WHEN n96 IS NOT NULL AND n98 IS NOT NULL THEN 'retained'
      |       WHEN n96 IS NOT NULL THEN 'churned' ELSE 'new' END AS status
      |FROM (SELECT o_custkey, count(*) AS n96 FROM orders
      |      WHERE year(o_orderdate) = 1996 GROUP BY 1) a
      |FULL OUTER JOIN
      |     (SELECT o_custkey, count(*) AS n98 FROM orders
      |      WHERE year(o_orderdate) = 1998 GROUP BY 1) b
      |USING (o_custkey)
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------- q_salted_agg
  /** Skew.saltedSumCount under the gate: the two-phase (key, salt) partial
    * → key final aggregation, fed an exact-decimal measure so the partials
    * form a true monoid and the result is bit-identical to the oracle's
    * one-phase GROUP BY regardless of how the salt spread the rows. */
  def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = Tables.lineitem(s, dir)
      .select($"l_returnflag",
        $"l_quantity".cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .as("qty"))
    graft.core.Skew.saltedSumCount(exact, "l_returnflag", "qty", factor = 8)
      .select($"l_returnflag", $"sum_value".cast("double").as("sum_qty"), $"n")
      .orderBy($"l_returnflag")
  }

  private val qSaltedAggSql =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(l_quantity) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (q1Agg _),
    "q_filter_project"  -> (qFilterProject _),
    "q_derived_flag"    -> (qDerivedFlag _),
    "q_join_enrich"     -> (qJoinEnrich _),
    "q_star_join"       -> (qStarJoin _),
    "q_anti_join"       -> (qAntiJoin _),
    "q_semi_join"       -> (qSemiJoin _),
    "q_fk_miss_log"     -> (qFkMissLog _),
    "q_count_distinct"  -> (qCountDistinct _),
    "q_group_mean"      -> (qGroupMean _),
    "q_global_stats"    -> (qGlobalStats _),
    "q_hwm_incremental" -> (qHwmIncremental _),
    "q_dedup_exact"     -> (qDedupExact _),
    "q_fact_antidedup"  -> (qFactAntidedup _),
    "q_salted_join"     -> (qSaltedJoin _),
    "q_full_outer"      -> (qFullOuter _),
    "q_salted_agg"      -> (qSaltedAgg _))

  val oracle: Map[String, String] = Map(
    "q1_agg"            -> q1AggSql,
    "q_filter_project"  -> qFilterProjectSql,
    "q_derived_flag"    -> qDerivedFlagSql,
    "q_join_enrich"     -> qJoinEnrichSql,
    "q_star_join"       -> qStarJoinSql,
    "q_anti_join"       -> qAntiJoinSql,
    "q_semi_join"       -> qSemiJoinSql,
    "q_fk_miss_log"     -> qFkMissLogSql,
    "q_count_distinct"  -> qCountDistinctSql,
    "q_group_mean"      -> qGroupMeanSql,
    "q_global_stats"    -> qGlobalStatsSql,
    "q_hwm_incremental" -> qHwmIncrementalSql,
    "q_dedup_exact"     -> qDedupExactSql,
    "q_fact_antidedup"  -> qFactAntidedupSql,
    "q_salted_join"     -> qSaltedJoinSql,
    "q_full_outer"      -> qFullOuterSql,
    "q_salted_agg"      -> qSaltedAggSql)
}
