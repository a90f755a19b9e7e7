package graft.kpi

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.core.{OracleParity => OP, Tables}

/** The KPI view layer — all 8 views of /root/reference/04_KPI/KPIs.sql:3-110
  * re-expressed as DataFrame builders over a star derived from the harness
  * testdata (orders→fact_employee-ish snapshots, lineitem→fact_expenses,
  * events→fact_downtime, customer/nation→employee/department dims,
  * generated dim_time).
  *
  * Join strategy (SURVEY §2.3): every fact↔dim join broadcasts the dim;
  * the one fact↔fact join (lineitem⋈orders) shuffles on the order key —
  * co-bucketing both on orderkey is the at-scale swap-in. The date-equality
  * join to dim_time (J3, TL_combine.sql:95-96,185-186) keeps the
  * reference's silent-drop semantics: dates outside the dimension range
  * drop from the view.
  *
  * The reference's avg-salary view has no ORDER BY (KPIs.sql:31-40); a
  * deterministic sort is added here because unordered views cannot be
  * hash-verified (documented divergence).
  */
object Kpi {

  /** dim_time covering the fact date range (reference generate_series,
    * combined_dw_schema.sql:39-48; 1995-2001 spans the testdata orders). */
  def dimTime(s: SparkSession): DataFrame =
    s.range(1).select(explode(sequence(
        lit(java.sql.Date.valueOf("1995-01-01")),
        lit(java.sql.Date.valueOf("2001-12-31")),
        expr("interval 1 day"))).as("full_date"))
      .select(
        col("full_date"),
        dayofmonth(col("full_date")).as("day"),
        month(col("full_date")).as("month"),
        quarter(col("full_date")).as("quarter"),
        year(col("full_date")).as("year"),
        dayofweek(col("full_date")).isin(1, 7).as("is_weekend"))
      .withColumn("time_id",
        row_number().over(Window.orderBy(col("full_date"))))

  // 1. vw_kpi_monthly_headcount (KPIs.sql:3-13): COUNT(DISTINCT) of active
  // employees per date, via the J3 date-equality join to dim_time.
  def headcount(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      .join(broadcast(dimTime(s)),
        col("o_orderdate").cast(DateType) === col("full_date"))
      .groupBy(col("year"), col("month"), col("day"))
      .agg(countDistinct(col("o_custkey")).as("headcount"))
      .orderBy(col("year"), col("month"), col("day"))

  // 2. vw_kpi_monthly_resignations (KPIs.sql:17-27): same shape, the
  // terminal-status filter.
  def resignations(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .join(broadcast(dimTime(s)),
        col("o_orderdate").cast(DateType) === col("full_date"))
      .groupBy(col("year"), col("month"), col("day"))
      .agg(countDistinct(col("o_custkey")).as("resignations"))
      .orderBy(col("year"), col("month"), col("day"))

  // 3. vw_kpi_avg_salary_by_gender (KPIs.sql:31-40): grouped mean over the
  // current dim rows; deterministic ORDER BY added (see scaladoc).
  def avgSalaryByGender(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(
        OP.avgExact(col("c_acctbal"), 2).as("avg_balance"),
        count(lit(1)).as("n_members"))
      .orderBy(col("segment"))

  // 4. vw_kpi_gross_monthly_expenses_by_dept (KPIs.sql:43-57): 4-way star.
  def grossMonthlyExpensesByDept(s: SparkSession, dir: String): DataFrame =
    expensesByDept(s, dir, netOnly = false)

  // 5. vw_kpi_net_monthly_expenses_by_dept (KPIs.sql:61-74): refunds out.
  def netMonthlyExpensesByDept(s: SparkSession, dir: String): DataFrame =
    expensesByDept(s, dir, netOnly = true)

  private def expensesByDept(s: SparkSession, dir: String, netOnly: Boolean): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val filtered = if (netOnly) li.filter(col("l_returnflag") =!= "R") else li
    filtered
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(year(col("o_orderdate")).as("year"),
        month(col("o_orderdate")).as("month"), col("n_name").as("department"))
      .agg(round(OP.sumExact(col("l_extendedprice")), 2).as("total_amount"))
      .orderBy(col("year"), col("month"), col("department"))
  }

  // 6. vw_kpi_expenses_net_vs_gross by type (KPIs.sql:77-88 shape): gross
  // and refund-excluded net side by side.
  def netVsGrossByType(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_linestatus").as("line_status"))
      .agg(
        round(OP.sumExact(col("l_extendedprice")), 2).as("gross_amount"),
        round(sum(when(col("l_returnflag") =!= "R",
          OP.dec2(col("l_extendedprice")))).cast("double"), 2).as("net_amount"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("line_status"))

  // 7. vw_kpi_downtime_by_process (KPIs.sql:91-99): sum+avg, DESC order.
  def downtimeByProcess(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type").as("process"))
      .agg(
        round(OP.sumExact(col("value")), 2).as("total_downtime"),
        OP.avgExact(col("value"), 2).as("avg_downtime"))
      .orderBy(col("total_downtime").desc, col("process"))

  // 8. vw_kpi_downtime_by_dept (KPIs.sql:102-110): join up to the
  // department dim, sum+avg, DESC order.
  def downtimeByDept(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("department"))
      .agg(
        round(OP.sumExact(col("value")), 2).as("total_downtime"),
        OP.avgExact(col("value"), 2).as("avg_downtime"))
      .orderBy(col("total_downtime").desc, col("department"))

  private[graft] val builders: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "vw_kpi_monthly_headcount" -> (headcount _),
    "vw_kpi_monthly_resignations" -> (resignations _),
    "vw_kpi_avg_salary_by_gender" -> (avgSalaryByGender _),
    "vw_kpi_gross_monthly_expenses_by_dept" -> (grossMonthlyExpensesByDept _),
    "vw_kpi_net_monthly_expenses_by_dept" -> (netMonthlyExpensesByDept _),
    "vw_kpi_expenses_net_vs_gross" -> (netVsGrossByType _),
    "vw_kpi_downtime_by_process" -> (downtimeByProcess _),
    "vw_kpi_downtime_by_dept" -> (downtimeByDept _))

  /** S7 view sink: register all 8 KPI views in the session catalog so
    * `spark.sql("SELECT * FROM vw_kpi_…")` works (KPIs.sql CREATE VIEW). */
  def registerAll(s: SparkSession, dir: String): Seq[String] =
    builders.map { case (name, b) =>
      b(s, dir).createOrReplaceTempView(name); name
    }

  // ------------------------------------------------ oracle-checked entries
  private val qKpiHeadcountSql =
    """WITH dt AS (
      |  SELECT CAST(d AS DATE) AS full_date
      |  FROM generate_series(DATE '1995-01-01', DATE '2001-12-31',
      |                       INTERVAL 1 DAY) t(d))
      |SELECT CAST(year(full_date) AS INT) AS year,
      |  CAST(month(full_date) AS INT) AS month,
      |  CAST(day(full_date) AS INT) AS day,
      |  count(DISTINCT o_custkey) AS headcount
      |FROM orders JOIN dt ON CAST(o_orderdate AS DATE) = full_date
      |WHERE o_orderstatus = 'O'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  private val qKpiResignationsSql =
    """WITH dt AS (
      |  SELECT CAST(d AS DATE) AS full_date
      |  FROM generate_series(DATE '1995-01-01', DATE '2001-12-31',
      |                       INTERVAL 1 DAY) t(d))
      |SELECT CAST(year(full_date) AS INT) AS year,
      |  CAST(month(full_date) AS INT) AS month,
      |  CAST(day(full_date) AS INT) AS day,
      |  count(DISTINCT o_custkey) AS resignations
      |FROM orders JOIN dt ON CAST(o_orderdate AS DATE) = full_date
      |WHERE o_orderstatus = 'F'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Shared SQL for the gross/net expense views; net excludes refunds
    * (l_returnflag = 'R' plays KPIs.sql:56's is_refund). */
  private def qKpiExpensesSql(netOnly: Boolean): String = {
    val where = if (netOnly) "WHERE l_returnflag <> 'R'\n" else ""
    s"""SELECT CAST(year(o_orderdate) AS INT) AS year,
       |  CAST(month(o_orderdate) AS INT) AS month,
       |  n_name AS department,
       |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
       |    AS total_amount
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |${where}GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  private val qKpiDowntimeByProcessSql =
    """SELECT event_type AS process,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
      |    AS total_downtime,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |    / COUNT(value), 2) AS avg_downtime
      |FROM events
      |GROUP BY 1 ORDER BY total_downtime DESC, process""".stripMargin

  private val qKpiSalaryByGenderSql =
    """SELECT c_mktsegment AS segment,
      |  round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |    / COUNT(c_acctbal), 2) AS avg_balance,
      |  count(*) AS n_members
      |FROM customer GROUP BY 1 ORDER BY segment""".stripMargin

  private val qKpiNetVsGrossSql =
    """SELECT l_linestatus AS line_status,
      |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
      |    AS gross_amount,
      |  round(CAST(SUM(CASE WHEN l_returnflag <> 'R'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 2)
      |    AS net_amount,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY 1 ORDER BY line_status""".stripMargin

  private val qKpiDowntimeByDeptSql =
    """SELECT n_name AS department,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
      |    AS total_downtime,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |    / COUNT(value), 2) AS avg_downtime
      |FROM events
      |JOIN customer ON user_id = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY total_downtime DESC, department""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kpi_headcount"           -> (headcount _),
    "q_kpi_resignations"        -> (resignations _),
    "q_kpi_salary_by_gender"    -> (avgSalaryByGender _),
    "q_kpi_gross_expenses"      -> (grossMonthlyExpensesByDept _),
    "q_kpi_net_expenses"        -> (netMonthlyExpensesByDept _),
    "q_kpi_net_vs_gross"        -> (netVsGrossByType _),
    "q_kpi_downtime_by_process" -> (downtimeByProcess _),
    "q_kpi_downtime_by_dept"    -> (downtimeByDept _))

  val oracle: Map[String, String] = Map(
    "q_kpi_headcount"           -> qKpiHeadcountSql,
    "q_kpi_resignations"        -> qKpiResignationsSql,
    "q_kpi_salary_by_gender"    -> qKpiSalaryByGenderSql,
    "q_kpi_gross_expenses"      -> qKpiExpensesSql(netOnly = false),
    "q_kpi_net_expenses"        -> qKpiExpensesSql(netOnly = true),
    "q_kpi_net_vs_gross"        -> qKpiNetVsGrossSql,
    "q_kpi_downtime_by_process" -> qKpiDowntimeByProcessSql,
    "q_kpi_downtime_by_dept"    -> qKpiDowntimeByDeptSql)
}
