package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.core.{OracleParity => OP, Tables}

/** General-analytics surface beyond the reference's own checklist — the
  * operations a user of a complete engine reaches for next: ranking
  * windows, ROLLUP subtotals, pivot, sessionization, JSON extraction.
  * Same determinism discipline as everywhere else: total sort keys inside
  * every window, decimal-exact measures, integer session ids.
  */
object Analytics {

  // ---------------------------------------------------------- q_window_ranks
  /** Ranking-window family: dense_rank / percent_rank / ntile / first_value
    * over each customer's orders by price. Sort key (price, orderkey) is
    * total, so every rank is engine-independent; percent_rank's
    * (rank-1)/(n-1) divides the same ints on both sides. */
  def qWindowRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(OP.dec2($"o_totalprice"), $"o_orderkey")
    Tables.orders(s, dir)
      .select(
        $"o_custkey", $"o_orderkey",
        OP.dec2($"o_totalprice").cast("double").as("total_price"),
        dense_rank().over(w).as("price_rank"),
        percent_rank().over(w).as("price_pct"),
        ntile(4).over(w).as("price_quartile"),
        first_value($"o_orderkey").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cheapest_orderkey"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val qWindowRanksSql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
      |  CAST(DENSE_RANK() OVER w AS INT) AS price_rank,
      |  PERCENT_RANK() OVER w AS price_pct,
      |  CAST(NTILE(4) OVER w AS INT) AS price_quartile,
      |  FIRST_VALUE(o_orderkey) OVER (
      |    PARTITION BY o_custkey
      |    ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS cheapest_orderkey
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------------------------------------- q_rollup
  /** ROLLUP subtotals over (returnflag, linestatus) with GROUPING markers.
    * Subtotal rows carry null keys, so the presentation sort coalesces
    * them — engine null-ordering defaults (Spark NULLS FIRST vs DuckDB
    * NULLS LAST) never get a say. */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        // grouping() must live inside the agg of the rollup node
        grouping($"l_returnflag").cast(IntegerType).as("g_flag"),
        grouping($"l_linestatus").cast(IntegerType).as("g_status"),
        OP.sumExact($"l_quantity").as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        $"l_returnflag", $"l_linestatus",
        $"g_flag", $"g_status", $"sum_qty", $"n_rows")
      .orderBy($"g_flag", $"g_status",
        coalesce($"l_returnflag", lit("")), coalesce($"l_linestatus", lit("")))
  }

  private val qRollupSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status,
      |  COALESCE(l_returnflag, ''), COALESCE(l_linestatus, '')""".stripMargin

  // ---------------------------------------------------------------- q_pivot
  /** Pivot: order value by year × status as columns (explicit value list —
    * required at scale anyway: implicit pivot collects distinct values to
    * the driver). The oracle is the equivalent conditional-aggregation
    * form, which is exactly what Catalyst lowers pivot to. */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("order_year"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(OP.sumExact($"o_totalprice"))
      .withColumnRenamed("O", "open_total")
      .withColumnRenamed("F", "filled_total")
      .withColumnRenamed("P", "partial_total")
      .orderBy($"order_year")
  }

  private val qPivotSql =
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS filled_total,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS partial_total
      |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin

  // ------------------------------------------------------------ q_sessionize
  /** Sessionization: a new session starts after a >30-minute silence per
    * user; session ids are a running sum of boundary flags — exact integer
    * arithmetic over the (ts, event_id) total order, one shuffle on
    * user_id. The event-stream shape every behavioral pipeline needs. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(byUser)
    Tables.events(s, dir)
      .withColumn("is_new_session",
        (gapUs.isNull || (gapUs > 1800L * 1000000L)).cast(IntegerType))
      .withColumn("session_id",
        sum($"is_new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(IntegerType))
      .select($"user_id", $"event_id", $"is_new_session", $"session_id")
      .orderBy($"user_id", $"event_id")
  }

  private val qSessionizeSql =
    """WITH evts AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, event_id,
      |    CAST((prev_us IS NULL OR (us - prev_us) > 1800000000) AS INT)
      |      AS is_new_session,
      |    ts, event_id AS eid
      |  FROM (
      |    SELECT *, epoch_us(ts) AS us,
      |      LAG(epoch_us(ts), 1) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |    FROM evts))
      |SELECT user_id, event_id, is_new_session,
      |  CAST(SUM(is_new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts, eid
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
      |    AS session_id
      |FROM flagged
      |ORDER BY user_id, event_id""".stripMargin

  // ----------------------------------------------------------- q_json_extract
  /** JSON path extraction from the events props column (valid JSON in the
    * testdata): typed scalar pull-out + null on absent path — the
    * semi-structured access pattern (get_json_object stays codegen'd). */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select(
        $"event_id",
        get_json_object($"props", "$.k").cast(IntegerType).as("k"),
        get_json_object($"props", "$.missing").as("missing_path"))
      .orderBy($"event_id")
  }

  private val qJsonExtractSql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  json_extract_string(props, '$.missing') AS missing_path
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_ranks" -> (qWindowRanks _),
    "q_rollup"       -> (qRollup _),
    "q_pivot"        -> (qPivot _),
    "q_sessionize"   -> (qSessionize _),
    "q_json_extract" -> (qJsonExtract _))

  val oracle: Map[String, String] = Map(
    "q_window_ranks" -> qWindowRanksSql,
    "q_rollup"       -> qRollupSql,
    "q_pivot"        -> qPivotSql,
    "q_sessionize"   -> qSessionizeSql,
    "q_json_extract" -> qJsonExtractSql)
}
