package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{OracleParity => OP, Tables}

/** Distribution statistics beyond first moments — the profiling trio a
  * warehouse user runs before trusting a column: equi-width histograms,
  * σ-threshold outlier detection, and per-group least-squares trends. The
  * reference's statistical surface stops at AVG/SUM/COUNT
  * (/root/reference/04_KPI/KPIs.sql); these close the family.
  *
  * Determinism discipline (same as OracleParity everywhere else): every
  * aggregate is an exact integer/decimal sum; doubles appear only in final
  * projections computed with IDENTICAL parenthesization on both engines, so
  * IEEE correct rounding makes the results bit-equal. No stddev()/var()
  * built-ins anywhere — their float accumulation is shuffle-order-dependent.
  */
object Stats {

  // ------------------------------------------------------------ q_histogram
  /** Equi-width histogram of order totals: 50k-wide bins via exact integer
    * cents division (both engines truncate non-negative division the same
    * way). One map + one aggregation on a ~dozen-key groupBy — at 100 TB
    * this is parquet-scan speed with a map-side-combined shuffle of
    * O(bins) rows per partition. */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select((OP.dec2($"o_totalprice") * 100).cast("long").as("cents"),
        OP.dec2($"o_totalprice").as("p"))
      .withColumn("bin", expr("cents div 5000000").cast("int"))
      .groupBy($"bin")
      .agg(
        count(lit(1)).as("n_orders"),
        min($"p").cast("double").as("min_price"),
        max($"p").cast("double").as("max_price"),
        sum($"p").cast("double").as("sum_price"))
      .withColumn("bin_lo", ($"bin" * 50000L).cast("double"))
      .select($"bin", $"bin_lo", $"n_orders", $"min_price", $"max_price", $"sum_price")
      .orderBy($"bin")
  }

  private val qHistogramSql =
    """WITH b AS (
      |  SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |           // 5000000 AS INT) AS bin,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS p
      |  FROM orders)
      |SELECT bin, CAST(bin * 50000 AS DOUBLE) AS bin_lo,
      |  count(*) AS n_orders,
      |  CAST(min(p) AS DOUBLE) AS min_price,
      |  CAST(max(p) AS DOUBLE) AS max_price,
      |  CAST(sum(p) AS DOUBLE) AS sum_price
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  // ------------------------------------------------------------- q_outliers
  /** 3σ outlier rows per event type, with EXACT group moments: n, Σx, Σx²
    * are integer-cents sums (decimal on the Spark side, HUGEINT in the
    * oracle — both exact), and the z² test
    * `(n·x − Σx)² / (n·Σx² − (Σx)²) > 9` is evaluated in double from those
    * exact inputs with explicit parenthesization, so both engines compare
    * bit-identical values. The group-stats table is O(event types) and
    * broadcast back over the scan — two passes over the fact, no window,
    * no per-group sort; the shape survives 100 TB unchanged. */
  def qOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"event_id", $"event_type",
        (OP.dec2($"value") * 100).cast(DecimalType(38, 0)).as("xc"))
    val stats = ev.groupBy($"event_type")
      .agg(count(lit(1)).cast("double").as("n_d"),
        sum($"xc").cast("double").as("s_d"),
        sum($"xc" * $"xc").cast("double").as("q_d"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("x_d", $"xc".cast("double"))
      .withColumn("z2",
        (($"n_d" * $"x_d" - $"s_d") * ($"n_d" * $"x_d" - $"s_d")) /
          ($"n_d" * $"q_d" - $"s_d" * $"s_d"))
      .filter($"z2" > 9.0d)
      .select($"event_type", $"event_id",
        ($"x_d" / 100.0d).as("value"), round($"z2", 4).as("z2"))
      .orderBy($"event_type", $"event_id")
  }

  private val qOutliersSql =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
      |      AS xc
      |  FROM events),
      |g AS (
      |  SELECT event_type,
      |    CAST(count(*) AS DOUBLE) AS n_d,
      |    CAST(sum(xc) AS DOUBLE) AS s_d,
      |    CAST(sum(xc * xc) AS DOUBLE) AS q_d
      |  FROM ev GROUP BY event_type)
      |SELECT e.event_type, e.event_id,
      |  CAST(e.xc AS DOUBLE) / 100.0 AS value,
      |  round(((n_d * CAST(e.xc AS DOUBLE) - s_d)
      |         * (n_d * CAST(e.xc AS DOUBLE) - s_d))
      |        / (n_d * q_d - s_d * s_d), 4) AS z2
      |FROM ev e JOIN g USING (event_type)
      |WHERE ((n_d * CAST(e.xc AS DOUBLE) - s_d)
      |       * (n_d * CAST(e.xc AS DOUBLE) - s_d))
      |      / (n_d * q_d - s_d * s_d) > 9.0
      |ORDER BY event_type, event_id""".stripMargin

  // --------------------------------------------------------------- q_linreg
  /** Per-group least-squares fit of extended price on quantity from the
    * five closed-form sums (n, Σx, Σy, Σx², Σxy), each an exact decimal
    * aggregate; slope/intercept are then single double expressions over the
    * exact sums — the distributed regression that needs ONE map-side-
    * combinable aggregation and no iteration. `regr_slope` built-ins are
    * avoided for the same reason as stddev: float accumulators. */
  def qLinreg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_returnflag",
        OP.dec2($"l_quantity").as("x"), OP.dec2($"l_extendedprice").as("y"))
    li.groupBy($"l_returnflag")
      .agg(count(lit(1)).cast("double").as("n_d"),
        sum($"x").cast("double").as("sx"),
        sum($"y").cast("double").as("sy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"x" * $"y").cast("double").as("sxy"))
      .withColumn("slope",
        ($"n_d" * $"sxy" - $"sx" * $"sy") / ($"n_d" * $"sxx" - $"sx" * $"sx"))
      .select($"l_returnflag",
        $"n_d".cast("long").as("n"),
        round($"slope", 6).as("slope"),
        round(($"sy" - $"slope" * $"sx") / $"n_d", 6).as("intercept"))
      .orderBy($"l_returnflag")
  }

  private val qLinregSql =
    """WITH li AS (
      |  SELECT l_returnflag,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS x,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |  FROM lineitem),
      |g AS (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n_d,
      |    CAST(sum(x) AS DOUBLE) AS sx,
      |    CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * x) AS DOUBLE) AS sxx,
      |    CAST(sum(x * y) AS DOUBLE) AS sxy
      |  FROM li GROUP BY l_returnflag),
      |sl AS (
      |  SELECT *, (n_d * sxy - sx * sy) / (n_d * sxx - sx * sx) AS slope
      |  FROM g)
      |SELECT l_returnflag, CAST(n_d AS BIGINT) AS n,
      |  round(slope, 6) AS slope,
      |  round((sy - slope * sx) / n_d, 6) AS intercept
      |FROM sl ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_histogram" -> (qHistogram _),
    "q_outliers"  -> (qOutliers _),
    "q_linreg"    -> (qLinreg _))

  val oracle: Map[String, String] = Map(
    "q_histogram" -> qHistogramSql,
    "q_outliers"  -> qOutliersSql,
    "q_linreg"    -> qLinregSql)
}
