package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{OracleParity => OP, Tables}

/** Per-entity event-sequence repair — the two operators every CDC/telemetry
  * feed needs before analytics can trust it: carry-forward imputation of
  * sparse measures, and last-writer-wins changelog compaction (the MERGE
  * semantics of a lakehouse CDC apply, re-expressed as one keyed window).
  * The reference's nearest kin is the incremental unique-key fact load
  * (/root/reference/05_dbt_implementation/dbt_warehouse_project/models/facts/fact_expenses.sql:3-8) —
  * append-only, no updates or deletes; these close the U/D half.
  *
  * Both are ONE shuffle on the entity key; the per-key window sorts
  * event-time sequences that are bounded per entity, so the shape is
  * unchanged at 100 TB (shuffle partitions scale with keys, not history —
  * and a skewed key is a salting candidate, see core/Skew).
  */
object TimeSeries {

  // ---------------------------------------------------------- q_forward_fill
  /** Forward-fill: only purchase events carry a meaningful amount; every
    * event gets the entity's most recent purchase value carried forward
    * (null until the first purchase). `last(ignoreNulls)` over a running
    * rows-frame is the distributed as-of lookup — no self-join, no
    * per-row subquery. Order (ts, event_id) is total, so both engines
    * pick the identical carried value. */
  def qForwardFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("pv",
        when($"event_type" === "purchase", OP.dec2($"value")))
      .select($"event_id", $"user_id", $"event_type",
        last($"pv", ignoreNulls = true).over(w).cast("double")
          .as("last_purchase"))
      .orderBy($"event_id")
  }

  private val qForwardFillSql =
    """SELECT event_id, user_id, event_type,
      |  CAST(last_value(pv IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS last_purchase
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |        CASE WHEN event_type = 'purchase'
      |             THEN CAST(value AS DECIMAL(18,2)) END AS pv
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  // ----------------------------------------------------- q_forward_fill_dist
  /** [[qForwardFill]]'s production shape through the DISTRIBUTED window
    * (r12: the IGNORE NULLS family joined the operator): the same
    * carry-forward plus the rest of the null-skipping surface — first and
    * second purchase (IGNORE NULLS first/nth head chain), previous and
    * next purchase (IGNORE NULLS lag ring / ordinal-resolved lead) — all
    * marker-routed onto DistributedWindowExec, so a user_id group
    * spanning range partitions reads its carries, heads, and lookaheads
    * from the driver-chained seeds instead of a single hash task. Amounts
    * ride exact integer cents so the gate hashes bit-stable values. Gate:
    * the plain IGNORE NULLS window oracle — the custom execution must be
    * invisible. */
  def qForwardFillDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.core.Sessions.tune(s)
    val m = graft.plans.DistributedRankRewrite.NameMarker
    val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // r13: the DAY-grain RANGE twins — ORDER BY day key alone, so every
    // day is a real peer RUN and the frame end is the run's end (the
    // previously-declined RANGE IGNORE NULLS / RANGE nth shapes). The
    // day value dv derives from the sort key (NULL every third day), so
    // each per-run answer is tie-insensitive and hashable.
    val w3 = Window.partitionBy($"user_id").orderBy($"dkey")
    Tables.events(s, dir)
      .withColumn("pv_cents",
        when($"event_type" === "purchase",
          (OP.dec2($"value") * 100).cast("long")))
      .withColumn("dkey",
        datediff($"ts".cast("date"), lit("2024-01-01").cast("date"))
          .cast("long"))
      .withColumn("dv",
        when($"dkey" % 3 === 0, lit(null).cast("long"))
          .otherwise($"dkey" * 100))
      .withColumn(s"${m}_carry",
        last($"pv_cents", ignoreNulls = true).over(w))
      .withColumn(s"${m}_first",
        first($"pv_cents", ignoreNulls = true).over(w))
      .withColumn(s"${m}_second",
        nth_value($"pv_cents", 2, ignoreNulls = true).over(w))
      .withColumn(s"${m}_prev",
        lag($"pv_cents", 1, null, ignoreNulls = true).over(ord))
      .withColumn(s"${m}_next",
        lead($"pv_cents", 1, null, ignoreNulls = true).over(ord))
      .withColumn(s"${m}_dcarry", last($"dv", ignoreNulls = true).over(w3))
      .withColumn(s"${m}_dfirst", first($"dv", ignoreNulls = true).over(w3))
      .withColumn(s"${m}_dsecond",
        nth_value($"dv", 2, ignoreNulls = true).over(w3))
      .withColumn(s"${m}_dthird", nth_value($"dv", 3).over(w3))
      .select($"event_id", $"user_id", $"event_type",
        col(s"${m}_carry").as("last_purchase_cents"),
        col(s"${m}_first").as("first_purchase_cents"),
        col(s"${m}_second").as("second_purchase_cents"),
        col(s"${m}_prev").as("prev_purchase_cents"),
        col(s"${m}_next").as("next_purchase_cents"),
        col(s"${m}_dcarry").as("day_carry_val"),
        col(s"${m}_dfirst").as("day_first_val"),
        col(s"${m}_dsecond").as("day_second_val"),
        col(s"${m}_dthird").as("day_third_val"))
      .orderBy($"event_id")
  }

  private val qForwardFillDistSql =
    """SELECT event_id, user_id, event_type,
      |  CAST(last_value(pv IGNORE NULLS) OVER w AS BIGINT)
      |    AS last_purchase_cents,
      |  CAST(first_value(pv IGNORE NULLS) OVER w AS BIGINT)
      |    AS first_purchase_cents,
      |  CAST(nth_value(pv, 2 IGNORE NULLS) OVER w AS BIGINT)
      |    AS second_purchase_cents,
      |  CAST(lag(pv, 1 IGNORE NULLS) OVER ord AS BIGINT)
      |    AS prev_purchase_cents,
      |  CAST(lead(pv, 1 IGNORE NULLS) OVER ord AS BIGINT)
      |    AS next_purchase_cents,
      |  CAST(last_value(dv IGNORE NULLS) OVER w3 AS BIGINT)
      |    AS day_carry_val,
      |  CAST(first_value(dv IGNORE NULLS) OVER w3 AS BIGINT)
      |    AS day_first_val,
      |  CAST(nth_value(dv, 2 IGNORE NULLS) OVER w3 AS BIGINT)
      |    AS day_second_val,
      |  CAST(nth_value(dv, 3) OVER w3 AS BIGINT)
      |    AS day_third_val
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |        event_type,
      |        CASE WHEN event_type = 'purchase'
      |             THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |        END AS pv,
      |        CASE WHEN dkey % 3 = 0 THEN NULL ELSE dkey * 100 END AS dv,
      |        dkey
      |      FROM (SELECT *,
      |              datediff('day', DATE '2024-01-01',
      |                CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS dkey
      |            FROM events))
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  ord AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  w3 AS (PARTITION BY user_id ORDER BY dkey)
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ q_cdc_apply
  /** Changelog compaction: the event stream read as a CDC feed
    * (signup = insert, error = tombstone delete, everything else = upsert),
    * applied last-writer-wins by the total sequence (ts, event_id). The
    * final state is one row per live key — rank-1 per key, tombstones
    * dropped AFTER picking the winner, so a trailing delete removes the
    * key entirely (the semantics Delta/Hudi MERGE implements; here it is
    * a single row_number window, which AQE shards by key at scale). */
  def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val log = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D")
          .otherwise("U").as("op"),
        OP.dec2($"value").as("v"))
    cdcCompact(log).orderBy($"user_id")
  }

  /** Last-writer-wins compaction of a (user_id, ts, event_id, op, v)
    * changelog — factored out of [[qCdcApply]] so StatsGraphSpec can
    * property-test idempotence under duplicate delivery and input-order
    * invariance on generated logs. */
  private[graft] def cdcCompact(log: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("user_id"))
    log
      .withColumn("rn", row_number().over(
        byKey.orderBy(col("ts").desc, col("event_id").desc)))
      .withColumn("n_ops", count(lit(1)).over(byKey))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("op").as("last_op"),
        col("v").cast("double").as("last_value"),
        col("ts").as("last_ts"), col("n_ops"))
  }

  private val qCdcApplySql =
    """WITH log AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    CASE WHEN event_type = 'signup' THEN 'I'
      |         WHEN event_type = 'error' THEN 'D'
      |         ELSE 'U' END AS op,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |ranked AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_ops
      |  FROM log)
      |SELECT user_id, op AS last_op, CAST(v AS DOUBLE) AS last_value,
      |  ts AS last_ts, n_ops
      |FROM ranked WHERE rn = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin

  // ----------------------------------------------------------------- q_ewma
  /** Exponentially-weighted moving average (α = 1/2, depth 5) per entity —
    * the classic time-series smoother as explicit integer-weighted lags:
    * numerator 16·v₀+8·v₁+4·v₂+2·v₃+v₄ over integer cents, denominator
    * renormalized to the lags actually present at the series head. The
    * recursion is unrolled to a fixed depth precisely so it stays a plain
    * rows-frame window (the infinite-memory EWMA needs sequential state —
    * mapGroupsWithState territory); all arithmetic is exact until one
    * final double division. */
  def qEwma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val weights = Seq(16L, 8L, 4L, 2L, 1L)
    val base = Tables.events(s, dir)
      .withColumn("c0", (OP.dec2($"value") * 100).cast("long"))
    val lagged = weights.indices.tail.foldLeft(base) { (df, i) =>
      df.withColumn(s"c$i", lag($"c0", i).over(w))
    }
    val num = weights.zipWithIndex
      .map { case (wt, i) => coalesce(col(s"c$i"), lit(0L)) * wt }
      .reduce(_ + _)
    val den = weights.zipWithIndex
      .map { case (wt, i) =>
        when(col(s"c$i").isNull, 0L).otherwise(wt)
      }
      .reduce(_ + _)
    lagged
      .select($"event_id", $"user_id",
        ($"c0".cast("double") / 100.0d).as("value"),
        round(num.cast("double") / den / 100.0d, 4).as("ewma5"))
      .orderBy($"event_id")
  }

  private val qEwmaSql =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c0
      |  FROM events),
      |lagged AS (
      |  SELECT event_id, user_id, c0,
      |    lag(c0, 1) OVER w AS c1, lag(c0, 2) OVER w AS c2,
      |    lag(c0, 3) OVER w AS c3, lag(c0, 4) OVER w AS c4
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_id, user_id, CAST(c0 AS DOUBLE) / 100.0 AS value,
      |  round(CAST(coalesce(c0, 0) * 16 + coalesce(c1, 0) * 8
      |             + coalesce(c2, 0) * 4 + coalesce(c3, 0) * 2
      |             + coalesce(c4, 0) AS DOUBLE)
      |        / (CASE WHEN c0 IS NULL THEN 0 ELSE 16 END
      |           + CASE WHEN c1 IS NULL THEN 0 ELSE 8 END
      |           + CASE WHEN c2 IS NULL THEN 0 ELSE 4 END
      |           + CASE WHEN c3 IS NULL THEN 0 ELSE 2 END
      |           + CASE WHEN c4 IS NULL THEN 0 ELSE 1 END)
      |        / 100.0, 4) AS ewma5
      |FROM lagged ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ q_seq_mining
  /** Frequent consecutive event-type bigrams — first-order behavioral
    * sequence mining: one lag window per entity, then an alphabet²-bounded
    * aggregation (≤ 25 keys here), support share over the tiny aggregate.
    * The shuffle carries (prev, next) pairs, map-side combined. */
  def qSeqMining(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(s, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("cnt"))
    pairs
      .withColumn("support",
        round($"cnt" / sum($"cnt").over(Window.partitionBy()), 6))
      .select($"prev_type", $"next_type", $"cnt", $"support")
      .orderBy($"cnt".desc, $"prev_type", $"next_type")
  }

  private val qSeqMiningSql =
    """WITH pairs AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS cnt
      |  FROM (SELECT user_id, event_type,
      |          lag(event_type, 1) OVER (PARTITION BY user_id
      |            ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
      |        FROM events)
      |  WHERE prev_type IS NOT NULL
      |  GROUP BY prev_type, next_type)
      |SELECT prev_type, next_type, cnt,
      |  round(cnt / sum(cnt) OVER (), 6) AS support
      |FROM pairs
      |ORDER BY cnt DESC, prev_type, next_type""".stripMargin

  // -------------------------------------------------------- q_feature_matrix
  /** ML feature assembly per event: previous value, rolling 3-event
    * mean/min/max, and the event's ordinal — the lag/rolling feature block
    * a training pipeline derives before a model sees the stream. One
    * entity-keyed window serves every feature (Spark plans a single
    * WindowExec for same-spec functions); sums stay integer cents until
    * the final divisions. */
  def qFeatureMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val w3 = w.rowsBetween(-2, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("c0", (OP.dec2($"value") * 100).cast("long"))
      .select($"event_id", $"user_id",
        ($"c0".cast("double") / 100.0d).as("value"),
        (lag($"c0", 1).over(w).cast("double") / 100.0d).as("v_lag1"),
        round(sum($"c0").over(w3).cast("double")
          / count(lit(1)).over(w3) / 100.0d, 4).as("roll3_mean"),
        (min($"c0").over(w3).cast("double") / 100.0d).as("roll3_min"),
        (max($"c0").over(w3).cast("double") / 100.0d).as("roll3_max"),
        row_number().over(w).as("n_so_far"))
      .orderBy($"event_id")
  }

  private val qFeatureMatrixSql =
    """SELECT event_id, user_id,
      |  CAST(c0 AS DOUBLE) / 100.0 AS value,
      |  CAST(lag(c0, 1) OVER w AS DOUBLE) / 100.0 AS v_lag1,
      |  round(CAST(sum(c0) OVER w3 AS DOUBLE)
      |        / count(*) OVER w3 / 100.0, 4) AS roll3_mean,
      |  CAST(min(c0) OVER w3 AS DOUBLE) / 100.0 AS roll3_min,
      |  CAST(max(c0) OVER w3 AS DOUBLE) / 100.0 AS roll3_max,
      |  CAST(row_number() OVER w AS INT) AS n_so_far
      |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c0
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  w3 AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ q_ohlc_bars
  /** Time-series resampling to 6-hour OHLC bars per entity: open/close are
    * the first/last values by the total (ts, event_id) order inside the
    * bar (two rank windows over the same bar partitioning — one WindowExec
    * pass each direction), high/low/volume are plain min/max/count
    * aggregates. The bar id is integer epoch arithmetic, so bucketing is
    * identical on both engines; the whole query is one shuffle on
    * (entity, bar). */
  def qOhlcBars(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_id",
        (OP.dec2($"value") * 100).cast("long").as("c"))
      .withColumn("bar", expr("unix_micros(ts) div 21600000000").cast("long"))
    val byBar = Window.partitionBy($"user_id", $"bar")
    base
      .withColumn("rn_a",
        row_number().over(byBar.orderBy($"ts", $"event_id")))
      .withColumn("rn_d",
        row_number().over(byBar.orderBy($"ts".desc, $"event_id".desc)))
      .groupBy($"user_id", $"bar")
      .agg(
        (sum(when($"rn_a" === 1, $"c")).cast("double") / 100.0d).as("open"),
        (max($"c").cast("double") / 100.0d).as("high"),
        (min($"c").cast("double") / 100.0d).as("low"),
        (sum(when($"rn_d" === 1, $"c")).cast("double") / 100.0d).as("close"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id", $"bar")
  }

  private val qOhlcBarsSql =
    """WITH base AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 AS bar
      |  FROM events),
      |ranked AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id, bar
      |      ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY user_id, bar
      |      ORDER BY ts DESC, event_id DESC) AS rn_d
      |  FROM base)
      |SELECT user_id, bar,
      |  CAST(sum(CASE WHEN rn_a = 1 THEN c END) AS DOUBLE) / 100.0 AS open,
      |  CAST(max(c) AS DOUBLE) / 100.0 AS high,
      |  CAST(min(c) AS DOUBLE) / 100.0 AS low,
      |  CAST(sum(CASE WHEN rn_d = 1 THEN c END) AS DOUBLE) / 100.0 AS close,
      |  count(*) AS n_events
      |FROM ranked GROUP BY user_id, bar
      |ORDER BY user_id, bar""".stripMargin

  // -------------------------------------------------------- q_rolling_median
  /** Rolling 7-event median of purchase amounts per user — the robust
    * smoother of the repair family (EWMA tracks trend but one corrupted
    * spike drags it; the windowed median rejects it outright). Frame =
    * ROWS 6 PRECEDING..CURRENT over the (ts, event_id) total order.
    *
    * Scale shape: one shuffle on user_id, per-user sorted windows; the
    * collected frame is a constant-bounded 7-element array, so state per
    * row is O(1) — this is the per-key bounded-frame window Spark
    * executes without ever materializing a group.
    *
    * Engine parity: amounts become integer cents (exact decimal), the
    * sorted frame's two middle elements (equal when the frame is odd) are
    * summed as integers, and the single /200.0 division emits the median
    * in currency units — one double op, identical both engines. */
  def qRollingMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-6, Window.currentRow)
    Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .withColumn("cents",
        (OP.dec2($"value") * 100).cast("long"))
      .withColumn("arr", sort_array(collect_list($"cents").over(w)))
      .select($"event_id", $"user_id", $"value",
        size($"arr").as("n_window"),
        ((element_at($"arr", expr("CAST((size(arr) + 1) div 2 AS INT)")) +
          element_at($"arr", expr("CAST(size(arr) div 2 + 1 AS INT)")))
          .cast("double") / lit(200.0)).as("rolling_median"))
      .orderBy($"user_id", $"event_id")
  }

  private val qRollingMedianSql =
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |framed AS (
      |  SELECT event_id, user_id, value,
      |    list_sort(list(cents) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
      |  FROM p)
      |SELECT event_id, user_id, value,
      |  CAST(len(arr) AS INT) AS n_window,
      |  CAST(arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1] AS DOUBLE)
      |    / 200.0 AS rolling_median
      |FROM framed
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------- q_window_distinct
  /** EXACT trailing-7-day distinct users per day — the exact twin of the
    * q_window_kmv sketch (run both, and the sketch's error is measurable
    * in-house before anyone trusts it at scale). Sliding distinct does not
    * decompose into per-day partials, so the scalable exact form maps each
    * distinct (day, user) fact to the ≤7 windows it can serve (bounded
    * ×7 fan-out of an already-deduplicated stream) and distinct-counts per
    * window — never a giant per-window state, never a window function
    * over raw events.
    *
    * Shuffles: dedup to (day, user), then one count-distinct keyed on the
    * window day. Windows are only emitted for days present in the data
    * (the same day-bucket arithmetic as q_partition_stats). */
  def qWindowDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val du = Tables.events(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("d"), $"user_id")
      .distinct()
    val days = du.select($"d").distinct()
    val contrib = du
      .select(explode(expr("sequence(d, d + 6)")).as("wend"), $"user_id")
    val daily = du.groupBy($"d".as("wend"))
      .agg(countDistinct($"user_id").as("n_users_1d"))
    contrib
      .join(days.withColumnRenamed("d", "wend"), Seq("wend"))
      .groupBy($"wend").agg(countDistinct($"user_id").as("n_users_7d"))
      .join(daily, Seq("wend"))
      .select($"wend".as("day_bucket"), $"n_users_1d", $"n_users_7d")
      .orderBy($"day_bucket")
  }

  private val qWindowDistinctSql =
    """WITH du AS (
      |  SELECT DISTINCT
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d, user_id
      |  FROM events),
      |days AS (SELECT DISTINCT d FROM du),
      |contrib AS (
      |  SELECT unnest(range(d, d + 7)) AS wend, user_id FROM du),
      |w7 AS (
      |  SELECT wend, count(DISTINCT user_id) AS n_users_7d
      |  FROM contrib JOIN days ON days.d = contrib.wend
      |  GROUP BY wend),
      |w1 AS (
      |  SELECT d AS wend, count(DISTINCT user_id) AS n_users_1d
      |  FROM du GROUP BY d)
      |SELECT wend AS day_bucket, n_users_1d, n_users_7d
      |FROM w7 JOIN w1 USING (wend)
      |ORDER BY day_bucket""".stripMargin

  // -------------------------------------------------------------- q_seasonal
  /** Hour-of-day seasonality profile: event volume per UTC hour slot and
    * its index against the uniform share (index 2.0 = that hour carries
    * twice the average load). What capacity planning and anomaly
    * baselining read first — a volume z-score is meaningless until the
    * daily shape is factored out.
    *
    * Scale shape: hour slots are integer µs-epoch arithmetic (no calendar
    * functions — engine-identical); one map-side-combinable count to 24
    * groups + a broadcast 1-row total. Index = exact integer product over
    * integer total, one double division. */
  def qSeasonal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byHour = Tables.events(s, dir)
      .select(expr("(unix_micros(ts) div 3600000000) % 24").as("hour_slot"))
      .groupBy($"hour_slot").agg(count(lit(1)).as("n_events"))
    val total = Tables.events(s, dir).agg(count(lit(1)).as("n_total"))
    byHour.crossJoin(broadcast(total))
      .select($"hour_slot", $"n_events",
        round(($"n_events" * lit(24)).cast("double") / $"n_total", 4)
          .as("load_index"))
      .orderBy($"hour_slot")
  }

  private val qSeasonalSql =
    """WITH h AS (
      |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24
      |    AS hour_slot
      |  FROM events),
      |b AS (SELECT hour_slot, count(*) AS n_events FROM h GROUP BY 1),
      |t AS (SELECT count(*) AS n_total FROM h)
      |SELECT hour_slot, n_events,
      |  round(CAST(n_events * 24 AS DOUBLE) / n_total, 4) AS load_index
      |FROM b CROSS JOIN t
      |ORDER BY hour_slot""".stripMargin

  // ----------------------------------------------------------------- q_twap
  /** Time-weighted average value per user — each event's value is "held"
    * until the user's next event, so a value that persisted for an hour
    * weighs 3600× one that was replaced in a second. The standard
    * time-weighted aggregate (TWAP in finance; duration-weighted state in
    * telemetry) that a plain AVG silently gets wrong on irregular feeds.
    *
    * Scale shape: one shuffle on user_id; lead() over the per-user total
    * order supplies the holding duration; the weighted sum is exact
    * integer cents × whole seconds, with two double divisions at the end
    * (identical order both engines). Users whose events all fall inside
    * one second carry zero total duration and drop out — documented, and
    * identical in the oracle's HAVING. */
  def qTwap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("cents", (OP.dec2($"value") * 100).cast("long"))
      .withColumn("next_us", lead($"us", 1).over(w))
      .filter($"next_us".isNotNull)
      .withColumn("dur_sec", expr("(next_us - us) div 1000000"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum($"dur_sec").as("total_sec"),
        round(sum($"cents" * $"dur_sec").cast("double")
          / sum($"dur_sec") / lit(100.0), 4).as("twap"))
      .filter($"total_sec" > 0)
      .orderBy($"user_id")
  }

  private val qTwapSql =
    """WITH e AS (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next_us
      |  FROM events),
      |d AS (
      |  SELECT user_id, cents, (next_us - us) // 1000000 AS dur_sec
      |  FROM e WHERE next_us IS NOT NULL)
      |SELECT user_id, count(*) AS n_intervals,
      |  CAST(sum(dur_sec) AS BIGINT) AS total_sec,
      |  round(CAST(sum(cents * dur_sec) AS DOUBLE)
      |    / sum(dur_sec) / 100.0, 4) AS twap
      |FROM d
      |GROUP BY user_id
      |HAVING sum(dur_sec) > 0
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ q_freshness
  /** Data-freshness audit: per event type, the event count, the last event
    * time (µs since epoch — integer, so both engines hash identically) and
    * staleness in whole seconds behind the stream's global high watermark.
    * The first page of every pipeline-health dashboard: a feed whose
    * staleness grows is broken upstream no matter what its volume says.
    *
    * Scale shape: two map-side-combinable max/count aggregates (one per
    * type, one global) and a broadcast 1-row join — a single pass over the
    * fact, O(types) output. */
  def qFreshness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byType = Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros($"ts")).as("last_us"))
    val global = Tables.events(s, dir)
      .agg(max(unix_micros($"ts")).as("g_us"))
    byType.crossJoin(broadcast(global))
      .select($"event_type", $"n_events", $"last_us",
        expr("(g_us - last_us) div 1000000").as("staleness_sec"))
      .orderBy($"event_type")
  }

  private val qFreshnessSql =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |t AS (
      |  SELECT event_type, count(*) AS n_events, max(us) AS last_us
      |  FROM e GROUP BY event_type),
      |g AS (SELECT max(us) AS g_us FROM e)
      |SELECT event_type, n_events, last_us,
      |  (g_us - last_us) // 1000000 AS staleness_sec
      |FROM t CROSS JOIN g
      |ORDER BY event_type""".stripMargin

  // ----------------------------------------------------------------- q_cusum
  /** CUSUM changepoint audit over the daily order-revenue series: the
    * cumulative sum of deviations from the global mean, with the peak
    * |CUSUM| day flagged — where the running deviation turns around is
    * where the level shifted (the classic Page test statistic, read
    * directly off the curve). All accumulation is EXACT: the deviation is
    * scaled by n (cusumₜ·n = Σᵢ≤ₜ (n·xᵢ − S), every term an integer), so
    * the peak flag is an exact integer comparison, never a float ulp call.
    *
    * Scale shape: the fact collapses to O(days) rows in one map-side-
    * combined aggregation; the running sum and peak max are windows over
    * that DAY aggregate (bounded: 10 years ≈ 3.7k rows), never over the
    * fact. 100 TB changes the scan cost only. */
  def qCusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .groupBy(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day_bucket"))
      .agg(sum((OP.dec2($"o_totalprice") * 100).cast("long")).as("xc"))
    val wAll = Window.partitionBy()
    val wRun = Window.partitionBy().orderBy($"day_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum($"xc").over(wAll))
      // n·x − S per day, summed in DECIMAL(38,0): exact at any scale
      .withColumn("dev_n", ($"n".cast(org.apache.spark.sql.types.DecimalType(38, 0)) * $"xc") - $"s")
      .withColumn("cusum_n", sum($"dev_n").over(wRun))
      .withColumn("peak_n", max(abs($"cusum_n")).over(wAll))
      .select($"day_bucket",
        ($"xc".cast("double") / 100.0d).as("revenue"),
        round($"cusum_n".cast("double") / ($"n".cast("double") * 100.0d), 4).as("cusum"),
        (abs($"cusum_n") === $"peak_n").as("is_peak"))
      .orderBy($"day_bucket")
  }

  private val qCusumSql =
    """WITH daily AS (
      |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day_bucket,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS xc
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT day_bucket, xc,
      |    count(*) OVER () AS n,
      |    sum(xc) OVER () AS s
      |  FROM daily),
      |c AS (
      |  SELECT day_bucket, xc, n,
      |    sum(CAST(n AS HUGEINT) * xc - s)
      |      OVER (ORDER BY day_bucket ROWS UNBOUNDED PRECEDING) AS cusum_n
      |  FROM t)
      |SELECT day_bucket,
      |  CAST(xc AS DOUBLE) / 100.0 AS revenue,
      |  round(CAST(cusum_n AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0), 4) AS cusum,
      |  abs(cusum_n) = max(abs(cusum_n)) OVER () AS is_peak
      |FROM c ORDER BY day_bucket""".stripMargin

  // ------------------------------------------------------------- q_crosscorr
  /** Lead-lag cross-correlation between the daily click and purchase
    * series at lags −3..+3 — does activity today predict purchases
    * tomorrow? The r at each lag is Pearson over the overlapping days,
    * from exact integer count sums (same discipline as q_autocorr, which
    * correlates ONE series with itself; this is the two-series variant a
    * funnel owner actually asks for).
    *
    * Scale shape: one conditional aggregation to O(days), a 7-way lag
    * explode of that DAY table joined broadcast back to itself, exact
    * sums per lag. The fact is scanned once. */
  def qCrosscorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, dir)
      .filter($"event_type".isin("click", "purchase"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day_bucket"))
      .agg(count(when($"event_type" === "click", 1)).as("x"),
        count(when($"event_type" === "purchase", 1)).as("y"))
    val pairs = daily
      .select($"day_bucket", $"x", explode(array((-3 to 3).map(lit): _*)).as("lag"))
      .withColumn("probe", $"day_bucket" + $"lag")
      .alias("a")
      .join(broadcast(daily.select($"day_bucket".as("probe"), $"y").alias("b")), "probe")
      .select($"lag", $"a.x".as("x"), $"b.y".as("y"))
    pairs.groupBy($"lag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"x").cast("double").as("sx"),
        sum($"y").cast("double").as("sy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"y" * $"y").cast("double").as("syy"),
        sum($"x" * $"y").cast("double").as("sxy"))
      .select($"lag", $"n".cast("long").as("n_days"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy")), 6).as("r"))
      .orderBy($"lag")
  }

  private val qCrosscorrSql =
    """WITH daily AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_bucket,
      |    count(*) FILTER (WHERE event_type = 'click') AS x,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |lags AS (SELECT CAST(v AS INT) AS lag FROM generate_series(-3, 3) s(v)),
      |pairs AS (
      |  SELECT l.lag, a.x, b.y
      |  FROM daily a CROSS JOIN lags l
      |  JOIN daily b ON b.day_bucket = a.day_bucket + l.lag),
      |g AS (
      |  SELECT lag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(y * y) AS DOUBLE) AS syy,
      |    CAST(sum(x * y) AS DOUBLE) AS sxy
      |  FROM pairs GROUP BY lag)
      |SELECT lag, CAST(n AS BIGINT) AS n_days,
      |  round((n * sxy - sx * sy) /
      |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
      |FROM g ORDER BY lag""".stripMargin

  // --------------------------------------------------------- q_interval_merge
  /** Union-coverage of overlapping intervals per user: each event opens a
    * 30-minute activity window; overlapping windows merge, and the output
    * is each user's merged-interval count and total covered seconds — the
    * interval-union problem (downtime coverage, ad exposure, machine
    * utilization) that naive SUM(length) double-counts. An interval
    * starts a new merged run iff its start exceeds the running max end of
    * all earlier intervals (exact microsecond integers); run ids are a
    * conditional running count, coverage a per-run max(end)−min(start).
    *
    * Scale shape: ONE shuffle on user_id; both windows (running max,
    * running count) ride the same per-user sort. Per-entity history is
    * bounded, the classic salting candidate if one user were a firehose. */
  def qIntervalMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val span = 1800000000L // 30 min in microseconds
    val w = Window.partitionBy($"user_id").orderBy($"st", $"event_id")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val runs = Tables.events(s, dir)
      .select($"user_id", $"event_id", expr("unix_micros(ts)").as("st"))
      .withColumn("en", $"st" + span)
      .withColumn("prev_max_en", max($"en").over(wPrev))
      .withColumn("is_new", ($"prev_max_en".isNull || $"st" > $"prev_max_en").cast("int"))
      .withColumn("run_id", sum($"is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy($"user_id", $"run_id")
      .agg(min($"st").as("run_st"), max($"en").as("run_en"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        expr("sum(run_en - run_st) div 1000000").as("covered_sec"))
      .orderBy($"user_id")
  }

  private val qIntervalMergeSql =
    """WITH iv AS (
      |  SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS st,
      |    epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS en
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, st, en,
      |    max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_en
      |  FROM iv),
      |r AS (
      |  SELECT user_id, st, en,
      |    sum(CASE WHEN prev_max_en IS NULL OR st > prev_max_en
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY st, event_id
      |        ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM m),
      |runs AS (
      |  SELECT user_id, run_id, min(st) AS run_st, max(en) AS run_en
      |  FROM r GROUP BY 1, 2)
      |-- CAST: DuckDB promotes sum(BIGINT) to HUGEINT, which pandas
      |-- renders as float64 — the driver's value hash then sees 52.0 vs
      |-- Spark's 52. Pin every emitted integer back to BIGINT.
      |SELECT user_id, count(*) AS n_intervals,
      |  CAST(sum(run_en - run_st) // 1000000 AS BIGINT) AS covered_sec
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------- q_gaps_islands
  /** Gaps-and-islands over each customer's distinct order days: runs of
    * CONSECUTIVE calendar days collapse to islands via the classic
    * day − row_number() constant-per-run key — no join, no iteration, one
    * per-customer window. Output is each customer's island count, longest
    * streak, and widest gap — the retention-mechanics summary (streaks
    * and lapses) a lifecycle model consumes.
    *
    * Scale shape: distinct (cust, day) is one map-side-combinable
    * aggregation; the two windows ride ONE shuffle on o_custkey. Per-key
    * cardinality is bounded by the calendar. */
  def qGapsIslands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"cust").orderBy($"day")
    val days = Tables.orders(s, dir)
      .select($"o_custkey".as("cust"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"))
      .distinct()
      .withColumn("isl", $"day" - row_number().over(w))
      .withColumn("gap", $"day" - lag($"day", 1).over(w) - 1L)
    days.groupBy($"cust", $"isl")
      .agg(count(lit(1)).as("len"), max($"gap").as("gap_before"))
      .groupBy($"cust")
      .agg(count(lit(1)).as("n_islands"),
        max($"len").as("longest_streak"),
        coalesce(max($"gap_before"), lit(0L)).as("widest_gap"))
      .orderBy($"cust")
  }

  private val qGapsIslandsSql =
    """WITH days AS (
      |  SELECT DISTINCT o_custkey AS cust,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day
      |  FROM orders),
      |isl AS (
      |  SELECT cust, day,
      |    day - row_number() OVER (PARTITION BY cust ORDER BY day) AS isl,
      |    day - lag(day) OVER (PARTITION BY cust ORDER BY day) - 1 AS gap
      |  FROM days),
      |runs AS (
      |  SELECT cust, isl, count(*) AS len, max(gap) AS gap_before
      |  FROM isl GROUP BY 1, 2)
      |SELECT cust, count(*) AS n_islands,
      |  max(len) AS longest_streak,
      |  coalesce(max(gap_before), 0) AS widest_gap
      |FROM runs GROUP BY cust ORDER BY cust""".stripMargin

  // -------------------------------------------------------------- q_lateness
  /** Event-lateness histogram — the number that SIZES a watermark before
    * anyone picks one: treating event_id as per-user arrival order,
    * lateness = running max(event time seen so far) − this event's time;
    * the histogram of those lags says what delay bound covers 99% of
    * arrivals (the `withWatermark` argument the streaming suite needs as
    * an input). Buckets are exact integer minute decades.
    *
    * Scale shape: one shuffle on user_id for the running-max window, one
    * map-side-combined rollup to O(buckets) rows. */
  def qLateness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select($"user_id", $"event_id", expr("unix_micros(ts)").as("us"))
      .withColumn("hwm", max($"us").over(w))
      .withColumn("late_us", greatest($"hwm" - $"us", lit(0L)))
      .withColumn("bucket",
        when($"hwm".isNull, lit(-1L))
          .otherwise(expr("late_us div 600000000"))) // 10-minute decades
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_events"),
        expr("cast(max(late_us) div 1000000 as bigint)").as("max_late_sec"))
      .orderBy($"bucket")
  }

  private val qLatenessSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |l AS (
      |  SELECT user_id, us,
      |    max(us) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      |  FROM ev),
      |b AS (
      |  SELECT CASE WHEN hwm IS NULL THEN -1
      |              ELSE greatest(hwm - us, 0) // 600000000 END AS bucket,
      |    greatest(coalesce(hwm - us, 0), 0) AS late_us
      |  FROM l)
      |SELECT bucket, count(*) AS n_events,
      |  max(late_us) // 1000000 AS max_late_sec
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ------------------------------------------------------------- registry
  // ------------------------------------------------------- q_stl_decompose
  /** Classical seasonal decomposition of the daily-revenue series (the STL
    * shape with moving-average smoothing): trend = centered 7-day moving
    * average (full windows only), seasonal = day-of-week mean of the
    * detrended residual, remainder = what neither explains. The series
    * diagnostic behind q_seasonal's profile and q_anomaly_days' flags —
    * remainder spikes are anomalies AFTER the weekly rhythm is accounted
    * for, which a plain z-score misses.
    *
    * Engine parity: revenue in integer cents; trend and seasonal use
    * truncating integer division (`div` / `//` agree on non-negatives —
    * revenue sums are positive); day-of-week = days-since-epoch mod 7
    * (calendar-convention-free, identical on both engines).
    *
    * Scale shape: the fact scan collapses to O(days) in one map-side-
    * combinable aggregate; the moving-average window and the DOW rollup
    * run over that aggregate only (the global window is dim-sized by
    * construction — the WindowExec single-partition warning is the
    * documented cost of a ~2.4k-row table, not a fact-data sort). */
  def qStlDecompose(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .groupBy($"o_orderdate".as("day"))
      .agg(sum((OP.dec2($"o_totalprice") * 100).cast("long")).as("x"))
    val w = Window.orderBy($"day").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("trend",
        when($"n_win" === 7, expr("(sum(x) OVER (ORDER BY day " +
          "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) div 7")))
      .withColumn("dow", expr("datediff(day, DATE '1970-01-01') % 7"))
    val seasonal = trended.filter($"trend".isNotNull)
      .groupBy($"dow")
      .agg(expr("sum(x - trend) div count(*)").as("seasonal"))
    trended
      .join(broadcast(seasonal), Seq("dow"), "left")
      .select($"day", $"x",
        $"trend",
        when($"trend".isNotNull, $"seasonal").as("seasonal"),
        when($"trend".isNotNull, $"x" - $"trend" - $"seasonal")
          .as("remainder"))
      .orderBy($"day")
  }

  private val qStlDecomposeSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS x
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT day, x,
      |    CASE WHEN count(*) OVER w = 7
      |         THEN (sum(x) OVER w) // 7 END AS trend,
      |    datediff('day', DATE '1970-01-01', day) % 7 AS dow
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
      |               AND 3 FOLLOWING)),
      |s AS (
      |  SELECT dow, sum(x - trend) // count(*) AS seasonal
      |  FROM t WHERE trend IS NOT NULL GROUP BY dow)
      |-- CAST: sum(BIGINT) is HUGEINT in DuckDB → float64 in pandas →
      |-- driver hash sees 52.0 vs Spark's 52. Pin to BIGINT. (trend/
      |-- seasonal/remainder carry NULLs, so BOTH engines' frames go
      |-- int64→float64 in pandas identically — only the HUGEINT
      |-- asymmetry diverges.)
      |SELECT t.day, CAST(t.x AS BIGINT) AS x,
      |  CAST(t.trend AS BIGINT) AS trend,
      |  CAST(CASE WHEN t.trend IS NOT NULL THEN s.seasonal END
      |    AS BIGINT) AS seasonal,
      |  CAST(CASE WHEN t.trend IS NOT NULL
      |       THEN t.x - t.trend - s.seasonal END AS BIGINT) AS remainder
      |FROM t LEFT JOIN s USING (dow)
      |ORDER BY t.day""".stripMargin

  // ------------------------------------------------------------------ q_vwap
  /** Per-ship-day volume-weighted average price — revenue per unit shipped,
    * the finance-desk VWAP re-read over the lineitem fact. One map-side-
    * combinable groupBy(day) over the fact scan, no window, no join; both
    * sums are exact integers (cents, 2-decimal quantity) and the 4-dp
    * VWAP is computed by exact integer HALF-UP division —
    * `(2·cents·10⁴ + qty100) div (2·qty100)` — never by `round()` over a
    * double quotient: a quotient whose shortest decimal representation
    * ties at the 5th decimal rounds DIFFERENTLY in Spark (BigDecimal of
    * the shortest repr, HALF_UP) and DuckDB (std::round of the exact
    * binary), and sf0.001's small day-groups actually produce such exact
    * ties (r14 — caught by the cross-scale gate, 3 divergent rows). The
    * day grain keeps the output O(days) at any fact scale. */
  def qVwap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_shipdate".as("day"))
      .agg(
        sum((OP.dec2($"l_extendedprice") * 100).cast("long")).as("cents"),
        sum((OP.dec2($"l_quantity") * 100).cast("long")).as("qty100"))
      .select($"day",
        ($"qty100".cast("double") / 100).as("total_qty"),
        (expr("(2 * cents * 10000 + qty100) div (2 * qty100)")
          .cast("double") / 10000).as("vwap"))
      .orderBy($"day")
  }

  private val qVwapSql =
    """SELECT day,
      |  CAST(qty100 AS DOUBLE) / 100 AS total_qty,
      |  CAST(CAST((2 * cents * 10000 + qty100) // (2 * qty100) AS BIGINT)
      |    AS DOUBLE) / 10000 AS vwap
      |FROM (
      |  SELECT l_shipdate AS day,
      |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS cents,
      |    sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS qty100
      |  FROM lineitem GROUP BY 1)
      |ORDER BY day""".stripMargin

  // ------------------------------------------------------------- q_bollinger
  /** 7-day Bollinger bands over daily order revenue: rolling mean ± 2
    * population std-devs, the volatility envelope read before calling any
    * daily move anomalous (the windowed companion to [[Stats]]' global
    * outlier fences). The fact scan collapses to the O(days) daily series
    * first; the rolling frame (6 preceding + current) then runs on the
    * aggregate. Sums stay exact (cents and cents² in DECIMAL(38,0));
    * mean/σ appear only in the final closed form — σ² = (n·Σx² − (Σx)²)/n²
    * — identically parenthesized in the oracle and rounded at the
    * projection. */
  def qBollinger(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .groupBy($"o_orderdate".as("day"))
      .agg(sum((OP.dec2($"o_totalprice") * 100).cast("long")).as("x"))
      .select($"day",
        $"x".cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("x"))
    val w = Window.orderBy($"day").rowsBetween(-6, Window.currentRow)
    daily
      .select($"day",
        count(lit(1)).over(w).cast("double").as("n"),
        sum($"x").over(w).cast("double").as("sx"),
        sum($"x" * $"x").over(w).cast("double").as("sxx"))
      .select($"day", $"n".cast("long").as("n7"),
        round($"sx" / $"n" / 100, 4).as("mean7"),
        round(($"sx" / $"n" +
          lit(2) * sqrt(($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * $"n")))
          / 100, 4).as("upper"),
        round(($"sx" / $"n" -
          lit(2) * sqrt(($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * $"n")))
          / 100, 4).as("lower"))
      .orderBy($"day")
  }

  private val qBollingerSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS HUGEINT) AS x
      |  FROM orders GROUP BY 1),
      |roll AS (
      |  SELECT day,
      |    CAST(count(*) OVER w AS DOUBLE) AS n,
      |    CAST(sum(x) OVER w AS DOUBLE) AS sx,
      |    CAST(sum(x * x) OVER w AS DOUBLE) AS sxx
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT day, CAST(n AS BIGINT) AS n7,
      |  round(sx / n / 100, 4) AS mean7,
      |  round((sx / n + 2 * sqrt((n * sxx - sx * sx) / (n * n))) / 100, 4)
      |    AS upper,
      |  round((sx / n - 2 * sqrt((n * sxx - sx * sx) / (n * n))) / 100, 4)
      |    AS lower
      |FROM roll ORDER BY day""".stripMargin

  // ------------------------------------------------------------------- q_sax
  /** SAX (symbolic aggregate approximation) of the last 56 days of daily
    * revenue: 8 seven-day PAA segments, z-normalized against the 56-day
    * window, mapped to a 4-symbol alphabet at the Gaussian quartile
    * breakpoints ±0.6745 and 0 — the discretization that turns a series
    * into a string for motif/novelty search (the time-series analogue of
    * [[TextDedup]]'s shingles). Segment sums and the window moments are
    * exact cents; the z-score and breakpoints compare in doubles computed
    * by one identically-parenthesized formula in both engines. The whole
    * computation runs on the O(days) aggregate. */
  def qSax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .groupBy($"o_orderdate".as("day"))
      .agg(sum((OP.dec2($"o_totalprice") * 100).cast("long")).as("x"))
    val maxD = daily.agg(max($"day").as("max_day"))
    val tail = daily.crossJoin(broadcast(maxD))
      .filter($"day" >= date_sub($"max_day", 55))
      .withColumn("seg",
        floor(datediff($"max_day", $"day") / 7).cast("int"))
      .withColumn("xd",
        $"x".cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val moments = tail.agg(
      count(lit(1)).cast("double").as("n"),
      sum($"xd").cast("double").as("sx"),
      sum($"xd" * $"xd").cast("double").as("sxx"))
    tail
      .groupBy($"seg")
      .agg(count(lit(1)).cast("double").as("m"),
        sum($"xd").cast("double").as("sseg"))
      .crossJoin(broadcast(moments))
      .withColumn("z",
        ($"sseg" / $"m" - $"sx" / $"n") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") / ($"n" * $"n")))
      .select((lit(7) - $"seg").as("segment"),
        round($"sseg" / $"m" / 100, 4).as("paa_mean"),
        when($"z" < -0.6745, "a").when($"z" < 0.0, "b")
          .when($"z" < 0.6745, "c").otherwise("d").as("symbol"))
      .orderBy($"segment")
  }

  private val qSaxSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS x
      |  FROM orders GROUP BY 1),
      |tail AS (
      |  SELECT day, CAST(x AS HUGEINT) AS xd,
      |    CAST(floor(date_diff('day', day,
      |      (SELECT max(day) FROM daily)) / 7) AS INT) AS seg
      |  FROM daily
      |  WHERE day >= (SELECT max(day) FROM daily) - INTERVAL 55 DAY),
      |mom AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(xd) AS DOUBLE) AS sx,
      |    CAST(sum(xd * xd) AS DOUBLE) AS sxx
      |  FROM tail),
      |segs AS (
      |  SELECT seg, CAST(count(*) AS DOUBLE) AS m,
      |    CAST(sum(xd) AS DOUBLE) AS sseg
      |  FROM tail GROUP BY seg),
      |z AS (
      |  SELECT seg, m, sseg,
      |    (sseg / m - sx / n) / sqrt((n * sxx - sx * sx) / (n * n)) AS z
      |  FROM segs, mom)
      |SELECT 7 - seg AS segment,
      |  round(sseg / m / 100, 4) AS paa_mean,
      |  CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
      |       WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS symbol
      |FROM z ORDER BY segment""".stripMargin

  // ------------------------------------------------------- q_changepoint
  /** Depth-2 binary-segmentation changepoint detection on the daily
    * revenue series: the level-1 split point is the day maximizing the
    * scaled CUSUM statistic |n·C_t − t·T| (C_t = running sum, T = total —
    * the mean-shift statistic kept as an EXACT integer by scaling with n
    * instead of dividing), then each side is re-segmented once by the
    * same rule — three rows: where the series breaks, and where each
    * half breaks. The monitoring primitive behind [[qCusum]]'s alarm:
    * CUSUM says "drifted", this says WHEN.
    *
    * Engine parity: everything is BIGINT (cents, counts, products
    * n·C ≲ 10¹⁶); argmax tiebreak is (stat DESC, day) — total. Segment
    * means use truncating integer division.
    *
    * Scale shape: the fact collapses to O(days) first; both passes are
    * windows over that aggregate (the global window is dim-sized by
    * construction). The 1-row level-1 split broadcasts back. */
  def qChangepoint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Inference.dailyRevenue(s, dir)
    val wd = Window.orderBy($"day")
    val cum = daily
      .withColumn("rn", row_number().over(wd).cast("long"))
      .withColumn("c", sum($"x").over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.agg(max($"rn").as("n"), sum($"x").as("t"))
    val scored = cum.crossJoin(broadcast(tot))
      .filter($"rn" < $"n")
      .withColumn("s", abs($"n" * $"c" - $"rn" * $"t"))
    // ONE argmax pipeline; lvl1 and the level-2 split key both read off
    // it (two identical copies risked tiebreak drift — review finding)
    val picked = scored
      .withColumn("pick", row_number().over(
        Window.orderBy($"s".desc, $"day")))
      .filter($"pick" === 1)
    val lvl1 = picked
      .select(lit("all").as("segment"), $"day".as("change_day"), $"s".as("stat"),
        $"n".as("n_days"), expr("c div rn").as("mean_before_c"),
        expr("(t - c) div (n - rn)").as("mean_after_c"))
    val tau = picked.select($"rn".as("tau_rn"))
    val wSeg = Window.partitionBy($"seg").orderBy($"day")
    val seg = cum.crossJoin(broadcast(tau))
      .withColumn("seg", when($"rn" <= $"tau_rn", "pre").otherwise("post"))
      .withColumn("rn2", row_number().over(wSeg).cast("long"))
      .withColumn("c2", sum($"x").over(
        wSeg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nseg", count(lit(1)).over(Window.partitionBy($"seg")))
      .withColumn("tseg", sum($"x").over(Window.partitionBy($"seg")))
      .filter($"rn2" < $"nseg")
      .withColumn("s", abs($"nseg" * $"c2" - $"rn2" * $"tseg"))
      .withColumn("pick", row_number().over(
        Window.partitionBy($"seg").orderBy($"s".desc, $"day")))
      .filter($"pick" === 1)
      .select($"seg".as("segment"), $"day".as("change_day"), $"s".as("stat"),
        $"nseg".as("n_days"), expr("c2 div rn2").as("mean_before_c"),
        expr("(tseg - c2) div (nseg - rn2)").as("mean_after_c"))
    lvl1.unionAll(seg).orderBy($"segment")
  }

  private val qChangepointSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |cum AS (
      |  SELECT day, x,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
      |    CAST(sum(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS c
      |  FROM daily),
      |tot AS (
      |  SELECT max(rn) AS n, CAST(sum(x) AS BIGINT) AS t FROM cum),
      |scored AS (
      |  SELECT day, rn, c, n, t, abs(n * c - rn * t) AS s
      |  FROM cum, tot WHERE rn < n),
      |lvl1 AS (
      |  SELECT 'all' AS segment, day AS change_day, s AS stat,
      |    n AS n_days, c // rn AS mean_before_c,
      |    (t - c) // (n - rn) AS mean_after_c
      |  FROM scored ORDER BY s DESC, day LIMIT 1),
      |tau AS (SELECT rn AS tau_rn FROM scored ORDER BY s DESC, day LIMIT 1),
      |seg0 AS (
      |  SELECT day, x, CASE WHEN rn <= tau_rn THEN 'pre' ELSE 'post' END
      |    AS seg
      |  FROM cum, tau),
      |segc AS (
      |  SELECT day, seg,
      |    CAST(row_number() OVER (PARTITION BY seg ORDER BY day) AS BIGINT)
      |      AS rn2,
      |    CAST(sum(x) OVER (PARTITION BY seg ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2,
      |    CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS nseg,
      |    CAST(sum(x) OVER (PARTITION BY seg) AS BIGINT) AS tseg
      |  FROM seg0),
      |seg AS (
      |  SELECT segment, change_day, stat, n_days, mean_before_c,
      |    mean_after_c
      |  FROM (
      |    SELECT seg AS segment, day AS change_day,
      |      abs(nseg * c2 - rn2 * tseg) AS stat, nseg AS n_days,
      |      c2 // rn2 AS mean_before_c,
      |      (tseg - c2) // (nseg - rn2) AS mean_after_c,
      |      row_number() OVER (PARTITION BY seg
      |        ORDER BY abs(nseg * c2 - rn2 * tseg) DESC, day) AS pick
      |    FROM segc WHERE rn2 < nseg)
      |  WHERE pick = 1)
      |SELECT * FROM (SELECT * FROM lvl1 UNION ALL SELECT * FROM seg)
      |ORDER BY segment""".stripMargin

  // -------------------------------------------------- q_seasonal_backtest
  /** Forecast backtest of two baseline models over the daily revenue
    * series — naive-1 (yesterday's value) vs seasonal-naive-7 (same value
    * a week of OBSERVED days ago): per model, days evaluated, total
    * absolute error, MAE, and MAPE in exact ppm. The model-selection
    * read-out that justifies (or kills) the weekly-seasonality assumption
    * [[qStlDecompose]] bakes in: if seasonal-naive doesn't beat naive-1,
    * there is no week to model.
    *
    * Engine parity: errors are exact integer cents; per-day APE is a
    * truncating integer division to ppm BEFORE summing (exact, order-
    * free); MAE is one IEEE division at the end. Both models evaluate on
    * the same day set (where the 7-lag exists) so the comparison is
    * apples-to-apples.
    *
    * Scale shape: O(days) aggregate first; two lags ride one dim-sized
    * window; the rollup is a 2-row aggregate. */
  def qSeasonalBacktest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wd = Window.orderBy($"day")
    val lagged = Inference.dailyRevenue(s, dir)
      .withColumn("l1", lag($"x", 1).over(wd))
      .withColumn("l7", lag($"x", 7).over(wd))
      .filter($"l7".isNotNull)
    def model(name: String, pred: org.apache.spark.sql.Column) =
      lagged.agg(
        count(lit(1)).as("n_days"),
        sum(abs($"x" - pred)).as("total_abs_err_c"),
        expr(s"sum(abs(x - ${name}) * 1000000 div x)").as("ape_sum"))
        .select(lit(if (name == "l1") "naive_1" else "seasonal_7")
            .as("model"),
          $"n_days", $"total_abs_err_c",
          ($"total_abs_err_c".cast("double") / $"n_days").as("mae_c"),
          expr("ape_sum div n_days").as("mape_ppm"))
    model("l1", $"l1").unionAll(model("l7", $"l7")).orderBy($"model")
  }

  private val qSeasonalBacktestSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |lagged AS (
      |  SELECT day, x,
      |    lag(x, 1) OVER (ORDER BY day) AS l1,
      |    lag(x, 7) OVER (ORDER BY day) AS l7
      |  FROM daily),
      |ev AS (SELECT * FROM lagged WHERE l7 IS NOT NULL),
      |m1 AS (
      |  SELECT 'naive_1' AS model, count(*) AS n_days,
      |    CAST(sum(abs(x - l1)) AS BIGINT) AS total_abs_err_c,
      |    CAST(sum(abs(x - l1) * 1000000 // x) AS BIGINT) AS ape_sum
      |  FROM ev),
      |m7 AS (
      |  SELECT 'seasonal_7' AS model, count(*) AS n_days,
      |    CAST(sum(abs(x - l7)) AS BIGINT) AS total_abs_err_c,
      |    CAST(sum(abs(x - l7) * 1000000 // x) AS BIGINT) AS ape_sum
      |  FROM ev)
      |SELECT model, n_days, total_abs_err_c,
      |  CAST(total_abs_err_c AS DOUBLE) / n_days AS mae_c,
      |  ape_sum // n_days AS mape_ppm
      |FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m7)
      |ORDER BY model""".stripMargin

  // ------------------------------------------------------- q_rolling_corr
  /** 30-day rolling Pearson correlation between daily CLICK volume and
    * daily PURCHASE revenue — the engagement-to-spend coupling monitor
    * (when does browsing stop converting?), reported for the final 60
    * days. A single global corr ([[graft.queries.Stats]] corr-matrix)
    * hides regime changes; the rolling window shows them.
    *
    * Engine parity: both daily series are exact integer cents; all
    * rolling sums (Σx, Σy, Σx², Σy², Σxy) ride ONE ordered window as
    * exact DECIMAL(38) accumulations; each day's correlation is a
    * single IEEE closed form over them, identically parenthesized, and
    * days with an undefined denominator emit null on both engines.
    *
    * Scale shape: two fact scans collapse to O(days) each, one keyed
    * join, one dim-sized ordered window. */
  def qRollingCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ev = Tables.events(s, dir)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy(expr("cast(ts as date)").as("day"))
      .agg(count(lit(1)).cast(dec).as("xo"))
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy(expr("cast(ts as date)").as("day"))
      .agg(sum((OP.dec2($"value") * 100).cast("long")).cast(dec).as("xe"))
    val joined = clicks.join(purchases, Seq("day"))
    val w = Window.orderBy($"day").rowsBetween(-29, 0)
    val rolled = joined
      .withColumn("n", count(lit(1)).over(w).cast("double"))
      .withColumn("sx", sum($"xo").over(w).cast("double"))
      .withColumn("sy", sum($"xe").over(w).cast("double"))
      .withColumn("qx", sum($"xo" * $"xo").over(w).cast("double"))
      .withColumn("qy", sum($"xe" * $"xe").over(w).cast("double"))
      .withColumn("sxy", sum($"xo" * $"xe").over(w).cast("double"))
    val mx = joined.agg(max($"day").as("mx"))
    rolled.crossJoin(broadcast(mx))
      .filter($"day" > date_sub($"mx", 60) && $"n" >= 10)
      .select($"day", $"n".cast("long").as("n_window"),
        round(($"n" * $"sxy" - $"sx" * $"sy")
          / (sqrt($"n" * $"qx" - $"sx" * $"sx")
            * sqrt($"n" * $"qy" - $"sy" * $"sy")), 6).as("corr"))
      .orderBy($"day")
  }

  private val qRollingCorrSql =
    """WITH c AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(count(*) AS HUGEINT) AS xo
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |e AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS HUGEINT) AS xe
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |j AS (SELECT c.day, xo, xe FROM c JOIN e USING (day)),
      |r AS (
      |  SELECT day,
      |    CAST(count(*) OVER w AS DOUBLE) AS n,
      |    CAST(sum(xo) OVER w AS DOUBLE) AS sx,
      |    CAST(sum(xe) OVER w AS DOUBLE) AS sy,
      |    CAST(sum(xo * xo) OVER w AS DOUBLE) AS qx,
      |    CAST(sum(xe * xe) OVER w AS DOUBLE) AS qy,
      |    CAST(sum(xo * xe) OVER w AS DOUBLE) AS sxy
      |  FROM j
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 29 PRECEDING
      |               AND CURRENT ROW)),
      |mx AS (SELECT max(day) AS mx FROM j)
      |SELECT day, CAST(n AS BIGINT) AS n_window,
      |  round((n * sxy - sx * sy)
      |    / (sqrt(n * qx - sx * sx) * sqrt(n * qy - sy * sy)), 6) AS corr
      |FROM r, mx WHERE day > mx - 60 AND n >= 10
      |ORDER BY day""".stripMargin

  // ----------------------------------------------------------- q_drawdown
  /** Maximum drawdown of the daily-revenue series: the worst
    * peak-to-trough decline — for each day, the gap to the running
    * historical peak; the day with the widest gap is the trough, and
    * its peak is recovered by a second pass over the O(days) aggregate
    * (the financial-risk read-out that a mean/σ summary hides: two
    * series with equal variance can have wildly different worst runs).
    * Emits the peak/trough days, the drawdown in exact cents, and its
    * ppm of the peak (truncating integer division).
    *
    * Scale shape: O(days) aggregate, two running-max windows over it,
    * one argmax — everything dim-sized. */
  def qDrawdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wRun = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = Inference.dailyRevenue(s, dir)
      .withColumn("peak", max($"x").over(wRun))
      .withColumn("dd", $"peak" - $"x")
    val trough = dd
      .withColumn("pick", row_number().over(
        Window.orderBy($"dd".desc, $"day")))
      .filter($"pick" === 1)
      .select($"day".as("trough_day"), $"x".as("trough_c"),
        $"peak".as("peak_c"), $"dd".as("drawdown_c"))
    // the peak day: earliest day attaining the trough's peak value
    val peakDay = dd.join(broadcast(trough), $"x" === $"peak_c")
      .agg(min($"day").as("peak_day"))
    trough.crossJoin(broadcast(peakDay))
      .select($"peak_day", $"trough_day", $"peak_c", $"trough_c",
        $"drawdown_c",
        expr("(drawdown_c * 1000000) div peak_c").as("drawdown_ppm"))
  }

  private val qDrawdownSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |dd AS (
      |  SELECT day, x,
      |    CAST(max(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) AS peak,
      |    CAST(max(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |      AS BIGINT) - x AS dd
      |  FROM daily),
      |trough AS (
      |  SELECT day AS trough_day, x AS trough_c, peak AS peak_c,
      |    dd AS drawdown_c
      |  FROM dd ORDER BY dd DESC, day LIMIT 1),
      |pk AS (
      |  SELECT min(dd.day) AS peak_day
      |  FROM dd, trough WHERE dd.x = trough.peak_c)
      |SELECT peak_day, trough_day, peak_c, trough_c, drawdown_c,
      |  (drawdown_c * 1000000) // peak_c AS drawdown_ppm
      |FROM trough, pk""".stripMargin

  // --------------------------------------------------- q_seasonal_strength
  /** Trend/seasonality strength of the daily-revenue series, read off the
    * [[qStlDecompose]] parts (Hyndman's F-measures): F_seasonal =
    * max(0, 1 − Var(R)/Var(S+R)) and F_trend = max(0, 1 − Var(R)/Var(T+R))
    * — the two numbers that say whether the weekly rhythm and the level
    * drift are real structure or noise, gating whether [[qStlDecompose]]'s
    * components deserve downstream weight at all.
    *
    * Engine parity: the decomposition parts are already exact integer
    * cents; variances come from exact DECIMAL(38) moment sums; the two
    * F ratios are single IEEE closed forms rounded at the projection.
    * O(days) everything. */
  def qSeasonalStrength(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = qStlDecompose(s, dir)
      .filter($"remainder".isNotNull)
      .select($"trend".cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("t"),
        $"seasonal".cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("sc"),
        $"remainder".cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("r"))
    def varOf(n: org.apache.spark.sql.Column, sumC: org.apache.spark.sql.Column,
        sumSq: org.apache.spark.sql.Column) =
      (n * sumSq - sumC * sumC) / (n * (n - lit(1.0d)))
    parts.agg(
        count(lit(1)).cast("double").as("n"),
        sum($"r").cast("double").as("sr"),
        sum($"r" * $"r").cast("double").as("qr"),
        sum($"sc" + $"r").cast("double").as("ssr"),
        sum(($"sc" + $"r") * ($"sc" + $"r")).cast("double").as("qsr"),
        sum($"t" + $"r").cast("double").as("str"),
        sum(($"t" + $"r") * ($"t" + $"r")).cast("double").as("qtr"))
      .select($"n".cast("long").as("n_days"),
        round(greatest(lit(0.0d),
          lit(1.0d) - varOf($"n", $"sr", $"qr")
            / varOf($"n", $"ssr", $"qsr")), 6).as("f_seasonal"),
        round(greatest(lit(0.0d),
          lit(1.0d) - varOf($"n", $"sr", $"qr")
            / varOf($"n", $"str", $"qtr")), 6).as("f_trend"))
  }

  private val qSeasonalStrengthSql =
    s"""WITH stl AS (
       |${qStlDecomposeSql.replace("ORDER BY t.day", "")}),
       |p AS (
       |  SELECT CAST(trend AS HUGEINT) AS t,
       |    CAST(seasonal AS HUGEINT) AS sc,
       |    CAST(remainder AS HUGEINT) AS r
       |  FROM stl WHERE remainder IS NOT NULL),
       |m AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(r) AS DOUBLE) AS sr,
       |    CAST(sum(r * r) AS DOUBLE) AS qr,
       |    CAST(sum(sc + r) AS DOUBLE) AS ssr,
       |    CAST(sum((sc + r) * (sc + r)) AS DOUBLE) AS qsr,
       |    CAST(sum(t + r) AS DOUBLE) AS str,
       |    CAST(sum((t + r) * (t + r)) AS DOUBLE) AS qtr
       |  FROM p)
       |SELECT CAST(n AS BIGINT) AS n_days,
       |  round(greatest(0.0, 1.0 - ((n * qr - sr * sr) / (n * (n - 1.0)))
       |    / ((n * qsr - ssr * ssr) / (n * (n - 1.0)))), 6) AS f_seasonal,
       |  round(greatest(0.0, 1.0 - ((n * qr - sr * sr) / (n * (n - 1.0)))
       |    / ((n * qtr - str * str) / (n * (n - 1.0)))), 6) AS f_trend
       |FROM m""".stripMargin

  // -------------------------------------------------------------- q_motif
  /** Top-5 recurring weekly motifs in the daily-revenue series — the
    * matrix-profile question ("which two non-overlapping weeks look most
    * alike?") answered exactly: every 7-day window is a vector of
    * integer cents (6 leads off one ordered pass), and all
    * non-overlapping window pairs are scored by exact integer squared
    * Euclidean distance in DECIMAL(38) (cent diffs square past int64 at
    * scale). The shape-mining complement of [[qSax]]'s symbolic
    * compression: SAX finds approximate families, this certifies the
    * exact closest pairs.
    *
    * Scale shape: the fact collapses to O(days) first; the pair join is
    * the O(days²) diagnostic over that bounded aggregate (2.9M pairs at
    * 6.5 years — priced like q_prefix_join, deliberately exact; the
    * scale path for long series is SAX-bucket candidates + this verify
    * on the candidates). */
  def qMotif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wd = Window.orderBy($"day")
    val vecs = Inference.dailyRevenue(s, dir)
      .withColumn("rn", row_number().over(wd).cast("long"))
    val withLeads = (1 to 6).foldLeft(vecs) { (df, k) =>
      df.withColumn(s"x$k", lead($"x", k).over(wd))
    }.filter($"x6".isNotNull)
      // window vector built ONCE per row (not per pair) so the scoring
      // side of the O(days²) join is a single kernel call
      .withColumn("v", array(($"x" +: (1 to 6).map(k => col(s"x$k"))): _*))
    // exact integer distance through the dec_sqdist codegen kernel (r14
    // optimization round): the previous 7-term decimal expression ran
    // ~60M BigDecimal subtract/multiply/adds across the 2.9M pairs —
    // the kernel accumulates the identical value in 128-bit integer
    // arithmetic and converts once (same DECIMAL(38,0) output, same
    // null-on-overflow contract; measured 5.2 → 1.3 s at sf0.1)
    withLeads.as("a").join(withLeads.as("b"),
        expr("b.rn >= a.rn + 7")) // non-overlapping, each pair once
      .select($"a.day".as("day_a"), $"b.day".as("day_b"),
        expr("dec_sqdist(a.v, b.v)").as("d2"))
      .orderBy($"d2", $"day_a", $"day_b")
      .limit(5)
      .select($"day_a", $"day_b", $"d2".cast("long").as("dist2_c"))
  }

  private val qMotifSql = {
    val sq = "(CAST(a.x AS HUGEINT) - b.x) * (CAST(a.x AS HUGEINT) - b.x)" +
      (1 to 6).map(k =>
        s" + (CAST(a.x$k AS HUGEINT) - b.x$k)" +
          s" * (CAST(a.x$k AS HUGEINT) - b.x$k)").mkString
    s"""WITH daily AS (
       |  SELECT o_orderdate AS day,
       |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
       |      AS BIGINT)) AS BIGINT) AS x
       |  FROM orders GROUP BY 1),
       |v AS (
       |  SELECT day, x,
       |    ${(1 to 6).map(k =>
            s"lead(x, $k) OVER (ORDER BY day) AS x$k").mkString(", ")},
       |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
       |  FROM daily),
       |w AS (SELECT * FROM v WHERE x6 IS NOT NULL)
       |SELECT a.day AS day_a, b.day AS day_b,
       |  CAST($sq AS BIGINT) AS dist2_c
       |FROM w a JOIN w b ON b.rn >= a.rn + 7
       |ORDER BY $sq, day_a, day_b LIMIT 5""".stripMargin
  }

  // ---------------------------------------------------- q_robust_anomaly
  /** Robust seasonal anomaly days: daily revenue compared against its
    * day-of-week cohort by MEDIAN and MAD (median absolute deviation) —
    * the outlier detector that, unlike q_anomaly_days' mean/σ z-score,
    * is not dragged by the very outliers it hunts, and unlike a global
    * median knows Mondays from Sundays. A day flags when
    * |x − med_dow| > 3·1.4826·MAD_dow, evaluated as the EXACT integer
    * compare |x−med|·10000 > 44478·MAD (3×1.4826 = 4.4478 exactly at
    * 4 dp) — no doubles anywhere.
    *
    * Both medians are lower-median order statistics (k = (n+1) div 2)
    * per DOW cohort — exact stored values, the [[Stats.qExactMedian]]
    * convention. Scale shape: O(days) aggregate first; every window is
    * DOW-partitioned over that aggregate. Output: the flagged days with
    * their deviation ratio in exact tenths-of-MAD. */
  def qRobustAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Inference.dailyRevenue(s, dir)
      .withColumn("dow", expr("datediff(day, DATE '1970-01-01') % 7"))
    val wRank = Window.partitionBy($"dow").orderBy($"x")
    val med = daily
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"dow")))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"dow", $"x".as("med"))
    val dev = daily.join(broadcast(med), Seq("dow"))
      .withColumn("ad", abs($"x" - $"med"))
    val wAd = Window.partitionBy($"dow").orderBy($"ad")
    val mad = dev
      .withColumn("rn", row_number().over(wAd))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"dow")))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"dow", $"ad".as("mad"))
    dev.join(broadcast(mad), Seq("dow"))
      .filter($"ad" * 10000 > $"mad" * 44478)
      .select($"day", $"dow", $"x", $"med", $"mad",
        // greatest(mad,1): a zero MAD (constant cohort) would make the
        // ratio a division by zero — DuckDB errors where Spark nulls
        expr("(ad * 10) div greatest(mad, 1)").as("dev_tenths_of_mad"))
      .orderBy($"day")
  }

  private val qRobustAnomalySql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS x,
      |    datediff('day', DATE '1970-01-01', o_orderdate) % 7 AS dow
      |  FROM orders GROUP BY 1, 3),
      |med AS (
      |  SELECT dow, x AS med FROM (
      |    SELECT dow, x,
      |      row_number() OVER (PARTITION BY dow ORDER BY x) AS rn,
      |      count(*) OVER (PARTITION BY dow) AS n
      |    FROM daily)
      |  WHERE rn = (n + 1) // 2),
      |dev AS (
      |  SELECT d.day, d.dow, d.x, m.med, abs(d.x - m.med) AS ad
      |  FROM daily d JOIN med m USING (dow)),
      |mad AS (
      |  SELECT dow, ad AS mad FROM (
      |    SELECT dow, ad,
      |      row_number() OVER (PARTITION BY dow ORDER BY ad) AS rn,
      |      count(*) OVER (PARTITION BY dow) AS n
      |    FROM dev)
      |  WHERE rn = (n + 1) // 2)
      |SELECT day, dev.dow, x, med, mad.mad,
      |  (ad * 10) // greatest(mad.mad, 1) AS dev_tenths_of_mad
      |FROM dev JOIN mad USING (dow)
      |WHERE ad * 10000 > mad.mad * 44478
      |ORDER BY day""".stripMargin

  // --------------------------------------------------------- q_burstiness
  /** Burstiest users by the Fano factor of their daily event counts
    * (variance-to-mean ratio over the user's OBSERVED active days —
    * Poisson arrivals give ≈1, batch/bot-like schedules ≫1): the
    * behavioral-shape flag that rate limits and bot heuristics key on,
    * invisible to total-volume rankings. Top-20 among users active ≥ 10
    * days, exact end to end: the Fano factor is emitted in micro-units
    * via ONE truncating integer division of exact count moments —
    * ((n·Σc² − (Σc)²)·10⁶) div ((n−1)·Σc) — no doubles anywhere.
    *
    * Scale shape: one map-side-combinable (user, day) count, one user
    * rollup, TakeOrderedAndProject top-20. */
  def qBurstiness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"user_id", expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_days"), sum($"c").as("s"),
        sum($"c" * $"c").as("q"))
      // >= 10 observed days: enough for a stable Fano factor and
      // non-vacuous at the smallest test scale (sf0.001 max is 28 days)
      .filter($"n_days" >= 10)
      .select($"user_id", $"n_days", $"s".as("n_events"),
        expr("((n_days * q - s * s) * 1000000) div ((n_days - 1) * s)")
          .as("fano_micro"))
      .orderBy($"fano_micro".desc, $"user_id")
      .limit(20)
  }

  private val qBurstinessSql =
    """WITH dc AS (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |u AS (
      |  SELECT user_id, count(*) AS n_days,
      |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
      |  FROM dc GROUP BY 1)
      |SELECT user_id, n_days, s AS n_events,
      |  ((n_days * q - s * s) * 1000000) // ((n_days - 1) * s)
      |    AS fano_micro
      |FROM u WHERE n_days >= 10
      |ORDER BY fano_micro DESC, user_id LIMIT 20""".stripMargin

  // ----------------------------------------------------------- q_periodogram
  /** Discrete-Fourier periodogram of the daily-revenue series at candidate
    * periods 2..14 days — the spectral read-out that DETECTS the weekly
    * cycle [[qSeasonal]]/[[qStlDecompose]] assume: power(p) peaks at
    * p = 7 when a 7-day rhythm is real. For each period p, R = Σ_t x_t·
    * cos(2πt/p), I = Σ_t x_t·sin(2πt/p), power = the amplitude closed
    * form.
    *
    * Engine parity (the q_theil_index transcendental discipline, applied
    * to trig): the ONE libm call per term — cos/sin of identically-
    * parenthesized (2·π·t)/p — is rounded to 6 dp before multiplying the
    * exact cents, and each product rounds to an exact integer term, so
    * both sums are order-independent BIGINT arithmetic; the final power
    * is one identically-parenthesized IEEE expression.
    *
    * Scale shape: the fact collapses to the O(days) aggregate first; the
    * 13-period fan-out is a broadcast crossJoin over that bounded series;
    * sums are map-side-combinable — no windows at all. */
  def qPeriodogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Inference.dailyRevenue(s, dir)
    val mn = daily.agg(min($"day").as("d0"), count(lit(1)).as("n"))
    val periods = s.range(2, 15).select($"id".cast("int").as("period"))
    val theta = lit(2.0d) * lit(math.Pi) * $"t" / $"period"
    daily.crossJoin(broadcast(mn))
      .withColumn("t", datediff($"day", $"d0"))
      .crossJoin(broadcast(periods))
      .select($"period", $"n", $"x",
        round($"x" * round(cos(theta), 6), 0).cast("long").as("tr"),
        round($"x" * round(sin(theta), 6), 0).cast("long").as("ti"))
      .groupBy($"period")
      .agg(max($"n").as("n_days"),
        sum($"tr").as("r_c"), sum($"ti").as("i_c"))
      .select($"period", $"n_days", $"r_c", $"i_c",
        round(
          ($"r_c".cast("double") / 100.0d / $"n_days") *
            ($"r_c".cast("double") / 100.0d / $"n_days") +
            ($"i_c".cast("double") / 100.0d / $"n_days") *
              ($"i_c".cast("double") / 100.0d / $"n_days"), 4)
          .as("power"))
      .orderBy($"period")
  }

  private val qPeriodogramSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS x
      |  FROM orders GROUP BY 1),
      |mn AS (SELECT min(day) AS d0, CAST(count(*) AS BIGINT) AS n
      |       FROM daily),
      |p AS (SELECT CAST(v AS INT) AS period FROM generate_series(2, 14) s(v)),
      |terms AS (
      |  SELECT period, n,
      |    CAST(round(x * round(cos((2.0 * pi() * date_diff('day', d0, day))
      |      / period), 6), 0) AS BIGINT) AS tr,
      |    CAST(round(x * round(sin((2.0 * pi() * date_diff('day', d0, day))
      |      / period), 6), 0) AS BIGINT) AS ti
      |  FROM daily CROSS JOIN mn CROSS JOIN p),
      |g AS (
      |  SELECT period, max(n) AS n_days,
      |    CAST(sum(tr) AS BIGINT) AS r_c, CAST(sum(ti) AS BIGINT) AS i_c
      |  FROM terms GROUP BY 1)
      |SELECT period, n_days, r_c, i_c,
      |  round((CAST(r_c AS DOUBLE) / 100.0 / n_days)
      |      * (CAST(r_c AS DOUBLE) / 100.0 / n_days)
      |    + (CAST(i_c AS DOUBLE) / 100.0 / n_days)
      |      * (CAST(i_c AS DOUBLE) / 100.0 / n_days), 4) AS power
      |FROM g ORDER BY period""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_periodogram"  -> (qPeriodogram _),
    "q_motif"        -> (qMotif _),
    "q_seasonal_strength" -> (qSeasonalStrength _),
    "q_drawdown"     -> (qDrawdown _),
    "q_rolling_corr" -> (qRollingCorr _),
    "q_burstiness"   -> (qBurstiness _),
    "q_robust_anomaly" -> (qRobustAnomaly _),
    "q_changepoint" -> (qChangepoint _),
    "q_seasonal_backtest" -> (qSeasonalBacktest _),
    "q_sax"            -> (qSax _),
    "q_vwap"           -> (qVwap _),
    "q_bollinger"      -> (qBollinger _),
    "q_stl_decompose"  -> (qStlDecompose _),
    "q_lateness"       -> (qLateness _),
    "q_cusum"          -> (qCusum _),
    "q_crosscorr"      -> (qCrosscorr _),
    "q_interval_merge" -> (qIntervalMerge _),
    "q_gaps_islands"   -> (qGapsIslands _),
    "q_freshness"      -> (qFreshness _),
    "q_twap"           -> (qTwap _),
    "q_seasonal"       -> (qSeasonal _),
    "q_window_distinct" -> (qWindowDistinct _),
    "q_rolling_median" -> (qRollingMedian _),
    "q_ohlc_bars"      -> (qOhlcBars _),
    "q_forward_fill"   -> (qForwardFill _),
    "q_cdc_apply"      -> (qCdcApply _),
    "q_ewma"           -> (qEwma _),
    "q_seq_mining"     -> (qSeqMining _),
    "q_feature_matrix" -> (qFeatureMatrix _),
    "q_forward_fill_dist" -> (qForwardFillDist _))

  val oracle: Map[String, String] = Map(
    "q_periodogram"  -> qPeriodogramSql,
    "q_motif"        -> qMotifSql,
    "q_seasonal_strength" -> qSeasonalStrengthSql,
    "q_drawdown"     -> qDrawdownSql,
    "q_rolling_corr" -> qRollingCorrSql,
    "q_burstiness"   -> qBurstinessSql,
    "q_robust_anomaly" -> qRobustAnomalySql,
    "q_changepoint" -> qChangepointSql,
    "q_seasonal_backtest" -> qSeasonalBacktestSql,
    "q_sax"            -> qSaxSql,
    "q_vwap"           -> qVwapSql,
    "q_bollinger"      -> qBollingerSql,
    "q_stl_decompose"  -> qStlDecomposeSql,
    "q_lateness"       -> qLatenessSql,
    "q_cusum"          -> qCusumSql,
    "q_crosscorr"      -> qCrosscorrSql,
    "q_interval_merge" -> qIntervalMergeSql,
    "q_gaps_islands"   -> qGapsIslandsSql,
    "q_freshness"      -> qFreshnessSql,
    "q_twap"           -> qTwapSql,
    "q_seasonal"       -> qSeasonalSql,
    "q_window_distinct" -> qWindowDistinctSql,
    "q_rolling_median" -> qRollingMedianSql,
    "q_ohlc_bars"      -> qOhlcBarsSql,
    "q_forward_fill"   -> qForwardFillSql,
    "q_cdc_apply"      -> qCdcApplySql,
    "q_ewma"           -> qEwmaSql,
    "q_seq_mining"     -> qSeqMiningSql,
    "q_feature_matrix" -> qFeatureMatrixSql,
    "q_forward_fill_dist" -> qForwardFillDistSql)
}
