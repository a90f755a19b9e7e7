package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Exact integer-cents view of a 2-decimal measure, wide enough that the
    * squared sums in [[exactMoments]] never overflow (mirrored as HUGEINT
    * in the oracles). */
  private def cents38(c: org.apache.spark.sql.Column) =
    (OP.dec2(c) * 100).cast(DecimalType(38, 0))

  /** Exact per-group moments (n, Σx, Σx²) over a frame carrying an
    * integer-cents `xc` column, emitted as doubles cast from the exact
    * sums — the single source for every downstream z²/variance/t²
    * expression (q_outliers, q_ab_test), so the arithmetic both engines
    * must replay bit-for-bit lives in one place. */
  private def exactMoments(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(
      count(lit(1)).cast("double").as("n_d"),
      sum(col("xc")).cast("double").as("s_d"),
      sum(col("xc") * col("xc")).cast("double").as("q_d"))

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
      .select($"event_id", $"event_type", cents38($"value").as("xc"))
    val stats = exactMoments(ev, "event_type")
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

  // ------------------------------------------------------------- q_autocorr
  /** Autocorrelation function of the daily revenue series at lags 1..7 —
    * the seasonality detector run before fitting any forecast (a weekly
    * cycle shows as a lag-7 peak). ACF here is the Pearson correlation of
    * the (day, day+k) revenue pairs, computed from six exact decimal sums
    * per lag (n, Σx, Σy, Σx², Σy², Σxy) exactly like [[qLinreg]]; the only
    * doubles are the final closed-form expression, identically
    * parenthesized in the oracle, rounded at the projection.
    *
    * Scale shape: the fact scan collapses to the O(days) daily aggregate
    * FIRST (one map-side-combinable shuffle); the ×7 lag fan-out and the
    * self-join run on the aggregate-sized series (broadcast), and the
    * per-lag sums are a second O(lags) aggregate. Nothing downstream of
    * the first groupBy touches fact volume. Reference kin: the per-month
    * expense trend view (/root/reference/04_KPI/KPIs.sql) — this is the
    * same series asked "does it repeat?". */
  def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .groupBy($"o_orderdate".as("day"))
      .agg(sum((OP.dec2($"o_totalprice") * 100).cast("long")).as("x"))
    val lagged = daily
      .select($"day", $"x", explode(array((1 to 7).map(lit): _*)).as("lag"))
      .withColumn("probe_day", expr("date_add(day, lag)"))
    val pairs = lagged.alias("a")
      .join(broadcast(daily.alias("b")), $"a.probe_day" === $"b.day")
      .select($"a.lag".as("lag"),
        $"a.x".cast(DecimalType(38, 0)).as("x"),
        $"b.x".cast(DecimalType(38, 0)).as("y"))
    pairs.groupBy($"lag")
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"x").cast("double").as("sx"),
        sum($"y").cast("double").as("sy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"y" * $"y").cast("double").as("syy"),
        sum($"x" * $"y").cast("double").as("sxy"))
      .select($"lag", $"n".cast("long").as("n_pairs"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy")), 6).as("acf"))
      .orderBy($"lag")
  }

  private val qAutocorrSql =
    """WITH daily AS (
      |  SELECT o_orderdate AS day,
      |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS x
      |  FROM orders GROUP BY 1),
      |lags AS (SELECT CAST(v AS INT) AS lag
      |         FROM generate_series(1, 7) s(v)),
      |pairs AS (
      |  SELECT l.lag, CAST(a.x AS HUGEINT) AS x, CAST(b.x AS HUGEINT) AS y
      |  FROM daily a CROSS JOIN lags l
      |  JOIN daily b ON b.day = a.day + to_days(l.lag)),
      |g AS (
      |  SELECT lag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx,
      |    CAST(sum(y) AS DOUBLE) AS sy,
      |    CAST(sum(x * x) AS DOUBLE) AS sxx,
      |    CAST(sum(y * y) AS DOUBLE) AS syy,
      |    CAST(sum(x * y) AS DOUBLE) AS sxy
      |  FROM pairs GROUP BY lag)
      |SELECT lag, CAST(n AS BIGINT) AS n_pairs,
      |  round((n * sxy - sx * sy) /
      |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
      |FROM g ORDER BY lag""".stripMargin

  // -------------------------------------------------------------- q_benford
  /** Benford first-digit audit of order totals — the classic fabricated-
    * data screen: natural multi-magnitude amounts follow
    * P(d) = log10(1 + 1/d); a flat or spiked distribution flags synthetic
    * or tampered figures. Emits observed vs expected proportion and the
    * absolute deviation per digit (TPC-H's uniform price generator is
    * expected to FAIL the law — the audit's value is the measured gap).
    *
    * Exactness: digit extraction is integer-cents string slicing (no
    * float log on the data path); the two proportions are each ONE double
    * division/log10 rounded at the projection, so both engines agree
    * bit-for-bit. Scale shape: one map-side-combinable 9-group aggregate
    * + a broadcast 1-row total — parquet-scan speed at any volume.
    * Reference kin: the expense-total views it would audit,
    * /root/reference/04_KPI/KPIs.sql. */
  def qBenford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val digits = Tables.orders(s, dir)
      .select((OP.dec2($"o_totalprice") * 100).cast("long").as("c"))
      .filter($"c" > 0)
      .select(substring($"c".cast("string"), 1, 1).cast("int").as("digit"))
    val counts = digits.groupBy($"digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .select($"digit", $"n",
        round($"n" / $"total", 6).as("observed_p"),
        round(log10(lit(1.0) + lit(1.0) / $"digit"), 6).as("benford_p"))
      .withColumn("abs_dev", round(abs($"observed_p" - $"benford_p"), 6))
      .orderBy($"digit")
  }

  private val qBenfordSql =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |                 AS BIGINT) AS c
      |        FROM orders) WHERE c > 0),
      |counts AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      |tot AS (SELECT count(*) AS total FROM d)
      |SELECT digit, n,
      |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS observed_p,
      |  round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
      |  round(abs(round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) -
      |            round(log10(1.0 + 1.0 / digit), 6)), 6) AS abs_dev
      |FROM counts CROSS JOIN tot ORDER BY digit""".stripMargin

  // -------------------------------------------------------------- q_skyline
  /** 2-D Pareto frontier (skyline) of parts on (retail price ↓, size ↓) via
    * the sort-based O(n log n) algorithm, not the O(n²) dominance
    * anti-join: a part survives iff no strictly-cheaper part has size ≤ its
    * size (running min over a strict RANGE frame) and it is the smallest
    * at its own price point (equal price + smaller size dominates; exact
    * duplicates are mutually non-dominating and both survive).
    *
    * The unpartitioned window is confined to the dim-sized part table —
    * the same budget rule as every other global window here; the
    * fact-sized variant is [[qSkylineFact]] (distributed prefix-min over
    * price bands, the q_pack_sequences shape). */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir)
      .select($"p_partkey", OP.dec2($"p_retailprice").as("price"), $"p_size")
      .withColumn("cents", ($"price" * 100).cast("long"))
    val wCheaper = Window.orderBy($"cents")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSamePrice = Window.partitionBy($"cents")
    p.withColumn("min_size_cheaper", min($"p_size").over(wCheaper))
      .withColumn("min_size_same", min($"p_size").over(wSamePrice))
      .filter(($"min_size_cheaper".isNull ||
          $"min_size_cheaper" > $"p_size") &&
        $"p_size" === $"min_size_same")
      .select($"p_partkey", $"price".cast("double").as("price"), $"p_size")
      .orderBy($"p_partkey")
  }

  private val qSkylineSql =
    """WITH p AS (
      |  SELECT p_partkey, CAST(p_retailprice AS DECIMAL(18,2)) AS price,
      |    p_size,
      |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM part),
      |marked AS (
      |  SELECT *,
      |    min(p_size) OVER (ORDER BY cents
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS min_size_cheaper,
      |    min(p_size) OVER (PARTITION BY cents) AS min_size_same
      |  FROM p)
      |SELECT p_partkey, CAST(price AS DOUBLE) AS price, p_size
      |FROM marked
      |WHERE (min_size_cheaper IS NULL OR min_size_cheaper > p_size)
      |  AND p_size = min_size_same
      |ORDER BY p_partkey""".stripMargin

  // --------------------------------------------------------- q_skyline_fact
  /** The FACT-scale skyline q_skyline's scaladoc promises: the 2-D Pareto
    * frontier of lineitem rows on (extended price ↓, quantity ↓), computed
    * as a DISTRIBUTED prefix-min instead of q_skyline's single global
    * RANGE window — the q_pack_sequences shape applied to dominance.
    *
    * Rows are value-bucketed into price bands (cents div 5·10⁵, ≈$5k — a
    * fixed-width map-side derivation, no sampling pass, so equal prices
    * are co-located by construction); each band computes its local
    * strictly-cheaper running min and its same-price min in ONE sort via
    * two RANGE frames over the same (band, price) window; and the
    * cross-band term is a per-band min aggregate turned into a prefix-min
    * offset table (≤ the band count in rows) broadcast back. One fact
    * shuffle on the band key, every window parallel across bands, and the
    * offset table stays driver-trivial at any scale — at 100 TB the band
    * width narrows so bands ≈ cluster parallelism, nothing else changes.
    * Output stays integer cents end-to-end (no float parity surface). */
  def qSkylineFact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val BandCents = 500000L // $5,000 price bands
    val li = Tables.lineitem(s, dir).select(
        $"l_orderkey", $"l_linenumber",
        (OP.dec2($"l_extendedprice") * 100).cast("long").as("price_c"),
        (OP.dec2($"l_quantity") * 100).cast("long").as("qty_c"))
      .withColumn("band", $"price_c".divide(lit(BandCents)).cast("long"))
    val wBand = Window.partitionBy($"band").orderBy($"price_c")
    val marked = li
      .withColumn("min_cheaper_local",
        min($"qty_c").over(wBand.rangeBetween(Window.unboundedPreceding, -1)))
      // RANGE frame (0,0) = all peer rows at the SAME price — the
      // equal-price minimum without a second shuffle on price_c
      .withColumn("min_same", min($"qty_c").over(wBand.rangeBetween(0, 0)))
    // prefix-min over strictly-earlier bands: band-count rows, broadcast
    val wOff = Window.orderBy($"band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = li.groupBy($"band").agg(min($"qty_c").as("bmin"))
      .withColumn("min_prev_bands", min($"bmin").over(wOff))
      .select($"band", $"min_prev_bands")
    marked.join(broadcast(offsets), Seq("band"))
      .withColumn("min_cheaper",
        least($"min_prev_bands", $"min_cheaper_local"))
      .filter(($"min_cheaper".isNull || $"min_cheaper" > $"qty_c") &&
        $"qty_c" === $"min_same")
      .select($"l_orderkey", $"l_linenumber", $"price_c", $"qty_c")
      .orderBy($"price_c", $"qty_c", $"l_orderkey", $"l_linenumber")
  }

  private val qSkylineFactSql =
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS price_c,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c
      |  FROM lineitem),
      |marked AS (
      |  SELECT *,
      |    min(qty_c) OVER (ORDER BY price_c
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS min_cheaper,
      |    min(qty_c) OVER (PARTITION BY price_c) AS min_same
      |  FROM li)
      |SELECT l_orderkey, l_linenumber, price_c, qty_c
      |FROM marked
      |WHERE (min_cheaper IS NULL OR min_cheaper > qty_c)
      |  AND qty_c = min_same
      |ORDER BY price_c, qty_c, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------- q_exact_median
  /** Exact per-group median WITHOUT holding values in aggregate state —
    * the scale path [[Analytics.qPercentile]]'s `percentile()` aggregate
    * doesn't have (its state is every value in the group; at fact scale
    * that's executor memory, not a plan). Two passes, textbook
    * order-statistic narrowing:
    *
    *   1. one map-side-combinable aggregate to (group, $100-price-band)
    *      counts — O(groups × bands) rows; a prefix-count window over that
    *      TINY table locates each group's median band and the rank still
    *      needed inside it;
    *   2. the fact scan re-filtered to median bands only (a broadcast join
    *      against the O(groups) band table — at 10⁹ rows/group the band
    *      holds ~1/1000th of them), ranked per group by value, and the
    *      needed-rank row picked.
    *
    * The selected VALUE is deterministic even with duplicate prices (rank
    * ties are value-identical). Lower median (k = (n+1) div 2), integer
    * cents. */
  def qExactMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val BandCents = 10000L
    val li = Tables.lineitem(s, dir).select(
      $"l_returnflag".as("flag"),
      (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("band", $"cents".divide(lit(BandCents)).cast("long"))
    val bands = li.groupBy($"flag", $"band").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"flag").orderBy($"band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val target = bands
      .withColumn("cum_before", coalesce(sum($"cnt").over(wCum), lit(0L)))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"flag")))
      .withColumn("k", ($"n" + 1).divide(lit(2)).cast("long"))
      .filter($"cum_before" < $"k" && $"cum_before" + $"cnt" >= $"k")
      .select($"flag", $"band", $"n", ($"k" - $"cum_before").as("need"))
    val wRank = Window.partitionBy($"flag").orderBy($"cents")
    li.join(broadcast(target), Seq("flag", "band"))
      .withColumn("rn", row_number().over(wRank))
      .filter($"rn" === $"need")
      .select($"flag", $"n", $"cents".as("median_c"))
      .orderBy($"flag")
  }

  private val qExactMedianSql =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |r AS (
      |  SELECT flag, cents,
      |    row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
      |    count(*) OVER (PARTITION BY flag) AS n
      |  FROM li)
      |SELECT flag, n, cents AS median_c
      |FROM r WHERE rn = (n + 1) // 2
      |ORDER BY flag""".stripMargin

  // ------------------------------------------------------------ q_equidepth
  /** Equi-depth (equal-frequency) decile boundaries per return flag — the
    * histogram that adapts to skew where [[qHistogram]]'s fixed-width bins
    * can't, and the exact twin of what `approxQuantile` estimates. Same
    * two-pass order-statistic machinery as [[qExactMedian]], generalized
    * to 9 target ranks per group (k_i = ceil(i·n/10)): pass 1 locates
    * each decile's $100 price band from the O(groups × bands) count
    * table; pass 2 re-scans only the located bands and ranks WITHIN each
    * (group, band, decile) partition — no value-holding aggregate state,
    * no single-partition sort, the rank window bounded to ~1/bands of the
    * group. Boundary VALUES are deterministic under rank ties (equal
    * cents). */
  def qEquidepth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val BandCents = 10000L
    val li = Tables.lineitem(s, dir).select(
      $"l_returnflag".as("flag"),
      (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
      .withColumn("band", $"cents".divide(lit(BandCents)).cast("long"))
    val bands = li.groupBy($"flag", $"band").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy($"flag").orderBy($"band")
      .rowsBetween(Window.unboundedPreceding, -1)
    val targets = bands
      .withColumn("cum_before", coalesce(sum($"cnt").over(wCum), lit(0L)))
      .withColumn("n", sum($"cnt").over(Window.partitionBy($"flag")))
      .select($"flag", $"band", $"cum_before", $"cnt", $"n",
        explode(array((1 to 9).map(lit): _*)).as("decile"))
      .withColumn("k",
        ($"decile" * $"n" + 9).divide(lit(10)).cast("long"))
      .filter($"cum_before" < $"k" && $"cum_before" + $"cnt" >= $"k")
      .select($"flag", $"band", $"decile", $"n",
        ($"k" - $"cum_before").as("need"))
    val wRank = Window.partitionBy($"flag", $"band", $"decile")
      .orderBy($"cents")
    li.join(broadcast(targets), Seq("flag", "band"))
      .withColumn("rn", row_number().over(wRank))
      .filter($"rn" === $"need")
      .select($"flag", $"decile", $"n", $"cents".as("boundary_c"))
      .orderBy($"flag", $"decile")
  }

  private val qEquidepthSql =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM lineitem),
      |r AS (
      |  SELECT flag, cents,
      |    row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
      |    count(*) OVER (PARTITION BY flag) AS n
      |  FROM li),
      |d AS (SELECT CAST(v AS INT) AS decile FROM generate_series(1, 9) s(v))
      |SELECT r.flag, d.decile, r.n, r.cents AS boundary_c
      |FROM r JOIN d ON r.rn = (d.decile * r.n + 9) // 10
      |ORDER BY flag, decile""".stripMargin

  // -------------------------------------------------------------- q_ab_test
  /** Pairwise Welch t² between event-type arms, entirely from the exact
    * per-arm moments (n, Σcents, Σcents²): one map-side-combinable
    * aggregation to 5 rows, then a broadcast self-join over the arm pairs.
    * t², the standard error and the Welch–Satterthwaite df are single
    * double expressions over the exact sums — identical parenthesization
    * both engines (t² is scale-invariant, so cents vs dollars cancels;
    * means are reported in dollars). */
  def qAbTest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = exactMoments(
        Tables.events(s, dir)
          .select($"event_type", cents38($"value").as("xc")),
        "event_type")
      .withColumn("m", $"s_d" / $"n_d")
      .withColumn("v",
        ($"n_d" * $"q_d" - $"s_d" * $"s_d") / ($"n_d" * ($"n_d" - 1.0d)))
    val a = g.select($"event_type".as("arm_a"), $"n_d".as("na"),
      $"m".as("ma"), $"v".as("va"))
    val b = g.select($"event_type".as("arm_b"), $"n_d".as("nb"),
      $"m".as("mb"), $"v".as("vb"))
    a.join(b, $"arm_a" < $"arm_b")
      .withColumn("se2", $"va" / $"na" + $"vb" / $"nb")
      .select($"arm_a", $"arm_b",
        $"na".cast("long").as("n_a"), $"nb".cast("long").as("n_b"),
        round($"ma" / 100.0d, 4).as("mean_a"),
        round($"mb" / 100.0d, 4).as("mean_b"),
        round((($"ma" - $"mb") * ($"ma" - $"mb")) / $"se2", 4).as("t2"),
        round(($"se2" * $"se2") /
          (($"va" / $"na") * ($"va" / $"na") / ($"na" - 1.0d) +
            ($"vb" / $"nb") * ($"vb" / $"nb") / ($"nb" - 1.0d)), 2)
          .as("welch_df"))
      .orderBy($"arm_a", $"arm_b")
  }

  private val qAbTestSql =
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(count(*) AS DOUBLE) AS n_d,
      |    CAST(sum(xc) AS DOUBLE) AS s_d,
      |    CAST(sum(xc * xc) AS DOUBLE) AS q_d
      |  FROM (SELECT event_type,
      |          CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      |            AS HUGEINT) AS xc
      |        FROM events)
      |  GROUP BY event_type),
      |gm AS (
      |  SELECT event_type, n_d, s_d / n_d AS m,
      |    (n_d * q_d - s_d * s_d) / (n_d * (n_d - 1.0)) AS v
      |  FROM g),
      |pairs AS (
      |  SELECT a.event_type AS arm_a, b.event_type AS arm_b,
      |    a.n_d AS na, b.n_d AS nb, a.m AS ma, b.m AS mb,
      |    a.v AS va, b.v AS vb,
      |    a.v / a.n_d + b.v / b.n_d AS se2
      |  FROM gm a JOIN gm b ON a.event_type < b.event_type)
      |SELECT arm_a, arm_b,
      |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  round(ma / 100.0, 4) AS mean_a,
      |  round(mb / 100.0, 4) AS mean_b,
      |  round(((ma - mb) * (ma - mb)) / se2, 4) AS t2,
      |  round((se2 * se2)
      |        / ((va / na) * (va / na) / (na - 1.0)
      |           + (vb / nb) * (vb / nb) / (nb - 1.0)), 2) AS welch_df
      |FROM pairs ORDER BY arm_a, arm_b""".stripMargin

  // ------------------------------------------------------------ q_dist_drift
  /** Distribution-drift monitor between two corpus halves (even vs odd doc
    * ids — stand-ins for "reference snapshot" and "current snapshot"):
    * equi-width length bins, per-bin share of each split, and a χ²-style
    * per-bin drift contribution (cur−ref)²/ref over the shares — the PSI
    * shape without the engine-libm ln. Counts are exact; shares and
    * contributions are identical double expressions over them. Aggregation
    * is O(bins); the window runs over the bin-sized aggregate only. */
  def qDistDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val binned = Tables.documents(s, dir)
      .select(expr("n_chars div 100").cast("int").as("bin"),
        ($"doc_id" % 2 === 0).as("is_ref"))
      .groupBy($"bin")
      .agg(count(when($"is_ref", 1)).as("ref_n"),
        count(when(!$"is_ref", 1)).as("cur_n"))
    val w = Window.partitionBy()
    binned
      .withColumn("ref_share",
        $"ref_n".cast("double") / sum($"ref_n").over(w).cast("double"))
      .withColumn("cur_share",
        $"cur_n".cast("double") / sum($"cur_n").over(w).cast("double"))
      .select($"bin", $"ref_n", $"cur_n",
        round($"ref_share", 6).as("ref_share"),
        round($"cur_share", 6).as("cur_share"),
        round((($"cur_share" - $"ref_share") * ($"cur_share" - $"ref_share"))
          / $"ref_share", 8).as("drift_contrib"))
      .orderBy($"bin")
  }

  private val qDistDriftSql =
    """WITH binned AS (
      |  SELECT CAST(n_chars // 100 AS INT) AS bin,
      |    count(*) FILTER (doc_id % 2 = 0) AS ref_n,
      |    count(*) FILTER (doc_id % 2 <> 0) AS cur_n
      |  FROM documents GROUP BY bin),
      |shared AS (
      |  SELECT *,
      |    CAST(ref_n AS DOUBLE) / CAST(sum(ref_n) OVER () AS DOUBLE)
      |      AS ref_share,
      |    CAST(cur_n AS DOUBLE) / CAST(sum(cur_n) OVER () AS DOUBLE)
      |      AS cur_share
      |  FROM binned)
      |SELECT bin, ref_n, cur_n,
      |  round(ref_share, 6) AS ref_share,
      |  round(cur_share, 6) AS cur_share,
      |  round(((cur_share - ref_share) * (cur_share - ref_share))
      |        / ref_share, 8) AS drift_contrib
      |FROM shared ORDER BY bin""".stripMargin

  // ----------------------------------------------------------------- q_mode
  /** Per-entity modal value (most frequent event type), deterministic
    * tie-break by the value itself — the categorical summary statistic
    * SQL's aggregate set lacks. Count per (entity, value) is one map-side-
    * combined shuffle; the rank window runs over the alphabet-bounded
    * count table (≤ |event types| rows per entity), never the raw data. */
  def qMode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id")
          .orderBy($"cnt".desc, $"event_type")))
      .withColumn("n_total",
        sum($"cnt").over(Window.partitionBy($"user_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("mode_value"), $"cnt",
        round($"cnt" / $"n_total", 4).as("mode_share"))
      .orderBy($"user_id")
  }

  private val qModeSql =
    """WITH counts AS (
      |  SELECT user_id, event_type, count(*) AS cnt
      |  FROM events GROUP BY user_id, event_type),
      |ranked AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY cnt DESC, event_type) AS rn,
      |    sum(cnt) OVER (PARTITION BY user_id) AS n_total
      |  FROM counts)
      |SELECT user_id, event_type AS mode_value, cnt,
      |  round(cnt / n_total, 4) AS mode_share
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------- registry
  // ----------------------------------------------------------- q_anomaly_days
  /** Daily-volume anomaly flags: each day's event count z²-tested against
    * the moments of the daily-count series (same exact-sums z² form as
    * q_outliers — `(n·x − Σx)² / (n·Σx² − (Σx)²)` with explicit
    * parenthesization, evaluated in double from exact integers on both
    * engines). |z| > 2 flags the day. The pipeline-monitoring primitive
    * layered over q_partition_stats' structural view: counts can be
    * well-shaped yet anomalous against their own history.
    *
    * Scale shape: one count per day (map-side-combined), a broadcast
    * 1-row moment join over the O(days) aggregate — the raw stream is
    * touched once. */
  def qAnomalyDays(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.events(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day_bucket"))
      .groupBy($"day_bucket").agg(count(lit(1)).as("x"))
    val stats = d.agg(count(lit(1)).cast("double").as("n_d"),
      sum($"x").cast("double").as("s_d"),
      sum($"x" * $"x").cast("double").as("q_d"))
    d.crossJoin(broadcast(stats))
      .withColumn("x_d", $"x".cast("double"))
      .withColumn("z2", round(
        (($"n_d" * $"x_d" - $"s_d") * ($"n_d" * $"x_d" - $"s_d"))
          / ($"n_d" * $"q_d" - $"s_d" * $"s_d"), 6))
      .select($"day_bucket", $"x".as("n_rows"), $"z2",
        ($"z2" > 4.0).as("is_anomaly"))
      .orderBy($"day_bucket")
  }

  private val qAnomalyDaysSql =
    """WITH d AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_bucket,
      |    count(*) AS x
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_d,
      |    CAST(sum(x) AS DOUBLE) AS s_d,
      |    CAST(sum(x * x) AS DOUBLE) AS q_d
      |  FROM d)
      |SELECT day_bucket, x AS n_rows,
      |  round(((n_d * CAST(x AS DOUBLE) - s_d)
      |    * (n_d * CAST(x AS DOUBLE) - s_d))
      |    / (n_d * q_d - s_d * s_d), 6) AS z2,
      |  round(((n_d * CAST(x AS DOUBLE) - s_d)
      |    * (n_d * CAST(x AS DOUBLE) - s_d))
      |    / (n_d * q_d - s_d * s_d), 6) > 4.0 AS is_anomaly
      |FROM d CROSS JOIN st
      |ORDER BY day_bucket""".stripMargin

  // ---------------------------------------------------------- q_corr_matrix
  /** Pairwise Pearson correlations among lineitem's numeric measures
    * (quantity, extendedprice, discount) from ONE aggregation pass: the
    * nine exact sums (n, Σx per column, Σx² per column, Σxy per pair) are
    * integer-cents DECIMAL(38,0) accumulations — associative, shuffle-
    * order-free — and each r is a single double expression over the exact
    * sums with identical parenthesization on both engines. The reference's
    * statistical surface has no correlation at all; a feature-selection
    * pass over training data needs exactly this matrix.
    *
    * Scale shape: one map-side-combined aggregation to a SINGLE row (the
    * widest shuffle payload is 10 decimals), then a constant-sized unpivot
    * into pair rows — at 100 TB this is scan speed, no second pass, no
    * window, no per-pair re-scan. `corr()` built-ins are avoided for the
    * usual reason: float accumulation is shuffle-order-dependent. */
  def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = Tables.lineitem(s, dir)
      .select(cents38($"l_quantity").as("x1"),
        cents38($"l_extendedprice").as("x2"),
        cents38($"l_discount").as("x3"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum($"x1").cast("double").as("s1"),
        sum($"x2").cast("double").as("s2"),
        sum($"x3").cast("double").as("s3"),
        sum($"x1" * $"x1").cast("double").as("q1"),
        sum($"x2" * $"x2").cast("double").as("q2"),
        sum($"x3" * $"x3").cast("double").as("q3"),
        sum($"x1" * $"x2").cast("double").as("p12"),
        sum($"x1" * $"x3").cast("double").as("p13"),
        sum($"x2" * $"x3").cast("double").as("p23"))
    def r(sx: String, sy: String, qx: String, qy: String, pxy: String) =
      round((($"n" * col(pxy) - col(sx) * col(sy)) /
        (sqrt($"n" * col(qx) - col(sx) * col(sx)) *
          sqrt($"n" * col(qy) - col(sy) * col(sy)))), 6)
    // explode a literal pair-struct array from the ONE aggregated row —
    // a union of three selects over `m` would re-run the aggregation (and
    // re-scan the fact) once per pair
    m.select(explode(array(
        struct(lit("quantity").as("col_x"), lit("extendedprice").as("col_y"),
          $"n".cast("long").as("n_rows"), r("s1", "s2", "q1", "q2", "p12").as("r")),
        struct(lit("quantity").as("col_x"), lit("discount").as("col_y"),
          $"n".cast("long").as("n_rows"), r("s1", "s3", "q1", "q3", "p13").as("r")),
        struct(lit("extendedprice").as("col_x"), lit("discount").as("col_y"),
          $"n".cast("long").as("n_rows"), r("s2", "s3", "q2", "q3", "p23").as("r"))))
        .as("p"))
      .select($"p.col_x", $"p.col_y", $"p.n_rows", $"p.r")
      .orderBy($"col_x", $"col_y")
  }

  private val qCorrMatrixSql =
    """WITH c AS (
      |  SELECT
      |    CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) AS x1,
      |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) AS x2,
      |    CAST(CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) AS x3
      |  FROM lineitem),
      |m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
      |    CAST(sum(x3) AS DOUBLE) AS s3,
      |    CAST(sum(x1 * x1) AS DOUBLE) AS q1, CAST(sum(x2 * x2) AS DOUBLE) AS q2,
      |    CAST(sum(x3 * x3) AS DOUBLE) AS q3,
      |    CAST(sum(x1 * x2) AS DOUBLE) AS p12, CAST(sum(x1 * x3) AS DOUBLE) AS p13,
      |    CAST(sum(x2 * x3) AS DOUBLE) AS p23
      |  FROM c)
      |SELECT 'quantity' AS col_x, 'extendedprice' AS col_y,
      |  CAST(n AS BIGINT) AS n_rows,
      |  round((n * p12 - s1 * s2) / (sqrt(n * q1 - s1 * s1) * sqrt(n * q2 - s2 * s2)), 6) AS r
      |FROM m
      |UNION ALL
      |SELECT 'quantity', 'discount', CAST(n AS BIGINT),
      |  round((n * p13 - s1 * s3) / (sqrt(n * q1 - s1 * s1) * sqrt(n * q3 - s3 * s3)), 6)
      |FROM m
      |UNION ALL
      |SELECT 'extendedprice', 'discount', CAST(n AS BIGINT),
      |  round((n * p23 - s2 * s3) / (sqrt(n * q2 - s2 * s2) * sqrt(n * q3 - s3 * s3)), 6)
      |FROM m
      |ORDER BY col_x, col_y""".stripMargin

  // ----------------------------------------------------------- q_chi_square
  /** Chi-square independence audit of returnflag × linestatus: per cell,
    * observed count vs the independence expectation E = rowΣ·colΣ/N and
    * its χ² contribution (O−E)²/E — the categorical-association test a
    * data-quality pass runs before trusting a crosstab. The contribution
    * is computed from the EXACT integer identity
    * (O·N − rowΣ·colΣ)² / (N·rowΣ·colΣ): the deviation is an exact
    * DECIMAL(38,0)/HUGEINT integer (O·N needs 128 bits at sf0.1); the
    * square and denominator then run in double FROM the exact integers —
    * deterministic, and immune to the 38-digit overflow squaring in
    * decimal would hit at 10¹²⁺ rows.
    *
    * Scale shape: one map-side-combined aggregation to O(cells) rows
    * (6 here, bounded by the categorical domain), then window sums OVER
    * THE CELL AGGREGATE — never over the fact. At 100 TB the fact is
    * touched once, at scan speed. */
  def qChiSquare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wN = Window.partitionBy()
    val obs = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag".as("flag"), $"l_linestatus".as("status"))
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("rt", sum($"n_obs").over(Window.partitionBy($"flag")))
      .withColumn("ct", sum($"n_obs").over(Window.partitionBy($"status")))
      .withColumn("tt", sum($"n_obs").over(wN))
    // dev = O·N − rowΣ·colΣ stays an exact ≤26-digit integer even at
    // 6·10¹² rows; its square and the denominator are computed in DOUBLE
    // from the exact integers (squaring in DECIMAL(38,0) would overflow at
    // that N) — double rounding of an exact integer is deterministic, so
    // both engines still compare bit-identical values.
    val dev = ($"n_obs".cast(DecimalType(38, 0)) * $"tt" -
      $"rt".cast(DecimalType(38, 0)) * $"ct").cast("double")
    obs.select($"flag", $"status", $"n_obs",
        round(($"rt".cast(DecimalType(38, 0)) * $"ct").cast("double") / $"tt".cast("double"), 6)
          .as("n_exp"),
        round((dev * dev) /
          ($"tt".cast("double") * $"rt".cast("double") * $"ct".cast("double")), 6).as("contrib"))
      .orderBy($"flag", $"status")
  }

  private val qChiSquareSql =
    """WITH obs AS (
      |  SELECT l_returnflag AS flag, l_linestatus AS status,
      |    count(*) AS n_obs
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (
      |  SELECT flag, status, n_obs,
      |    sum(n_obs) OVER (PARTITION BY flag) AS rt,
      |    sum(n_obs) OVER (PARTITION BY status) AS ct,
      |    sum(n_obs) OVER () AS tt
      |  FROM obs)
      |SELECT flag, status, n_obs,
      |  round(CAST(CAST(rt AS HUGEINT) * ct AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS n_exp,
      |  round((CAST(CAST(n_obs AS HUGEINT) * tt - CAST(rt AS HUGEINT) * ct AS DOUBLE)
      |          * CAST(CAST(n_obs AS HUGEINT) * tt - CAST(rt AS HUGEINT) * ct AS DOUBLE))
      |        / (CAST(tt AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)), 6) AS contrib
      |FROM t ORDER BY flag, status""".stripMargin

  // ----------------------------------------------------------- q_cramers_v
  /** Cramér's V association strength of returnflag × linestatus — the
    * normalized read-out over [[qChiSquare]]'s per-cell audit: one row with
    * N, degrees of freedom, the χ² total, and V = √(χ² / (N·min(r−1,c−1)))
    * in [0,1], the number a profiler compares across tables where raw χ²
    * (which grows with N) cannot be compared.
    *
    * Scale shape: identical to q_chi_square — one map-side-combined
    * aggregation to O(cells) rows, window sums over the cell aggregate,
    * then a single-row reduce; the fact is touched once at scan speed.
    *
    * Engine parity: per-cell contributions use the exact integer identity
    * (O·N − rowΣ·colΣ)²/(N·rowΣ·colΣ) with the square in double FROM exact
    * integers, nano-scaled to BIGINT for an order-independent sum; the
    * final √ and ÷ are IEEE-correctly-rounded doubles, identical both
    * engines. */
  def qCramersV(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = Tables.lineitem(s, dir)
      .groupBy($"l_returnflag".as("flag"), $"l_linestatus".as("status"))
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("rt", sum($"n_obs").over(Window.partitionBy($"flag")))
      .withColumn("ct", sum($"n_obs").over(Window.partitionBy($"status")))
      .withColumn("tt", sum($"n_obs").over(Window.partitionBy()))
    val dev = ($"n_obs".cast(DecimalType(38, 0)) * $"tt" -
      $"rt".cast(DecimalType(38, 0)) * $"ct").cast("double")
    val cells = obs.withColumn("contrib_nano",
      round((dev * dev) /
        ($"tt".cast("double") * $"rt".cast("double") * $"ct".cast("double"))
        * lit(1e9), 0).cast("long"))
    cells.agg(
        countDistinct($"flag").as("r"),
        countDistinct($"status").as("c"),
        max($"tt").as("n"),
        sum($"contrib_nano").as("chi2_nano"))
      .select($"n",
        (($"r" - 1) * ($"c" - 1)).as("dof"),
        ($"chi2_nano" / lit(1e9)).as("chi2"),
        round(sqrt(($"chi2_nano" / lit(1e9)) /
          ($"n".cast("double") * least($"r" - 1, $"c" - 1).cast("double"))),
          6).as("cramers_v"))
  }

  private val qCramersVSql =
    """WITH obs AS (
      |  SELECT l_returnflag AS flag, l_linestatus AS status,
      |    count(*) AS n_obs
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (
      |  SELECT flag, status, n_obs,
      |    sum(n_obs) OVER (PARTITION BY flag) AS rt,
      |    sum(n_obs) OVER (PARTITION BY status) AS ct,
      |    sum(n_obs) OVER () AS tt
      |  FROM obs),
      |cells AS (
      |  SELECT flag, status, tt,
      |    CAST(round(
      |      (CAST(CAST(n_obs AS HUGEINT) * tt - CAST(rt AS HUGEINT) * ct AS DOUBLE)
      |       * CAST(CAST(n_obs AS HUGEINT) * tt - CAST(rt AS HUGEINT) * ct AS DOUBLE))
      |      / (CAST(tt AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
      |      * 1e9, 0) AS BIGINT) AS contrib_nano
      |  FROM t),
      |agg AS (
      |  SELECT CAST(count(DISTINCT flag) AS BIGINT) AS r,
      |    CAST(count(DISTINCT status) AS BIGINT) AS c,
      |    CAST(max(tt) AS BIGINT) AS n,
      |    CAST(sum(contrib_nano) AS BIGINT) AS chi2_nano
      |  FROM cells)
      |SELECT n, (r - 1) * (c - 1) AS dof,
      |  chi2_nano / 1e9 AS chi2,
      |  round(sqrt((chi2_nano / 1e9)
      |    / (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))), 6)
      |    AS cramers_v
      |FROM agg""".stripMargin

  // ------------------------------------------------------------------ q_mad
  /** Median absolute deviation per return flag — the robust dispersion
    * that, unlike σ (q_outliers), a few wild rows cannot drag. Two exact
    * passes: median of integer cents, then median of |x − med|. The
    * interpolated medians are EXACT half-integers (midpoints of integer
    * cents, far below 2⁻⁵² loss), so doubling them recovers exact longs
    * and both engines agree bit-for-bit with no rounding leap of faith —
    * deviations are computed against med2 = 2·median as pure integers.
    *
    * Scale shape (r15): ONE aggregation pass over the fact to the distinct
    * value grain; both medians (value and deviation) derive from that
    * grain — the deviation grain is an O(distinct) fold of the value
    * grain, not a second fact scan. Percentile state is per-group, no
    * window over fact rows. */
  def qMad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select(
      $"l_returnflag".as("flag"),
      (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"))
    // Exact interpolated median WITHOUT the `percentile` aggregate (r14
    // optimization round): percentile builds a per-group value→count
    // OpenHashMap in every mapper and shuffles whole maps — at 100 TB the
    // merged map is one reducer's heap. Instead aggregate to the DISTINCT
    // value grain (map-side combinable longs), run a per-flag cumulative
    // count over that SMALL table, and read the two order statistics the
    // p=0.5 interpolation touches: with 0-based ranks r1=(n−1) div 2 and
    // r2=n div 2, percentile(v, .5)·2 = v[r1] + v[r2] EXACTLY (n odd ⇒
    // r1=r2 ⇒ 2·v[mid]; n even ⇒ the midpoint interpolation, doubled) —
    // pure integer identity, oracle-gated bit-for-bit. Same trick for the
    // deviation pass.
    // med2OfGrain consumes a PRE-AGGREGATED (flag, value, count) grain, so
    // the expensive fact-level aggregation happens exactly once (r15 — the
    // r14 shape aggregated the fact twice: once per med2Of call, and the
    // second pass also re-scanned + broadcast-joined the whole fact).
    def med2OfGrain(grain: DataFrame, vCol: String): DataFrame = {
      val w = Window.partitionBy(col("flag")).orderBy(col(vCol))
      grain
        .withColumn("hi", sum($"c").over(w))
        .withColumn("lo", $"hi" - $"c")
        .withColumn("n", max($"hi").over(Window.partitionBy($"flag")))
        .withColumn("r1", expr("(n - 1) div 2")) // integral long division
        .withColumn("r2", expr("n div 2"))
        .groupBy($"flag")
        .agg(max($"n").as("n"),
          (sum(when($"lo" <= $"r1" && $"r1" < $"hi", col(vCol)).otherwise(0L))
            + sum(when($"lo" <= $"r2" && $"r2" < $"hi", col(vCol))
              .otherwise(0L))).as("m2"))
    }
    // ONE fact pass: the distinct-value grain (map-side combinable longs).
    val grain = li.groupBy($"flag", $"cents").agg(count(lit(1)).as("c"))
    val med = med2OfGrain(grain, "cents").select($"flag", $"m2".as("med2"))
    // The deviation pass's grain is a FUNCTION of the cents grain:
    // dev2 = |2·cents − med2| maps each (flag, cents, c) row to a
    // (flag, dev2) cell whose count is the sum of the (≤ 2, symmetric
    // around the median) cents values that fold onto it — so it derives
    // from `grain` (both references share one exchange via ReuseExchange)
    // with NO second fact scan, broadcast-join over the fact, or second
    // fact-level aggregate. Pure integer identity; oracle unchanged.
    val devGrain = grain.join(broadcast(med), "flag")
      .withColumn("dev2", abs($"cents" * 2 - $"med2"))
      .groupBy($"flag", $"dev2").agg(sum($"c").as("c"))
    med2OfGrain(devGrain, "dev2")
      .join(broadcast(med), "flag")
      .select($"flag", $"n",
        round($"med2".cast("double") / 200.0d, 4).as("median"),
        round($"m2".cast("double") / 400.0d, 4).as("mad"))
      .orderBy($"flag")
  }

  private val qMadSql =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |med AS (
      |  SELECT flag,
      |    CAST(round(quantile_cont(CAST(cents AS DOUBLE), 0.5) * 2, 0) AS BIGINT)
      |      AS med2
      |  FROM li GROUP BY flag),
      |dev AS (
      |  SELECT li.flag, med.med2, abs(li.cents * 2 - med.med2) AS dev2
      |  FROM li JOIN med USING (flag))
      |SELECT flag, count(*) AS n,
      |  round(CAST(max(med2) AS DOUBLE) / 200.0, 4) AS median,
      |  round(CAST(CAST(round(quantile_cont(CAST(dev2 AS DOUBLE), 0.5) * 2, 0)
      |    AS BIGINT) AS DOUBLE) / 400.0, 4) AS mad
      |FROM dev GROUP BY flag ORDER BY flag""".stripMargin

  // ---------------------------------------------------- q_weighted_median
  /** Exact weighted median of line price per return flag, weighted by
    * quantity — "the price at which half the shipped UNITS are cheaper",
    * the inventory-weighted center [[qExactMedian]]'s row-median ignores
    * (one 50-unit cheap line outweighs ten 1-unit luxury lines). The
    * median is the smallest price whose running unit weight reaches half
    * the total: one per-group value-ordered window over exact integer
    * (cents, units), then a min-over-qualifying aggregate — no
    * interpolation, no doubles.
    *
    * Determinism with duplicate prices: the cumulative weight of
    * same-price rows depends on their (arbitrary) relative order, but the
    * SMALLEST qualifying price does not — every ordering crosses the
    * half-total threshold inside the same price tie-group, and all rows
    * in a tie-group carry the same price. So the value-only sort key is
    * total ENOUGH for the emitted value (the lineitem duplicate-row trap
    * doesn't bite a min-over-threshold).
    *
    * Scale shape: BANDED running weight (round-7 VERDICT item 2 — the
    * previous (flag)-partitioned window shuffled the whole fact into 3
    * tasks, a straggler factory at 100×), via the GROUPED
    * [[graft.core.BandedRank.prefixSum]]: rows band by price, the
    * running weight is computed per (flag, band) partition — flags ×
    * bands ≫ cores of genuine parallelism — and each band's offset is
    * the per-flag prefix sum of an O(flags × bands) aggregate,
    * broadcast back. Equal-price ties never span bands, so the
    * min-qualifying price is unchanged (the determinism argument
    * above). No unpartitioned window anywhere; at 100 TB add bands, not
    * sort width. */
  def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select(
      $"l_returnflag".as("flag"),
      (OP.dec2($"l_extendedprice") * 100).cast("long").as("cents"),
      OP.dec2($"l_quantity").cast("long").as("qty"))
    // NOTE (r14 optimization round): a distinct-value-grain pre-aggregate
    // (the qMad trick — sum qty per (flag, cents), prefix over the grain
    // table) was tried and REVERTED: lineitem cents are 99% unique at
    // bench scale (594,330 grains / 600,000 rows at sf0.1), so the extra
    // exchange bought nothing and measured 1.75 s → 2.90 s. The banded
    // prefix below is already the scale-safe shape (no unpartitioned
    // window, no per-group map state); the grain pre-aggregate only wins
    // once rows ≫ the ~10⁷-value cents domain, where the banded shape
    // remains linear anyway.
    val totals = li.groupBy($"flag").agg(sum($"qty").as("w_total"))
    // grouped banded running weight — ONE implementation of the
    // decomposition (review finding: this previously hand-rolled a third
    // copy of the band/offset machinery next to BandedRank and
    // qSkylineFact); every window partitions on (flag, band)
    graft.core.BandedRank
      .prefixSum(li, "cents", Seq.empty, Seq("qty" -> "cumw"),
        groups = Seq("flag"))
      .join(broadcast(totals), Seq("flag"))
      .filter($"cumw" * 2 >= $"w_total")
      .groupBy($"flag")
      .agg(max($"w_total").as("total_units"),
        min($"cents").as("wmedian_c"))
      .orderBy($"flag")
  }

  private val qWeightedMedianSql =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS qty
      |  FROM lineitem),
      |r AS (
      |  SELECT flag, cents,
      |    CAST(sum(qty) OVER (PARTITION BY flag ORDER BY cents
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
      |    CAST(sum(qty) OVER (PARTITION BY flag) AS BIGINT) AS w_total
      |  FROM li)
      |SELECT flag, max(w_total) AS total_units,
      |  min(cents) AS wmedian_c
      |FROM r WHERE cumw * 2 >= w_total
      |GROUP BY flag ORDER BY flag""".stripMargin

  // ------------------------------------------------------ q_price_elasticity
  /** Log-log price elasticity of demand per part type: the slope of
    * ln(quantity) on ln(catalog price) across a type's lineitems —
    * elasticity < 0 means the type behaves like a normal good, the
    * magnitude says how price-sensitive. The econometric completion of
    * [[qLinreg]] (levels regression) on the reference's own star.
    *
    * Engine parity (the q_theil_index nano-ln discipline): each ln is
    * rounded once — micro-scaled to an exact BIGINT per row
    * (round(ln(x)·10⁶)) — so all five regression sums are
    * order-independent DECIMAL(38,0) arithmetic; the slope is ONE
    * identically-parenthesized IEEE closed form (the 10⁶ scale cancels
    * in the ratio); a zero-variance type emits NULL on both engines via
    * an exact decimal equality guard, never an engine-specific Inf/NaN.
    *
    * Scale shape: one fact scan with the part dim on the partkey
    * shuffle, five map-side-combinable sums per O(types) group —
    * no windows, no sort. */
  def qPriceElasticity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.lineitem(s, dir)
      .select($"l_partkey", OP.dec2($"l_quantity").cast("long").as("qty"))
      .join(Tables.part(s, dir)
        .select($"p_partkey", $"p_type", OP.dec2($"p_retailprice")
          .cast("double").as("price")),
        $"l_partkey" === $"p_partkey")
      .select($"p_type".as("ptype"),
        round(log($"price") * 1e6, 0).cast("long").as("x6"),
        round(log($"qty".cast("double")) * 1e6, 0).cast("long").as("y6"))
    rows
      .groupBy($"ptype")
      .agg(count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum($"x6".cast(DecimalType(38, 0))).as("sx"),
        sum($"y6".cast(DecimalType(38, 0))).as("sy"),
        sum($"x6".cast(DecimalType(38, 0)) * $"x6").as("sxx"),
        sum($"x6".cast(DecimalType(38, 0)) * $"y6").as("sxy"))
      .select($"ptype", $"n".cast("long").as("n_lineitems"),
        when($"n" * $"sxx" === $"sx" * $"sx", lit(null).cast("double"))
          .otherwise(round(
            ($"n".cast("double") * $"sxy".cast("double") -
              $"sx".cast("double") * $"sy".cast("double")) /
              ($"n".cast("double") * $"sxx".cast("double") -
                $"sx".cast("double") * $"sx".cast("double")), 4))
          .as("elasticity"))
      .orderBy($"ptype")
  }

  private val qPriceElasticitySql =
    """WITH rows_ AS (
      |  SELECT p_type AS ptype,
      |    CAST(round(ln(CAST(CAST(p_retailprice AS DECIMAL(18,2))
      |      AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x6,
      |    CAST(round(ln(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
      |      AS BIGINT) AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y6
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |g AS (
      |  SELECT ptype, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(CAST(x6 AS HUGEINT)) AS HUGEINT) AS sx,
      |    CAST(sum(CAST(y6 AS HUGEINT)) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x6 AS HUGEINT) * x6) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(x6 AS HUGEINT) * y6) AS HUGEINT) AS sxy
      |  FROM rows_ GROUP BY 1)
      |SELECT ptype, CAST(n AS BIGINT) AS n_lineitems,
      |  CASE WHEN n * sxx = sx * sx THEN NULL
      |       ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
      |  END AS elasticity
      |FROM g ORDER BY ptype""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_price_elasticity" -> (qPriceElasticity _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_mad"         -> (qMad _),
    "q_corr_matrix" -> (qCorrMatrix _),
    "q_chi_square" -> (qChiSquare _),
    "q_cramers_v" -> (qCramersV _),
    "q_anomaly_days" -> (qAnomalyDays _),
    "q_mode"       -> (qMode _),
    "q_histogram"  -> (qHistogram _),
    "q_outliers"   -> (qOutliers _),
    "q_linreg"     -> (qLinreg _),
    "q_autocorr"   -> (qAutocorr _),
    "q_benford"    -> (qBenford _),
    "q_skyline"    -> (qSkyline _),
    "q_skyline_fact" -> (qSkylineFact _),
    "q_exact_median" -> (qExactMedian _),
    "q_equidepth"  -> (qEquidepth _),
    "q_ab_test"    -> (qAbTest _),
    "q_dist_drift" -> (qDistDrift _))

  val oracle: Map[String, String] = Map(
    "q_price_elasticity" -> qPriceElasticitySql,
    "q_weighted_median" -> qWeightedMedianSql,
    "q_mad"         -> qMadSql,
    "q_corr_matrix" -> qCorrMatrixSql,
    "q_chi_square" -> qChiSquareSql,
    "q_cramers_v" -> qCramersVSql,
    "q_anomaly_days" -> qAnomalyDaysSql,
    "q_mode"       -> qModeSql,
    "q_histogram"  -> qHistogramSql,
    "q_outliers"   -> qOutliersSql,
    "q_linreg"     -> qLinregSql,
    "q_autocorr"   -> qAutocorrSql,
    "q_benford"    -> qBenfordSql,
    "q_skyline"    -> qSkylineSql,
    "q_skyline_fact" -> qSkylineFactSql,
    "q_exact_median" -> qExactMedianSql,
    "q_equidepth"  -> qEquidepthSql,
    "q_ab_test"    -> qAbTestSql,
    "q_dist_drift" -> qDistDriftSql)
}
