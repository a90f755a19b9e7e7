package graft.queries

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{OracleParity => OP, Tables}
import graft.warehouse.Scd2

/** Warehouse-algorithm coverage backed by the graft.warehouse /
  * graft.etl libraries: the SCD2 batch merge (§2.7), dedup-with-capture
  * (A8) and group-mean imputation join-back (J9) — each oracle-checked by
  * expressing the identical algebra in DuckDB SQL over the testdata.
  */
object WarehouseOps {

  // ------------------------------------------------------------ q_scd2_merge
  /** SCD2 batch merge via [[graft.warehouse.Scd2.merge]]: the customer table
    * plays the current dim (bootstrapped 2020-01-01); the staged batch
    * perturbs every 7th key's balance (changed), adds key+10000 for every
    * 100th (new), leaves the rest untouched. Result = unchanged ∪ expired ∪
    * fresh as of 2024-01-01 (TL_combine.sql:22-62 algebra).
    *
    * Balance flows in exact DECIMAL(18,2) space so the md5 row-hash sees the
    * identical string rendering on both engines; the output column is cast
    * back to double. */
  def qScd2Merge(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val bal = col("c_acctbal").cast(DecimalType(18, 2))
    val base = cust.select(
      col("c_custkey"), col("c_name"), col("c_mktsegment"), bal.as("bal"))
    val current = Scd2.initial(base, "c_custkey",
      Seq("c_name", "c_mktsegment", "bal"), Date.valueOf("2020-01-01"))
    val staged = base
      .withColumn("bal",
        when(col("c_custkey") % 7 === 0, col("bal") + 100).otherwise(col("bal")))
      .unionByName(base.filter(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") + 10000).as("c_custkey"),
          col("c_name"), col("c_mktsegment"), col("bal")))
    Scd2.merge(current, staged, "c_custkey",
      Seq("c_name", "c_mktsegment", "bal"), Date.valueOf("2024-01-01"))
      .withColumn("bal", col("bal").cast(DoubleType))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  private val qScd2MergeSql =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_mktsegment,
      |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      |  FROM customer),
      |cur AS (
      |  SELECT *,
      |    md5(concat_ws('::', COALESCE(c_name, ''), COALESCE(c_mktsegment, ''),
      |      COALESCE(CAST(bal AS VARCHAR), ''))) AS row_hash,
      |    DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |    TRUE AS is_current
      |  FROM base),
      |stg AS (
      |  SELECT c_custkey, c_name, c_mktsegment,
      |    CASE WHEN c_custkey % 7 = 0 THEN bal + 100 ELSE bal END AS bal
      |  FROM base
      |  UNION ALL
      |  SELECT c_custkey + 10000, c_name, c_mktsegment, bal
      |  FROM base WHERE c_custkey % 100 = 0),
      |stgh AS (
      |  SELECT *,
      |    md5(concat_ws('::', COALESCE(c_name, ''), COALESCE(c_mktsegment, ''),
      |      COALESCE(CAST(bal AS VARCHAR), ''))) AS row_hash
      |  FROM stg),
      |changed AS (
      |  SELECT c.c_custkey FROM cur c
      |  JOIN stgh s ON s.c_custkey = c.c_custkey
      |  WHERE c.row_hash IS DISTINCT FROM s.row_hash),
      |fresh AS (
      |  SELECT s.c_custkey, s.c_name, s.c_mktsegment, s.bal, s.row_hash,
      |    DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
      |    TRUE AS is_current
      |  FROM stgh s LEFT JOIN cur c ON s.c_custkey = c.c_custkey
      |  WHERE c.c_custkey IS NULL OR c.row_hash IS DISTINCT FROM s.row_hash),
      |expired AS (
      |  SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.bal, c.row_hash,
      |    c.valid_from, DATE '2024-01-01' AS valid_to, FALSE AS is_current
      |  FROM cur c JOIN changed ch ON ch.c_custkey = c.c_custkey),
      |unchanged AS (
      |  SELECT c_custkey, c_name, c_mktsegment, bal, row_hash,
      |    valid_from, valid_to, is_current
      |  FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM changed))
      |SELECT c_custkey, c_name, c_mktsegment, CAST(bal AS DOUBLE) AS bal,
      |  row_hash, valid_from, valid_to, is_current
      |FROM (SELECT * FROM unchanged
      |      UNION ALL SELECT * FROM expired
      |      UNION ALL SELECT * FROM fresh)
      |ORDER BY c_custkey, valid_from""".stripMargin

  // ------------------------------------------------------------- q_dedup_log
  /** A8 dedup-with-capture (ET_combined.py:118-132): full-row duplicates
    * beyond the first are emitted as DQ rows (the capture side of
    * [[graft.etl.DqEngine.dedupWithLog]]); corpus manufactures one extra
    * copy of every 100th order. All copies of a group are identical, so any
    * row_number assignment logs the same values — deterministic despite the
    * unordered partitionBy. */
  def qDedupLog(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val corpus = ord.unionByName(ord.filter(col("o_orderkey") % 100 === 0))
    val w = Window.partitionBy(corpus.columns.map(col): _*)
      .orderBy(col("o_orderkey"))
    corpus.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select(
        col("o_orderkey").cast(StringType).as("row_reference"),
        col("o_custkey"),
        lit("duplicate_row").as("issue"))
      .orderBy(col("o_orderkey").cast(StringType))
  }

  private val qDedupLogSql =
    """WITH corpus AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      |  WHERE o_orderkey % 100 = 0),
      |rn AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_orderkey, o_custkey, o_orderstatus
      |    ORDER BY o_orderkey) AS __rn
      |  FROM corpus)
      |SELECT CAST(o_orderkey AS VARCHAR) AS row_reference, o_custkey,
      |  'duplicate_row' AS issue
      |FROM rn WHERE __rn > 1
      |ORDER BY row_reference""".stripMargin

  // ----------------------------------------------------------- q_impute_mean
  /** J9 group-mean imputation, window+coalesce form (C2_ops_etl.py:61-85;
    * dbt stg_ops_downtime.sql:27-47): nulls are manufactured on every 17th
    * event, then filled with the 2-decimal-rounded group mean over
    * (event_type, user bucket). The mean is computed in exact decimal space
    * (OracleParity) so both engines round the identical double. One shuffle
    * on the group key — no aggregate + join-back. */
  def qImputeMean(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        (col("user_id") % 10).as("bucket"),
        when(col("event_id") % 17 === 0, lit(null).cast(DoubleType))
          .otherwise(col("value")).as("value_dirty"))
    val grp = Window.partitionBy(col("event_type"), col("bucket"))
    val mean = round(
      sum(OP.dec2(col("value_dirty"))).over(grp).cast(DoubleType) /
        count(col("value_dirty")).over(grp), 2)
    ev.withColumn("value_imputed",
      coalesce(OP.dec2(col("value_dirty")).cast(DoubleType), mean))
      .withColumn("was_imputed", col("value_dirty").isNull)
      .withColumn("value_dirty", OP.dec2(col("value_dirty")).cast(DoubleType))
      .orderBy(col("event_id"))
  }

  private val qImputeMeanSql =
    """WITH ev AS (
      |  SELECT event_id, event_type, user_id % 10 AS bucket,
      |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS vd
      |  FROM events)
      |SELECT event_id, event_type, bucket,
      |  CAST(CAST(vd AS DECIMAL(18,2)) AS DOUBLE) AS value_dirty,
      |  COALESCE(CAST(CAST(vd AS DECIMAL(18,2)) AS DOUBLE),
      |    round(
      |      CAST(SUM(CAST(vd AS DECIMAL(18,2))) OVER (
      |        PARTITION BY event_type, bucket) AS DOUBLE)
      |      / COUNT(vd) OVER (PARTITION BY event_type, bucket), 2))
      |    AS value_imputed,
      |  vd IS NULL AS was_imputed
      |FROM ev ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------- registry
  // --------------------------------------------------------------- q_profile
  /** Data-profiling pass (the warehouse-onboarding companion of the DQ rule
    * engine — ET_combined.py's per-column checks presuppose exactly these
    * stats): per column, null count, exact distinct count, and numeric
    * min/max (NULL for non-numeric columns), emitted as one row per column.
    *
    * Scale shape: ONE scan of the fact table; all per-column aggregates run
    * in a single Aggregate (the multi-distinct rewrites to one Expand +
    * partial/final aggregation — the standard distributed profiler shape,
    * every phase map-side combinable); the unpivot to rows touches a
    * 1-row × 6-column result. */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val numeric = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strings = Seq("l_returnflag", "l_linestatus")
    val cols = numeric ++ strings
    val aggs =
      cols.flatMap { c =>
        Seq((count(lit(1)) - count(col(c))).as(s"${c}__nn"),
          count_distinct(col(c)).as(s"${c}__nd"))
      } ++ numeric.flatMap { c =>
        Seq(min(col(c)).as(s"${c}__mn"), max(col(c)).as(s"${c}__mx"))
      }
    val one = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val arms = cols.map { c =>
      val (mn, mx) =
        if (numeric.contains(c)) (s"`${c}__mn`", s"`${c}__mx`")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      s"'$c', `${c}__nn`, `${c}__nd`, $mn, $mx"
    }
    one.selectExpr(s"stack(${cols.size}, ${arms.mkString(", ")}) " +
      "AS (col_name, n_null, n_distinct, min_v, max_v)")
      .orderBy(col("col_name"))
  }

  private val qProfileSql = {
    val numeric = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strings = Seq("l_returnflag", "l_linestatus")
    val arms = (numeric.map { c =>
      s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  min($c) AS min_v, max($c) AS max_v FROM lineitem""".stripMargin
    } ++ strings.map { c =>
      s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v
         |FROM lineitem""".stripMargin
    })
    arms.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // ----------------------------------------------------- q_incremental_agg
  /** Incremental aggregate maintenance — the mergeable-state form of a
    * materialized per-month revenue view: the HISTORICAL partial state
    * (orders before the cutoff, pre-aggregated to (month, cents, n)) is
    * merged with the NEW batch's partials by a second, state-sized
    * aggregation; no historical fact row is touched again. The oracle is
    * the full recompute over all orders — proving the monoid merge
    * (sum/count over exact cents) IS the view.
    *
    * Scale shape: this is why warehouse rollups stay cheap at 100 TB — the
    * nightly load aggregates only the delta, and the merge is O(groups).
    * Exact cents (BIGINT) rather than double partials make the merge
    * associative and order-independent, so state can be re-partitioned or
    * re-sharded freely between loads. In production the state table is a
    * parquet asset maintained through [[graft.io.Sinks.overwriteSwap]];
    * here both partials derive from the same scan, split by the cutoff
    * date, so the gate can check the merged result exactly. */
  def qIncrementalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = "1999-01-01"
    def partial(df: DataFrame): DataFrame =
      df.groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
        .agg(
          sum(($"o_totalprice".cast(DecimalType(18, 2)) * 100).cast("long"))
            .as("cents"),
          count(lit(1)).as("n"))
    val orders = Tables.orders(s, dir)
    val state = partial(orders.filter($"o_orderdate" < lit(cutoff)))
    val delta = partial(orders.filter($"o_orderdate" >= lit(cutoff)))
    state.unionByName(delta)
      .groupBy($"month")
      .agg(sum($"cents").as("cents"), sum($"n").as("n_orders"))
      .select($"month", $"n_orders",
        ($"cents".cast("double") / 100.0).as("revenue"))
      .orderBy($"month")
  }

  private val qIncrementalAggSql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |       AS DOUBLE) / 100.0 AS revenue
      |FROM orders GROUP BY month ORDER BY month""".stripMargin

  // ------------------------------------------------------------ q_table_diff
  /** Replication/migration reconciliation: compare two table snapshots by
    * bucketed checksums instead of row-by-row — per key-range bucket, a
    * row count and an XOR of per-row md5 fingerprints (order-independent,
    * so no sort anywhere; md5 per the house cross-engine hash idiom). The
    * "after" snapshot is derived in-query (keys ≡ 0 mod 97 deleted, rows
    * ≡ 0 mod 89 repriced) so the expected mismatch pattern is known.
    * At 100 TB each side is one scan + an O(buckets) aggregate; only
    * buckets that disagree are re-read at row granularity — the anti-
    * entropy shape replication systems use. */
  def qTableDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def summarize(df: DataFrame, nCol: String, xCol: String): DataFrame =
      df.select(expr("o_orderkey div 1000").as("bucket"),
          conv(substring(md5(concat_ws("|",
            $"o_orderkey".cast("string"),
            $"price".cast("string"))), 1, 15), 16, 10)
            .cast("long").as("f"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as(nCol), expr("bit_xor(f)").as(xCol))
    val base = Tables.orders(s, dir)
      .select($"o_orderkey", OP.dec2($"o_totalprice").as("price"))
    val snap = base.filter($"o_orderkey" % 97 =!= 0)
      .select($"o_orderkey",
        when($"o_orderkey" % 89 === 0, OP.dec2($"price" + 1))
          .otherwise($"price").as("price"))
    summarize(base, "n_base", "x_base")
      .join(summarize(snap, "n_snap", "x_snap"), Seq("bucket"), "full_outer")
      .select($"bucket",
        coalesce($"n_base", lit(0L)).as("n_base"),
        coalesce($"n_snap", lit(0L)).as("n_snap"),
        when($"n_base" <=> $"n_snap" && $"x_base" <=> $"x_snap", "match")
          .otherwise("diff").as("status"))
      .orderBy($"bucket")
  }

  private val qTableDiffSql =
    """WITH base AS (
      |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |snap AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 89 = 0
      |         THEN CAST(price + 1 AS DECIMAL(18,2))
      |         ELSE price END AS price
      |  FROM base WHERE o_orderkey % 97 <> 0),
      |sb AS (
      |  SELECT o_orderkey // 1000 AS bucket, count(*) AS n_base,
      |    bit_xor(('0x' || substr(md5(
      |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(price AS VARCHAR)),
      |      1, 15))::BIGINT) AS x_base
      |  FROM base GROUP BY bucket),
      |ss AS (
      |  SELECT o_orderkey // 1000 AS bucket, count(*) AS n_snap,
      |    bit_xor(('0x' || substr(md5(
      |      CAST(o_orderkey AS VARCHAR) || '|' || CAST(price AS VARCHAR)),
      |      1, 15))::BIGINT) AS x_snap
      |  FROM snap GROUP BY bucket)
      |SELECT coalesce(sb.bucket, ss.bucket) AS bucket,
      |  coalesce(n_base, 0) AS n_base,
      |  coalesce(n_snap, 0) AS n_snap,
      |  CASE WHEN n_base IS NOT DISTINCT FROM n_snap
      |        AND x_base IS NOT DISTINCT FROM x_snap
      |       THEN 'match' ELSE 'diff' END AS status
      |FROM sb FULL OUTER JOIN ss ON sb.bucket = ss.bucket
      |ORDER BY bucket""".stripMargin

  // -------------------------------------------------------- q_cascade_delete
  /** Right-to-be-forgotten cascade audit: a deletion set of customers
    * (every 97th key — the deterministic stand-in for a GDPR request
    * batch) cascades through the FK chain customer → orders → lineitem,
    * and the audit reports per-table deleted/remaining counts BEFORE any
    * data is touched — the dry-run every compliance pipeline runs first.
    *
    * Scale shape: the deletion keys are a small broadcast side on the
    * orders probe; the lineitem probe joins on the deleted-orders key set
    * (keyed semi join — stays a shuffle join when the request batch is
    * large). Counts are map-side-combinable; the 3-row summary unions
    * 1-row aggregates. The actual delete is the same joins with
    * `left_anti` feeding [[graft.io.Sinks.overwriteSwap]] — this audit and
    * the delete share one predicate definition, so the report can never
    * disagree with the action. */
  def qCascadeDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val delC = Tables.customer(s, dir)
      .filter($"c_custkey" % 97 === 0).select($"c_custkey")
    val cRow = Tables.customer(s, dir)
      .agg(count(lit(1)).as("t"),
        count(when($"c_custkey" % 97 === 0, 1)).as("d"))
    val delO = Tables.orders(s, dir)
      .join(broadcast(delC), $"o_custkey" === $"c_custkey", "left_semi")
      .select($"o_orderkey")
    val oRow = Tables.orders(s, dir).agg(count(lit(1)).as("t"))
      .crossJoin(broadcast(delO.agg(count(lit(1)).as("d"))))
    val lRow = Tables.lineitem(s, dir).agg(count(lit(1)).as("t"))
      .crossJoin(broadcast(
        Tables.lineitem(s, dir)
          .join(delO, $"l_orderkey" === $"o_orderkey", "left_semi")
          .agg(count(lit(1)).as("d"))))
    def shape(tbl: String, df: DataFrame): DataFrame =
      df.select(lit(tbl).as("tbl"), $"d".as("n_deleted"),
        ($"t" - $"d").as("n_remaining"))
    shape("customer", cRow)
      .unionByName(shape("orders", oRow))
      .unionByName(shape("lineitem", lRow))
      .orderBy($"tbl")
  }

  private val qCascadeDeleteSql =
    """WITH delc AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |delo AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_custkey IN (SELECT c_custkey FROM delc)),
      |c AS (
      |  SELECT 'customer' AS tbl,
      |    (SELECT count(*) FROM delc) AS n_deleted,
      |    count(*) - (SELECT count(*) FROM delc) AS n_remaining
      |  FROM customer),
      |o AS (
      |  SELECT 'orders' AS tbl,
      |    (SELECT count(*) FROM delo) AS n_deleted,
      |    count(*) - (SELECT count(*) FROM delo) AS n_remaining
      |  FROM orders),
      |l AS (
      |  SELECT 'lineitem' AS tbl,
      |    (SELECT count(*) FROM lineitem
      |     WHERE l_orderkey IN (SELECT o_orderkey FROM delo)) AS n_deleted,
      |    count(*) - (SELECT count(*) FROM lineitem
      |     WHERE l_orderkey IN (SELECT o_orderkey FROM delo)) AS n_remaining
      |  FROM lineitem)
      |SELECT tbl, n_deleted, n_remaining FROM c
      |UNION ALL SELECT tbl, n_deleted, n_remaining FROM o
      |UNION ALL SELECT tbl, n_deleted, n_remaining FROM l
      |ORDER BY tbl""".stripMargin

  // ---------------------------------------------------------- q_l_diversity
  /** l-diversity audit — k-anonymity's necessary complement: a class of
    * 50 identical rows is 50-anonymous yet leaks everything if all 50
    * share one sensitive value. Per (mktsegment, nationkey) equivalence
    * class: row count (the k), distinct sensitive balance-bands (the l),
    * and the risk flag l < 3. Publishing decisions read THIS table, not
    * the k table alone.
    *
    * Scale shape: one exact two-level aggregation (rows → class), the
    * same shuffle the k-anonymity audit pays; distinct-count per class is
    * map-side partial. Class count is QI-domain-bounded. */
  def qLDiversity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_mktsegment", $"c_nationkey",
        floor((OP.dec2($"c_acctbal") * 100).cast("long") / lit(100000.0))
          .as("bal_band"))
      .groupBy($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("k_size"),
        countDistinct($"bal_band").as("l_div"))
      .withColumn("is_risky", $"l_div" < 3L)
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  private val qLDiversitySql =
    """SELECT c_mktsegment, c_nationkey,
      |  count(*) AS k_size,
      |  count(DISTINCT floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
      |    AS BIGINT) / 100000.0)) AS l_div,
      |  count(DISTINCT floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
      |    AS BIGINT) / 100000.0)) < 3 AS is_risky
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  // ---------------------------------------------------------- q_t_closeness
  /** t-closeness audit completing the k-anonymity / l-diversity triad: for
    * each (segment, nation) equivalence class, the Earth Mover's Distance
    * between the class's balance-band distribution and the global one —
    * l-diversity counts DISTINCT sensitive values; t-closeness catches the
    * class whose values are distinct but skewed (an attacker learns the
    * class is mostly band 9 even if 3 bands appear). For the ordered bands,
    * EMD = Σ|cumulative(p−q)|/(m−1), kept exact over the common denominator
    * n_class·n_total: r_i = Σ_{j≤i}(cnt_cb·total − cnt_b·n_class), all
    * integer, one double division at the projection.
    *
    * Scale shape: three exact aggregates off the one customer scan (class,
    * band, class×band), a broadcast class×band grid so zero-count bands
    * participate in the cumsum, and a per-class window over ≤ m band rows —
    * every post-scan structure is O(classes·bands), dimension-sized. */
  def qTCloseness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = Tables.customer(s, dir)
      .select($"c_mktsegment", $"c_nationkey",
        floor((OP.dec2($"c_acctbal") * 100).cast("long") / lit(100000.0))
          .as("bal_band"))
    val cls = rows.groupBy($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("n_class"))
    val bands = rows.groupBy($"bal_band").agg(count(lit(1)).as("n_band"))
    val tot = rows.agg(count(lit(1)).as("n_total"),
      countDistinct($"bal_band").as("m"))
    val cb = rows.groupBy($"c_mktsegment", $"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("n_cb"))
    val grid = cls.crossJoin(broadcast(bands))
      .join(cb, Seq("c_mktsegment", "c_nationkey", "bal_band"), "left")
      .na.fill(0L, Seq("n_cb"))
      .crossJoin(broadcast(tot))
    val w = Window.partitionBy($"c_mktsegment", $"c_nationkey")
      .orderBy($"bal_band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("r", sum($"n_cb" * $"n_total" - $"n_band" * $"n_class").over(w))
      .groupBy($"c_mktsegment", $"c_nationkey", $"n_class")
      .agg(sum(abs($"r")).as("sum_abs_r"),
        max($"n_total").as("n_total"), max($"m").as("m"))
      .select($"c_mktsegment", $"c_nationkey", $"n_class".as("k_size"),
        round($"sum_abs_r".cast("double") /
          ($"n_class" * $"n_total" * ($"m" - 1)).cast("double"), 6)
          .as("t_closeness"))
      .withColumn("is_risky", $"t_closeness" > 0.25)
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  private val qTClosenessSql =
    """WITH rows_ AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      / 100000.0) AS bal_band
      |  FROM customer),
      |cls AS (
      |  SELECT c_mktsegment, c_nationkey, count(*) AS n_class
      |  FROM rows_ GROUP BY 1, 2),
      |bands AS (SELECT bal_band, count(*) AS n_band FROM rows_ GROUP BY 1),
      |tot AS (
      |  SELECT count(*) AS n_total, count(DISTINCT bal_band) AS m
      |  FROM rows_),
      |cb AS (
      |  SELECT c_mktsegment, c_nationkey, bal_band, count(*) AS n_cb
      |  FROM rows_ GROUP BY 1, 2, 3),
      |grid AS (
      |  SELECT c.c_mktsegment, c.c_nationkey, b.bal_band, c.n_class,
      |    b.n_band, coalesce(x.n_cb, 0) AS n_cb, t.n_total, t.m
      |  FROM cls c CROSS JOIN bands b CROSS JOIN tot t
      |  LEFT JOIN cb x ON x.c_mktsegment = c.c_mktsegment
      |    AND x.c_nationkey = c.c_nationkey AND x.bal_band = b.bal_band),
      |cum AS (
      |  SELECT c_mktsegment, c_nationkey, n_class, n_total, m,
      |    sum(n_cb * n_total - n_band * n_class) OVER (
      |      PARTITION BY c_mktsegment, c_nationkey ORDER BY bal_band
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
      |  FROM grid)
      |SELECT c_mktsegment, c_nationkey, n_class AS k_size,
      |  round(CAST(sum(abs(r)) AS DOUBLE) /
      |    CAST(n_class * max(n_total) * (max(m) - 1) AS DOUBLE), 6)
      |    AS t_closeness,
      |  round(CAST(sum(abs(r)) AS DOUBLE) /
      |    CAST(n_class * max(n_total) * (max(m) - 1) AS DOUBLE), 6) > 0.25
      |    AS is_risky
      |FROM cum
      |GROUP BY c_mktsegment, c_nationkey, n_class
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  // ----------------------------------------------------------- q_fd_discover
  /** Functional-dependency discovery over orders: for each candidate
    * det → dep pair, count determinant values with more than one distinct
    * dependent — zero violators means the FD holds (schema-inference /
    * key-discovery primitive a catalog crawler runs on unknown tables).
    * o_orderkey → o_custkey holds (key); the behavioral candidates don't.
    *
    * Scale shape: each candidate is one two-level exact aggregation
    * (det,dep → det → 1 row), map-side combinable; candidates are a
    * fixed small list so the scan count is bounded (a production crawler
    * would batch all pairs of one determinant into a single grouping). */
  def qFdDiscover(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    def audit(det: String, dep: String): DataFrame =
      o.groupBy(col(det)).agg(countDistinct(col(dep)).as("n_dep"))
        .agg(count(lit(1)).as("n_det_values"),
          sum(when($"n_dep" > 1L, 1L).otherwise(0L)).as("n_violating"),
          max($"n_dep").as("max_dep_per_det"))
        .select(lit(det).as("det_col"), lit(dep).as("dep_col"),
          $"n_det_values", $"n_violating", $"max_dep_per_det",
          ($"n_violating" === 0L).as("fd_holds"))
    audit("o_orderkey", "o_custkey")
      .unionByName(audit("o_custkey", "o_orderpriority"))
      .unionByName(audit("o_orderpriority", "o_orderstatus"))
      .orderBy($"det_col", $"dep_col")
  }

  private val qFdDiscoverSql =
    """WITH f1 AS (
      |  SELECT o_orderkey AS det, count(DISTINCT o_custkey) AS n_dep
      |  FROM orders GROUP BY 1),
      |f2 AS (
      |  SELECT o_custkey AS det, count(DISTINCT o_orderpriority) AS n_dep
      |  FROM orders GROUP BY 1),
      |f3 AS (
      |  SELECT o_orderpriority AS det, count(DISTINCT o_orderstatus) AS n_dep
      |  FROM orders GROUP BY 1),
      |a AS (
      |  SELECT 'o_orderkey' AS det_col, 'o_custkey' AS dep_col,
      |    count(*) AS n_det_values,
      |    CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_violating,
      |    max(n_dep) AS max_dep_per_det
      |  FROM f1
      |  UNION ALL
      |  SELECT 'o_custkey', 'o_orderpriority', count(*),
      |    CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    max(n_dep)
      |  FROM f2
      |  UNION ALL
      |  SELECT 'o_orderpriority', 'o_orderstatus', count(*),
      |    CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    max(n_dep)
      |  FROM f3)
      |SELECT det_col, dep_col, n_det_values, n_violating, max_dep_per_det,
      |  n_violating = 0 AS fd_holds
      |FROM a ORDER BY det_col, dep_col""".stripMargin

  // -------------------------------------------------------------- q_dp_noise
  /** Noisy-count release per market segment — the differential-privacy
    * PLUMBING (group, true count, additive noise, released count) with a
    * deterministic noise source so the gate can replay it: noise is a
    * uniform integer in [−25, 25] drawn from the md5 hash of the group
    * key (the engine-portable uniform this repo already uses for KMV /
    * sampling). A production release swaps the draw for calibrated
    * Laplace sampled from a real RNG — one line — without touching the
    * aggregation shape; bounded-uniform keeps the gate bit-exact where a
    * float ln() inverse-CDF would be last-ulp fragile across engines.
    *
    * Scale shape: one map-side-combined count per group; noise is O(1)
    * arithmetic on the group key. */
  def qDpNoise(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise",
        expr("cast(conv(substring(md5(c_mktsegment), 1, 8), 16, 10) as bigint) % 51")
          - lit(25L))
      .select($"c_mktsegment", $"n_true", $"noise",
        ($"n_true" + $"noise").as("n_released"))
      .orderBy($"c_mktsegment")
  }

  private val qDpNoiseSql =
    """SELECT c_mktsegment, count(*) AS n_true,
      |  ('0x' || substr(md5(c_mktsegment), 1, 8))::BIGINT % 51 - 25 AS noise,
      |  count(*) + ('0x' || substr(md5(c_mktsegment), 1, 8))::BIGINT % 51 - 25
      |    AS n_released
      |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------- q_k_anonymity
  /** k-anonymity audit over customer quasi-identifiers — the governance
    * check run before a table (or a training corpus's metadata) leaves the
    * warehouse: an equivalence class of quasi-identifier values smaller
    * than k re-identifies its members (Sweeney 2002). The reference's
    * role-based grants (/root/reference/01_DW_schema_and_roles_creation/
    * combined_dw_schema.sql roles) control WHO reads; this measures what
    * the data itself leaks, per generalization level of the standard
    * ladder: (segment, nation, balance-band) → drop the band → drop the
    * nation. One row per level with its class count, k (min class size),
    * and how many classes/rows sit below k = 5 — the publisher walks down
    * until n_risky_rows hits zero.
    *
    * Scale shape: each level is one map-side-combinable aggregate to its
    * class table (bounded by the QI domain, dim-sized) and an O(classes)
    * rollup; levels union to 3 rows. The balance band is floor(cents /
    * 10⁵) over the EXACT cents value — band boundaries land on exactly
    * representable doubles, so both engines band identically (negative
    * balances floor toward -∞ on both). */
  def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = 5
    val cust = Tables.customer(s, dir).select(
      $"c_mktsegment", $"c_nationkey",
      floor((OP.dec2($"c_acctbal") * 100).cast("long") / lit(100000.0))
        .as("bal_band"))
    def level(name: String, qis: Seq[String]): DataFrame =
      cust.groupBy(qis.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_classes"),
          min($"n").as("k_anon"),
          sum(when($"n" < K, 1L).otherwise(0L)).as("n_risky_classes"),
          sum(when($"n" < K, $"n").otherwise(0L)).as("n_risky_rows"))
        .select(lit(name).as("level"), $"n_classes", $"k_anon",
          $"n_risky_classes", $"n_risky_rows")
    level("1_seg_nation_band", Seq("c_mktsegment", "c_nationkey", "bal_band"))
      .unionByName(level("2_seg_nation", Seq("c_mktsegment", "c_nationkey")))
      .unionByName(level("3_seg", Seq("c_mktsegment")))
      .orderBy($"level")
  }

  private val qKAnonymitySql =
    """WITH cust AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    floor(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      / 100000.0) AS bal_band
      |  FROM customer),
      |l1 AS (SELECT c_mktsegment, c_nationkey, bal_band, count(*) AS n
      |       FROM cust GROUP BY 1, 2, 3),
      |l2 AS (SELECT c_mktsegment, c_nationkey, count(*) AS n
      |       FROM cust GROUP BY 1, 2),
      |l3 AS (SELECT c_mktsegment, count(*) AS n FROM cust GROUP BY 1),
      |lvl AS (
      |  SELECT '1_seg_nation_band' AS level, count(*) AS n_classes,
      |    min(n) AS k_anon,
      |    CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_risky_classes,
      |    CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |      AS n_risky_rows
      |  FROM l1
      |  UNION ALL
      |  SELECT '2_seg_nation', count(*), min(n),
      |    CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |  FROM l2
      |  UNION ALL
      |  SELECT '3_seg', count(*), min(n),
      |    CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |  FROM l3)
      |SELECT * FROM lvl ORDER BY level""".stripMargin

  // ------------------------------------------------------------- q_reconcile
  /** Header/detail reconciliation audit: every order's stored total vs
    * the recomputed Σ extendedprice·(1−discount)·(1+tax) of its lines,
    * bucketed match / diverged / no_lines — the financial-close check
    * every warehouse runs between a fact header and its detail table.
    * (On this synthetic data all joined orders diverge and 257-per-15k
    * are childless — the report IS the finding.)
    *
    * Engine parity: the recomputation runs entirely in exact decimal
    * (price 18,2 × two 4,2 factors), the comparison is |diff| < 0.01 in
    * decimal space — no doubles anywhere. One keyed aggregate + one
    * left join on the order key. */
  def qReconcile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lineTotals = Tables.lineitem(s, dir)
      .select($"l_orderkey",
        (OP.dec2($"l_extendedprice")
          * (lit(1) - $"l_discount".cast(DecimalType(4, 2)))
          * (lit(1) + $"l_tax".cast(DecimalType(4, 2)))).as("line_amt"))
      .groupBy($"l_orderkey").agg(sum($"line_amt").as("computed"))
    Tables.orders(s, dir)
      .join(lineTotals, $"o_orderkey" === $"l_orderkey", "left")
      .select(
        when($"computed".isNull, "no_lines")
          .when(abs(OP.dec2($"o_totalprice") - $"computed")
            < lit(0.01).cast(DecimalType(4, 2)), "match")
          .otherwise("diverged").as("status"))
      .groupBy($"status").agg(count(lit(1)).as("n_orders"))
      .orderBy($"status")
  }

  private val qReconcileSql =
    """WITH lt AS (
      |  SELECT l_orderkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |      * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS computed
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT status, count(*) AS n_orders FROM (
      |  SELECT CASE
      |    WHEN lt.computed IS NULL THEN 'no_lines'
      |    WHEN abs(CAST(o.o_totalprice AS DECIMAL(18,2)) - lt.computed)
      |         < CAST(0.01 AS DECIMAL(4,2)) THEN 'match'
      |    ELSE 'diverged' END AS status
      |  FROM orders o LEFT JOIN lt ON lt.l_orderkey = o.o_orderkey)
      |GROUP BY status
      |ORDER BY status""".stripMargin

  // ------------------------------------------------------ q_constraint_audit
  /** Whole-schema constraint audit — the declarative-constraints layer a
    * warehouse DDL states (PRIMARY KEY / FOREIGN KEY / CHECK / NOT NULL,
    * the reference declares these in
    * /root/reference/01_DW_schema_and_roles_creation/combined_dw_schema.sql)
    * re-expressed as one verification report over tables that, like most
    * lake tables, ENFORCE none of them: per constraint, total rows and
    * violation count. The testdata's deliberate duplicate
    * (l_orderkey, l_linenumber) rows surface here as pk_lineitem
    * violations — the audit proves it detects, not just recounts.
    *
    * Scale shape: each PK/CHECK/NOT NULL row is ONE map-side-combinable
    * aggregate over its table; each FK row is one keyed left join against
    * the DISTINCT parent keys (dim parents broadcast; the lineitem→orders
    * probe shuffles on the join key — the honest cost of auditing a fact-
    * to-fact FK). The exact COUNT(DISTINCT) PK probes are the audit-grade
    * path; at 100 TB swap in the kmv sketch (q_profile_approx's pattern)
    * for a monitoring-grade pass. Output is O(constraints) rows. */
  def qConstraintAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val p  = Tables.part(s, dir)
    val ev = Tables.events(s, dir)
    def tag(name: String, table: String)(df: DataFrame): DataFrame =
      df.select(lit(name).as("constraint_name"), lit(table).as("table_name"),
        $"n_rows", $"n_violations")
    def pk(name: String, table: String, df: DataFrame,
           keys: Column*): DataFrame =
      tag(name, table)(df.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(keys.head, keys.tail: _*))
          .as("n_violations")))
    def fk(name: String, table: String, child: DataFrame, childKey: Column,
           parentKeys: DataFrame): DataFrame =
      tag(name, table)(child
        .join(parentKeys.withColumnRenamed(parentKeys.columns.head, "pkey")
          .distinct(), childKey === $"pkey", "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when($"pkey".isNull, lit(1))).as("n_violations")))
    def chk(name: String, table: String, df: DataFrame,
            bad: Column): DataFrame =
      tag(name, table)(df.agg(count(lit(1)).as("n_rows"),
        count(when(bad, lit(1))).as("n_violations")))
    Seq(
      pk("pk_customer", "customer", c, $"c_custkey"),
      pk("pk_orders", "orders", o, $"o_orderkey"),
      pk("pk_part", "part", p, $"p_partkey"),
      pk("pk_lineitem", "lineitem", li, $"l_orderkey", $"l_linenumber"),
      fk("fk_orders_customer", "orders", o, $"o_custkey",
        c.select($"c_custkey")),
      fk("fk_lineitem_orders", "lineitem", li, $"l_orderkey",
        o.select($"o_orderkey")),
      fk("fk_lineitem_part", "lineitem", li, $"l_partkey",
        p.select($"p_partkey")),
      chk("chk_lineitem_quantity", "lineitem", li,
        $"l_quantity" < 1 || $"l_quantity" > 50),
      chk("chk_lineitem_discount", "lineitem", li,
        $"l_discount" < 0 || $"l_discount" > 1),
      chk("chk_orders_totalprice", "orders", o, $"o_totalprice" <= 0),
      chk("nn_events_user", "events", ev, $"user_id".isNull))
      .reduce(_ unionByName _)
      .withColumn("ok", $"n_violations" === 0L)
      .orderBy($"constraint_name")
  }

  private val qConstraintAuditSql =
    """SELECT constraint_name, table_name, n_rows, n_violations,
      |  n_violations = 0 AS ok
      |FROM (
      |  SELECT 'pk_customer' AS constraint_name, 'customer' AS table_name,
      |    count(*) AS n_rows,
      |    count(*) - count(DISTINCT c_custkey) AS n_violations
      |  FROM customer
      |  UNION ALL
      |  SELECT 'pk_orders', 'orders', count(*),
      |    count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL
      |  SELECT 'pk_part', 'part', count(*),
      |    count(*) - count(DISTINCT p_partkey) FROM part
      |  UNION ALL
      |  SELECT 'pk_lineitem', 'lineitem', count(*),
      |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'fk_orders_customer', 'orders', count(*),
      |    count(CASE WHEN c.pkey IS NULL THEN 1 END)
      |  FROM orders o LEFT JOIN
      |    (SELECT DISTINCT c_custkey AS pkey FROM customer) c
      |    ON c.pkey = o.o_custkey
      |  UNION ALL
      |  SELECT 'fk_lineitem_orders', 'lineitem', count(*),
      |    count(CASE WHEN p.pkey IS NULL THEN 1 END)
      |  FROM lineitem l LEFT JOIN
      |    (SELECT DISTINCT o_orderkey AS pkey FROM orders) p
      |    ON p.pkey = l.l_orderkey
      |  UNION ALL
      |  SELECT 'fk_lineitem_part', 'lineitem', count(*),
      |    count(CASE WHEN p.pkey IS NULL THEN 1 END)
      |  FROM lineitem l LEFT JOIN
      |    (SELECT DISTINCT p_partkey AS pkey FROM part) p
      |    ON p.pkey = l.l_partkey
      |  UNION ALL
      |  SELECT 'chk_lineitem_quantity', 'lineitem', count(*),
      |    count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'chk_lineitem_discount', 'lineitem', count(*),
      |    count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'chk_orders_totalprice', 'orders', count(*),
      |    count(CASE WHEN o_totalprice <= 0 THEN 1 END) FROM orders
      |  UNION ALL
      |  SELECT 'nn_events_user', 'events', count(*),
      |    count(CASE WHEN user_id IS NULL THEN 1 END) FROM events)
      |ORDER BY constraint_name""".stripMargin

  // ------------------------------------------------------ q_inferred_members
  /** Late-arriving-dimension handling (Kimball "inferred members"): facts
    * referencing a dim key the dimension hasn't loaded yet get a
    * PLACEHOLDER dim row (key + UNKNOWN attributes + inferred flag) so FK
    * integrity and star joins hold; the real row later overwrites it via
    * the normal SCD upsert. The reference's pipeline simply drops
    * FK-misses to a log (J4, `q_fk_miss_log`) — this is the standard
    * warehouse upgrade that keeps the fact row queryable instead.
    *
    * Fixture: the dim snapshot is simulated mid-load by withholding every
    * 50th customer; the query emits the inferred-member rows that the
    * fact load would insert, with the count of facts waiting on each —
    * exactly the rows a dbt "inferred dimension" model materializes.
    *
    * Scale shape: one fact aggregate to the FK grain (map-side
    * combined), one left_anti against the dim key set on the same key —
    * both ride the custkey shuffle; output is the (small) missing-key
    * set. */
  def qInferredMembers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dimLoaded = Tables.customer(s, dir)
      .filter($"c_custkey" % 50 =!= 0)
      .select($"c_custkey")
    val waiting = Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_facts_waiting"),
        min($"o_orderdate").as("first_seen"))
    waiting
      .join(dimLoaded, $"o_custkey" === $"c_custkey", "left_anti")
      .select($"o_custkey".as("c_custkey"),
        lit("UNKNOWN (inferred)").as("c_name"),
        lit(true).as("is_inferred"),
        $"n_facts_waiting", $"first_seen")
      .orderBy($"c_custkey")
  }

  private val qInferredMembersSql =
    """WITH dim_loaded AS (
      |  SELECT c_custkey FROM customer WHERE c_custkey % 50 <> 0),
      |waiting AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_facts_waiting,
      |    min(o_orderdate) AS first_seen
      |  FROM orders GROUP BY 1)
      |SELECT o_custkey AS c_custkey,
      |  'UNKNOWN (inferred)' AS c_name,
      |  true AS is_inferred,
      |  n_facts_waiting, first_seen
      |FROM waiting
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM dim_loaded d WHERE d.c_custkey = waiting.o_custkey)
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_inferred_members" -> (qInferredMembers _),
    "q_constraint_audit" -> (qConstraintAudit _),
    "q_reconcile"      -> (qReconcile _),
    "q_l_diversity"    -> (qLDiversity _),
    "q_t_closeness"    -> (qTCloseness _),
    "q_fd_discover"    -> (qFdDiscover _),
    "q_dp_noise"       -> (qDpNoise _),
    "q_k_anonymity"    -> (qKAnonymity _),
    "q_cascade_delete" -> (qCascadeDelete _),
    "q_scd2_merge"  -> (qScd2Merge _),
    "q_dedup_log"   -> (qDedupLog _),
    "q_impute_mean" -> (qImputeMean _),
    "q_profile"     -> (qProfile _),
    "q_table_diff"  -> (qTableDiff _),
    "q_incremental_agg" -> (qIncrementalAgg _))

  val oracle: Map[String, String] = Map(
    "q_inferred_members" -> qInferredMembersSql,
    "q_constraint_audit" -> qConstraintAuditSql,
    "q_reconcile"      -> qReconcileSql,
    "q_l_diversity"    -> qLDiversitySql,
    "q_t_closeness"    -> qTClosenessSql,
    "q_fd_discover"    -> qFdDiscoverSql,
    "q_dp_noise"       -> qDpNoiseSql,
    "q_k_anonymity"    -> qKAnonymitySql,
    "q_cascade_delete" -> qCascadeDeleteSql,
    "q_scd2_merge"  -> qScd2MergeSql,
    "q_dedup_log"   -> qDedupLogSql,
    "q_impute_mean" -> qImputeMeanSql,
    "q_profile"     -> qProfileSql,
    "q_table_diff"  -> qTableDiffSql,
    "q_incremental_agg" -> qIncrementalAggSql)
}
