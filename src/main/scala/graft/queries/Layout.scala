package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Physical-layout operators — the write-side decisions that make 100 TB
  * readable: multi-dimensional clustering keys for data skipping. A
  * parquet scan prunes row groups by min/max statistics, but min/max on a
  * single sort column only skips for predicates on THAT column; a Z-order
  * (Morton) key interleaves the bits of several columns so rows close in
  * the key are close in EVERY interleaved dimension — one clustered write
  * serves range predicates on any of them (the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER; Morton 1966).
  *
  * The reference loads its facts unordered
  * (/root/reference/03_load_into_fact_and_dim_tables/TL_combine.sql:189-203
  * — NOT-EXISTS guarded INSERT…SELECT, no ORDER BY); at its row counts scan
  * order is irrelevant. At 100 TB
  * the cluster key IS the difference between scanning 100 TB and 100 GB
  * for a 2-predicate slice.
  */
object Layout {

  /** Bit-interleave two 8-bit ints into a 16-bit Morton code using plain
    * shift/mask arithmetic — identical integer ops on both engines (no
    * engine-specific bit intrinsics), codegen-friendly (a 16-term constant
    * fold of shifts and ands, no UDF). */
  private def morton8(x: Column, y: Column): Column =
    (0 until 8).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1)) * lit(1 << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1)) * lit(1 << (2 * b + 1)))
    }.reduce(_ + _)

  private def morton8Sql(x: String, y: String): String =
    (0 until 8).map { b =>
      s"(($x >> $b) & 1) * ${1 << (2 * b)} + (($y >> $b) & 1) * ${1 << (2 * b + 1)}"
    }.mkString(" + ")

  // ------------------------------------------------------------- q_zorder
  /** Z-order clustering key over part's (size, retail-price) — the layout
    * pass a warehouse runs before writing a fact sorted for 2-D data
    * skipping. Emits each part's quantized coordinates, its 16-bit Morton
    * key, and the target file/row-group id (`cluster` = key's high byte:
    * 256 balanced buckets whose members are rectangle-local in (size,
    * price) space).
    *
    * Quantization — both coordinates scaled to the FULL 8-bit domain, the
    * way production z-order (Delta OPTIMIZE ZORDER) range-ranks each
    * column before interleaving: an unbalanced interleave (one dim on 6
    * bits, the other on 8) stratifies files mostly by the wider dim and
    * barely prunes the narrower one. size 1..50 → ×5 → 5..250; price over
    * its [900, 1000) data domain in exact integer cents —
    * `(cents − 90000) div 40` → 0..249. All integral arithmetic, identical
    * on both engines (never a double truncate-vs-round cast).
    *
    * Scale shape: computing the key is a stateless per-row map; the write
    * itself is `repartitionByRange(cluster).sortWithinPartitions(zval)` —
    * one range shuffle, the same cost as any global sort the load was
    * already paying, after which BOTH `p_size BETWEEN a AND b` and
    * `p_retailprice BETWEEN c AND d` predicates prune ~√-proportionally
    * instead of one of them scanning everything. */
  /** part with quantized coordinates + Morton key attached (all original
    * columns kept) — shared by the gated key derivation [[qZorder]] and the
    * clustered write [[writeZClustered]]. */
  private def zKeyed(s: SparkSession, dir: String): DataFrame = {
    val x = (col("p_size").cast("int") * lit(5)).bitwiseAND(lit(255))
    val y = expr("cast((cast(cast(p_retailprice as decimal(18,2)) * 100 " +
      "as bigint) - 90000) div 40 as int)").bitwiseAND(lit(255))
    Tables.part(s, dir)
      .withColumn("zx", x).withColumn("zy", y)
      .withColumn("zval", morton8(col("zx"), col("zy")))
      .withColumn("cluster", shiftright(col("zval"), 8))
  }

  def qZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    zKeyed(s, dir)
      .select($"p_partkey", $"zx", $"zy", $"zval", $"cluster")
      .orderBy($"zval", $"p_partkey")
  }

  /** The write side the scaladoc promises: part laid out for 2-D data
    * skipping — `files` range-partitions of contiguous zval, sorted within,
    * so every file/row-group covers a small rectangle of (size, price)
    * space and its parquet min/max statistics prune range predicates on
    * EITHER column. PlanAuditSpec asserts the skipping against linear and
    * single-column-sorted layouts via [[rowGroupStats]]. */
  def writeZClustered(s: SparkSession, dir: String, path: String,
                      files: Int = 32): Unit =
    zKeyed(s, dir)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zx", "zy", "cluster")
      .write.mode("overwrite").parquet(path)

  /** Data-skipping diagnostic: (overlapping, total) row-group counts for a
    * closed-range predicate `lo <= column <= hi` over a parquet directory,
    * read straight from the file footers' min/max statistics — the exact
    * pruning decision a min/max-indexed reader (parquet row-group skip,
    * Delta/Iceberg file skip) makes, measured without running a scan. */
  def rowGroupStats(s: SparkSession, path: String, column: String,
                    lo: Double, hi: Double): (Int, Int) =
    rowGroupStats(s, path, Seq((column, lo, hi)))

  /** Conjunctive form: row groups whose min/max statistics overlap EVERY
    * `(column, lo, hi)` range — the candidate set a reader must scan for
    * an AND-of-ranges predicate. */
  def rowGroupStats(s: SparkSession, path: String,
                    preds: Seq[(String, Double, Double)]): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    var overlap = 0
    var total = 0
    fs.listStatus(root).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try reader.getFooter.getBlocks.asScala.foreach { block =>
          total += 1
          val hit = preds.forall { case (column, lo, hi) =>
            val cc = block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .getOrElse(throw new IllegalArgumentException(
                s"column $column not in ${f.getPath}"))
            val st = cc.getStatistics
            val mn = st.genericGetMin.asInstanceOf[Number].doubleValue()
            val mx = st.genericGetMax.asInstanceOf[Number].doubleValue()
            mx >= lo && mn <= hi
          }
          if (hit) overlap += 1
        } finally reader.close()
      }
    (overlap, total)
  }

  private val qZorderSql = {
    val x = "(CAST(p_size AS INTEGER) * 5) & 255"
    val y = "CAST((CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 " +
      "AS BIGINT) - 90000) // 40 AS INTEGER) & 255"
    s"""WITH q AS (
       |  SELECT p_partkey, $x AS zx, $y AS zy FROM part)
       |SELECT p_partkey, zx, zy,
       |  ${morton8Sql("zx", "zy")} AS zval,
       |  (${morton8Sql("zx", "zy")}) >> 8 AS cluster
       |FROM q
       |ORDER BY zval, p_partkey""".stripMargin
  }

  // ------------------------------------------------------------- registry
  // --------------------------------------------------------- q_encoding_stats
  /** Storage-encoding advisory: per candidate column, cardinality and the
    * run count the column would RLE into under the current physical order —
    * runs counted WITHIN 1000-key blocks (row-group-sized units, block
    * boundaries break runs) so the window is block-partitioned and fully
    * distributed, and the number mirrors what a parquet writer's
    * dictionary/RLE encoder actually sees per row group. High n/runs ⇒
    * RLE/dictionary wins; near-1 ⇒ plain encoding. The same scan feeds
    * every column's stats (one window per column, same partitioning). */
  def qEncodingStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), expr("o_orderkey div 1000").as("blk"),
        col("o_orderstatus"), col("o_orderpriority"))
    val w = Window.partitionBy(col("blk")).orderBy(col("o_orderkey"))
    def statsFor(c: String) = {
      val runs = o
        .withColumn("prev", lag(col(c), 1).over(w))
        .select(count(lit(1)).as("n_rows"),
          count(when(col("prev").isNull || col("prev") =!= col(c), 1))
            .as("n_runs"))
      val nd = o.agg(countDistinct(col(c)).as("n_distinct"))
      runs.crossJoin(nd)
        .select(lit(c).as("column_name"), col("n_rows"), col("n_distinct"),
          col("n_runs"),
          round(col("n_rows").cast("double") / col("n_runs"), 2)
            .as("rle_ratio"))
    }
    statsFor("o_orderstatus").unionByName(statsFor("o_orderpriority"))
      .orderBy(col("column_name"))
  }

  private def encodingStatsCol(c: String): String =
    s"""SELECT '$c' AS column_name,
       |  count(*) AS n_rows,
       |  (SELECT count(DISTINCT $c) FROM orders) AS n_distinct,
       |  count(*) FILTER (prev IS NULL OR prev <> $c) AS n_runs,
       |  round(CAST(count(*) AS DOUBLE)
       |        / count(*) FILTER (prev IS NULL OR prev <> $c), 2)
       |    AS rle_ratio
       |FROM (SELECT $c, lag($c, 1) OVER (
       |        PARTITION BY o_orderkey // 1000 ORDER BY o_orderkey) AS prev
       |      FROM orders)""".stripMargin

  private val qEncodingStatsSql =
    s"""SELECT * FROM (
       |${encodingStatsCol("o_orderstatus")}
       |UNION ALL
       |${encodingStatsCol("o_orderpriority")})
       |ORDER BY column_name""".stripMargin

  // ------------------------------------------------------------ q_skew_stats
  /** Join-key skew diagnostic over the three hottest fact keys — the
    * number that decides whether a join needs salting (core/Skew) BEFORE
    * it runs: per key column, the distinct-key count, row count, heaviest
    * key's rows, and skew ratio (heaviest key vs the uniform share). A
    * ratio near 1 means hash partitioning balances; a ratio of 100 means
    * one reducer gets 100× the average and the join stalls on it.
    *
    * Scale shape: each diagnostic is one map-side-combinable count per
    * key + a second O(keys) aggregate — the cheapest possible full-data
    * pass, and exactly the stats a production pipeline snapshots per load.
    * Exact integers until the single ratio division. */
  def qSkewStats(s: SparkSession, dir: String): DataFrame = {
    def one(df: DataFrame, keyCol: String, label: String): DataFrame =
      df.select(col(keyCol).cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_rows"))
        .select(lit(label).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_rows"),
          round((col("max_rows") * col("n_keys")).cast("double")
            / col("n_rows"), 4).as("skew_ratio"))
    one(Tables.lineitem(s, dir), "l_partkey", "lineitem.l_partkey")
      .unionByName(one(Tables.lineitem(s, dir), "l_orderkey",
        "lineitem.l_orderkey"))
      .unionByName(one(Tables.orders(s, dir), "o_custkey",
        "orders.o_custkey"))
      .orderBy(col("key_col"))
  }

  private val qSkewStatsSql = {
    def one(tbl: String, keyCol: String): String =
      s"""SELECT '$tbl.$keyCol' AS key_col,
         |  count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         |  max(c) AS max_rows,
         |  round(CAST(max(c) * count(*) AS DOUBLE) / sum(c), 4) AS skew_ratio
         |FROM (SELECT CAST($keyCol AS BIGINT) AS k, count(*) AS c
         |      FROM $tbl GROUP BY 1)""".stripMargin
    s"""SELECT * FROM (
       |${one("lineitem", "l_partkey")}
       |UNION ALL
       |${one("lineitem", "l_orderkey")}
       |UNION ALL
       |${one("orders", "o_custkey")})
       |ORDER BY key_col""".stripMargin
  }

  // -------------------------------------------------------- q_partition_stats
  /** Partition-size audit over the natural day partitioning of the event
    * stream — the small-files/hot-partition diagnostic: per day bucket,
    * the row count and a status flag (under half the average = "small",
    * over double = "large"). Small partitions mean file explosion and
    * task-scheduling overhead; large ones mean stragglers — both are fixed
    * at WRITE time (coalesce/repartitionByRange), and this report is what
    * triggers that.
    *
    * Scale shape: one map-side-combinable count per day + a broadcast
    * 1-row average join. Day buckets are integer µs-epoch divisions —
    * engine-identical, no calendar functions. */
  def qPartitionStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byDay = Tables.events(s, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day_bucket"))
      .groupBy($"day_bucket").agg(count(lit(1)).as("n_rows"))
    val avg = byDay
      .agg((sum($"n_rows").cast("double") / count(lit(1))).as("avg_rows"))
    byDay.crossJoin(broadcast(avg))
      .select($"day_bucket", $"n_rows",
        when($"n_rows" * 2 < $"avg_rows", "small")
          .when($"n_rows" > $"avg_rows" * 2, "large")
          .otherwise("ok").as("status"))
      .orderBy($"day_bucket")
  }

  private val qPartitionStatsSql =
    """WITH d AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_bucket
      |  FROM events),
      |b AS (SELECT day_bucket, count(*) AS n_rows FROM d GROUP BY 1),
      |a AS (SELECT CAST(sum(n_rows) AS DOUBLE) / count(*) AS avg_rows FROM b)
      |SELECT day_bucket, n_rows,
      |  CASE WHEN n_rows * 2 < avg_rows THEN 'small'
      |       WHEN n_rows > avg_rows * 2 THEN 'large'
      |       ELSE 'ok' END AS status
      |FROM b CROSS JOIN a
      |ORDER BY day_bucket""".stripMargin

  // ----------------------------------------------------------- q_bucket_join
  /** The write-side answer to the shuffle bill: both join sides stored as
    * BUCKETED tables on the join key (8 buckets, sorted in-bucket), so the
    * fact-fact join reads co-located buckets and the plan contains NO
    * exchange below the join — bucket i of lineitem joins bucket i of
    * orders directly. This is the `bucketBy` technique the 100 TB brief
    * calls out: a recurring join key (orderkey here) is paid for ONCE at
    * write time, and every subsequent join on it is shuffle-free. The
    * reference's warehouse rebuilds facts per load with no physical key
    * (/root/reference/03_load_into_fact_and_dim_tables/TL_combine.sql:189-203);
    * at its scale that's free, at 100 TB the repeated o_orderkey shuffle
    * would dominate every mart refresh.
    *
    * Build-once discipline mirrors IndexStore: the bucketed copies
    * materialize once per (session, corpus) into a PID-scoped tmp
    * warehouse (a real deployment writes them as the canonical tables —
    * the write cost is the load job's, not the query's). The oracle runs
    * the plain join on the raw parquet: green = bucketing changed the
    * physical plan, not the answer. PlanAuditSpec pins the no-exchange-
    * below-the-join shape. */
  def qBucketJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.core.{OracleParity => OP}
    val (liTable, ordTable) = bucketedOrderTables(s, dir)
    s.table(liTable)
      .join(s.table(ordTable), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(OP.discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val bucketRoot: String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_buckets_${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(f): Unit))
    f.getAbsolutePath
  }

  /** Bucketed (lineitem, orders) external tables for `dir`, built at most
    * once per session+corpus (bucketed scans need catalog metadata, hence
    * saveAsTable rather than a bare parquet write). */
  private def bucketedOrderTables(s: SparkSession, dir: String): (String, String) =
    synchronized {
      val dirHash = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val lt = s"graft_bkt_lineitem_$dirHash"
      val ot = s"graft_bkt_orders_$dirHash"
      if (!s.catalog.tableExists(lt)) {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .write.format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$bucketRoot/$lt")
          .mode("overwrite").saveAsTable(lt)
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .write.format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$bucketRoot/$ot")
          .mode("overwrite").saveAsTable(ot)
      }
      (lt, ot)
    }

  private val qBucketJoinSql =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucket_join"    -> (qBucketJoin _),
    "q_zorder"         -> (qZorder _),
    "q_encoding_stats" -> (qEncodingStats _),
    "q_skew_stats"     -> (qSkewStats _),
    "q_partition_stats" -> (qPartitionStats _))

  val oracle: Map[String, String] = Map(
    "q_bucket_join"    -> qBucketJoinSql,
    "q_zorder"         -> qZorderSql,
    "q_encoding_stats" -> qEncodingStatsSql,
    "q_skew_stats"     -> qSkewStatsSql,
    "q_partition_stats" -> qPartitionStatsSql)
}
