package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Sinks

/** The shipped incremental fact loader — the scale-safe form of the
  * high-watermark pattern (dbt is_incremental(),
  * /root/reference/05_dbt_implementation/.../fact_expenses.sql:39-45).
  *
  * VERDICT r1 flagged the q_hwm_incremental demo shape (watermark via
  * `fact.agg(max(...))`) as unacceptable at scale: that is a full fact scan
  * per batch. Here the watermark lives in a tiny parquet STATE TABLE
  * (one row per fact), so each batch pays:
  *   - O(1): read the state row;
  *   - O(batch): filter candidates above the watermark;
  *   - O(tail): anti-join dedup against ONLY the fact partitions at/after
  *     the watermark — facts are written `partitionBy(p_year, p_month)`
  *     derived from `part_col`, so the existing-side read
  *     partition-prunes to the overlap window instead of scanning
  *     history (TL_combine.sql:189-203 semantics, bounded).
  *
  * The dedup window assumption (late data never arrives more than one
  * watermark behind) is the standard incremental contract; widen the tail
  * predicate if the pipeline's lateness bound is larger.
  */
object Incremental {

  private val stateSchema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("watermark", StringType)))

  /** Current watermark for `table` (ISO date string), if any. */
  def readWatermark(spark: SparkSession, statePath: String,
                    table: String): Option[String] = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(statePath))) return None
    spark.read.schema(stateSchema).parquet(statePath)
      .filter(col("table_name") === table)
      .collect().headOption.flatMap(r => Option(r.getString(1)))
  }

  private def writeWatermark(spark: SparkSession, statePath: String,
                             table: String, value: String): Unit = {
    import scala.jdk.CollectionConverters._
    val others =
      if (new Path(statePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration).exists(new Path(statePath)))
        spark.read.schema(stateSchema).parquet(statePath)
          .filter(col("table_name") =!= table)
      else spark.createDataFrame(List.empty[org.apache.spark.sql.Row].asJava, stateSchema)
    val mine = spark.createDataFrame(
      List(org.apache.spark.sql.Row(table, value)).asJava, stateSchema)
    Sinks.overwriteSwap(others.unionByName(mine).coalesce(1), statePath)
  }

  /** Result counts for audit wiring. `nullPartition` rows (no partition
    * date) are excluded up-front and reported here — they cannot be
    * watermarked or partitioned and would otherwise be dropped silently
    * (or, on a first batch, crash the watermark advance). */
  final case class LoadStats(candidates: Long, nullPartition: Long,
                             aboveWatermark: Long, appended: Long)

  /** Physical partition scheme for the fact tables: (year, month) derived
    * from the watermark date column (SURVEY §4's deliberate improvement
    * over the reference's unpartitioned Postgres facts, landed per the
    * round-7 verdict). Day-grain `partitionBy(date)` — the previous
    * layout — creates one directory per day: at 100 TB that is tens of
    * thousands of partitions of small files and a metastore-sized
    * listing per scan. (year, month) keeps the partition count bounded
    * (12/year), each partition wide enough for full-size files, while
    * the watermark prune still skips all history at planning time; the
    * residual over-read is at most the watermark's own month, which the
    * row-level date filter then trims. */
  private[graft] val YearCol = "p_year"
  private[graft] val MonthCol = "p_month"

  /** The existing-fact tail the anti-dedup compares against: only
    * partitions at/after the watermark's (year, month). The prune
    * predicate references ONLY the physical partition columns, so it
    * resolves at planning time to a partition-list prune — the scan
    * never touches historical partitions (PlanAuditSpec asserts this);
    * the row-level date filter tightens the surviving month to the
    * exact watermark day. At 100 TB this is the difference between
    * reading a month and reading years. */
  private[graft] def tailScan(spark: SparkSession, factPath: String,
                              partCol: String, hwm: Option[String]): DataFrame = {
    val fact = spark.read.parquet(factPath)
    // a fact written under the pre-r8 day-grain layout (or by another
    // writer) lacks the (p_year, p_month) partition columns; the prune
    // below would then fail deep inside analysis with an
    // unresolved-column error that doesn't name the real problem, so
    // detect the layout up front and fail with the remedy (r9 ADVICE)
    val cols = fact.columns.toSet
    if (!cols.contains(YearCol) || !cols.contains(MonthCol))
      throw new IllegalStateException(
        s"fact at $factPath lacks the ($YearCol, $MonthCol) partition " +
        "layout this loader prunes on (found: " +
        fact.columns.sorted.mkString(", ") + "); reformat required — " +
        "rewrite the fact once with Incremental.appendIncremental (it " +
        s"derives $YearCol/$MonthCol from the `$partCol` date column) " +
        "before resuming incremental loads")
    hwm match {
      case Some(w) =>
        val (y, m) = (w.substring(0, 4).toInt, w.substring(5, 7).toInt)
        fact
          .filter(col(YearCol) > y ||
            (col(YearCol) === y && col(MonthCol) >= m))
          .filter(col(partCol) >= lit(w).cast(DateType))
          .drop(YearCol, MonthCol)
      case None => fact.drop(YearCol, MonthCol)
    }
  }

  /** Append `candidates` to the partitioned fact at `factPath`:
    * watermark-filter → tail-bounded anti-dedup on `keyCols` → append →
    * advance watermark. `partCol` must be a DateType column; the
    * physical partition keys are its derived (p_year, p_month) and the
    * column itself stays in the data files. */
  def appendIncremental(candidates: DataFrame, factPath: String,
                        statePath: String, table: String,
                        partCol: String, keyCols: Seq[String]): LoadStats = {
    val spark = candidates.sparkSession
    val hwm = readWatermark(spark, statePath, table)

    // cache once: the lineage (CSV parse + cleaning, typically) is
    // otherwise evaluated three times for the stats counters alone
    val cand = candidates.cache()
    val nCand = cand.count()
    val withPart = cand.filter(col(partCol).isNotNull)
    val nNullPart = nCand - withPart.count()
    val fresh = hwm match {
      // `>=` deliberately re-admits watermark-day rows (same-day late
      // arrivals); the tail anti-dedup below makes the replay safe. Do NOT
      // tighten to `>`: that permanently drops a new order landing on the
      // watermark date.
      case Some(w) => withPart.filter(col(partCol) >= lit(w).cast(DateType))
      case None    => withPart
    }
    val nFresh = fresh.count()

    val fs = new Path(factPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deduped =
      if (fs.exists(new Path(factPath)))
        Facts.antiDedup(fresh, tailScan(spark, factPath, partCol, hwm), keyCols)
      else fresh
    // Materialize counts AND the new max BEFORE appending: writing to
    // factPath invalidates any cached plan that reads it (Spark recaches
    // by path), so post-append the dedup plan would recompute against the
    // already-appended fact and dedup itself to empty.
    val rows = deduped.cache()
    val nNew = rows.count()
    val newMax: Option[String] =
      if (nNew > 0)
        Option(rows.agg(max(col(partCol)).cast(StringType)).collect()(0).getString(0))
      else None

    if (nNew > 0) {
      rows
        .withColumn(YearCol, year(col(partCol)))
        .withColumn(MonthCol, month(col(partCol)))
        .write.mode("append").partitionBy(YearCol, MonthCol).parquet(factPath)
      // newMax is always defined here: null-partition rows were excluded
      // before the watermark filter, so appended rows carry real dates
      val advanced = (hwm, newMax) match {
        case (Some(w), Some(m)) => if (w >= m) w else m
        case (_, Some(m)) => m
        case _ => throw new IllegalStateException(
          "appended rows with no partition value despite the isNotNull guard")
      }
      writeWatermark(spark, statePath, table, advanced)
    }
    rows.unpersist()
    cand.unpersist()
    LoadStats(nCand, nNullPart, nFresh, nNew)
  }
}
