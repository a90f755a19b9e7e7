package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata (TPC-H-ish star schema + events stream
  * table + LLM-pipeline tables, see /root/repo/TESTDATA.md).
  *
  * All reads are plain parquet scans — Catalyst pushes filters/projections
  * into the scan (verify with `.explain("formatted")`: `PushedFilters`,
  * `ReadSchema`). At 100 TB these would be partitioned/bucketed tables; the
  * loader API is the single place to swap that in.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The engine's declared session semantics (see Sessions): ANSI off =
    // null-on-cast-failure, matching the reference's pandas
    // `to_numeric(errors='coerce')` cleaning model. Enforced here because
    // externally-built sessions (the driver's Verify/Bench) reach the engine
    // through this single entry point; Sessions.tune is once-per-session
    // guarded, so this costs one conf lookup after the first load.
    Sessions.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts has shipped in two physical parquet types across harness
    * generations: INT64 TIMESTAMP(NANOS) (read as raw nanos via
    * `nanosAsLong`, truncated ns→µs here with integer div) and plain
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ, cast to the session-UTC
    * timestamp — value-identical under the UTC session Sessions enforces).
    * Dispatch on the observed schema so the engine works against either
    * vintage; the DuckDB oracle's CAST(ts AS TIMESTAMP) is the same
    * wall-clock value in both cases. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle environment table-for-table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Content signature of `$dir/$table.parquet`, valid for BOTH physical
    * layouts: a single file (driver testdata) hashes size:mtime; a
    * directory of part files (Spark-written, e.g. ScaleGen) hashes the
    * sorted per-file name:size:mtime listing — the directory's own
    * size/mtime does NOT change when a part file is rewritten in place,
    * so the single-path form would let a memo serve stale values after a
    * regeneration (r12 ADVICE). Shared by every per-(dir, vintage) memo
    * in the engine (adaptive-parameter counts, staged stream fixtures). */
  def signature(dir: String, table: String): String = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(dir, s"$table.parquet")
    if (!java.nio.file.Files.exists(p)) "absent"
    else if (java.nio.file.Files.isRegularFile(p))
      s"${java.nio.file.Files.size(p)}:" +
        s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}"
    else {
      val st = java.nio.file.Files.list(p)
      try st.iterator().asScala.toSeq.sorted.map { f =>
        s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
          s"${java.nio.file.Files.getLastModifiedTime(f).toMillis}"
      }.mkString(",")
      finally st.close()
    }
  }

  /** Memoized scalar count per (dir, table, label, content signature) —
    * for ADAPTIVE-PARAMETER derivation (LSH plane count, IVF stride,
    * blocking-prefix length), where an extra full-scan count() per
    * invocation is pure harness waste but a stale count would desync the
    * Spark-side parameter from the oracle's fresh count(*). The count job
    * runs OUTSIDE the lock so concurrent queries on other dirs never
    * serialize behind a scan (r11/r12 ADVICE); racing duplicates are
    * benign (same key ⇒ same value). */
  private val countMemo =
    scala.collection.mutable.HashMap.empty[(String, String, String), Long]
  def memoCount(dir: String, table: String, label: String)(
      compute: => Long): Long = {
    val key = (dir, label, signature(dir, table))
    countMemo.synchronized(countMemo.get(key)) match {
      case Some(n) => n
      case None =>
        val n = compute
        countMemo.synchronized(countMemo.getOrElseUpdate(key, n))
    }
  }
}
