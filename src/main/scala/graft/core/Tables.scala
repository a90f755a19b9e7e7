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
}
