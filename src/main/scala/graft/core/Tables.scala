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
  /** events.ts is nanosecond-precision in parquet; Spark timestamps are
    * microsecond. Truncate ns→µs exactly (integer div) — the DuckDB oracle
    * mirrors this with CAST(ts AS TIMESTAMP), which also truncates to µs. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
