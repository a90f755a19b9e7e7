package graft.etl

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Cross-cutting ETL context and log-row shapes
  * (/root/reference/01_DW_schema_and_roles_creation/combined_dw_schema.sql:120-142).
  *
  * `asOf` replaces the reference's CURRENT_DATE/current_timestamp so runs
  * are reproducible (SURVEY §2.8 F-now); `jobId` is the uuid threaded
  * through every log row (ET_combined.py:435-439).
  */
final case class JobContext(jobId: String, asOf: Date) {
  def asOfTs: Timestamp = new Timestamp(asOf.getTime)
}

object JobContext {
  def fresh(asOf: Date = Date.valueOf("2024-01-01")): JobContext =
    JobContext(java.util.UUID.randomUUID().toString, asOf)
}

/** One audit_log row: per-stage row counts + status
  * (combined_dw_schema.sql:120-130; written A2_hr_etl.py:103-119). */
final case class AuditEntry(
    jobId: String,
    tableName: String,
    etlStage: String,
    rowsProcessed: Long,
    rowsFailed: Long,
    status: String, // success | partial | failed
    message: String)

object AuditEntry {
  val schema: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("table_name", StringType),
    StructField("etl_stage", StringType),
    StructField("rows_processed", LongType),
    StructField("rows_failed", LongType),
    StructField("status", StringType),
    StructField("message", StringType),
    StructField("log_timestamp", TimestampType)))

  /** Derive status the way the reference does: failed rows → partial. */
  def of(ctx: JobContext, table: String, stage: String,
         processed: Long, failed: Long, message: String): AuditEntry =
    AuditEntry(ctx.jobId, table, stage, processed, failed,
      if (failed == 0) "success" else "partial", message)

  def toDf(spark: SparkSession, ctx: JobContext, entries: Seq[AuditEntry]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(entries.map(e => Row(
        e.jobId, e.tableName, e.etlStage, e.rowsProcessed, e.rowsFailed,
        e.status, e.message, ctx.asOfTs))),
      schema)
}

/** data_quality_log row shape (combined_dw_schema.sql:133-142). Produced as
  * DataFrames by [[DqEngine]], never row-by-row. */
object DqLog {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit

  /** The one place the log-row projection lives: every producer
    * (rule engine, dedup capture, FK-miss, imputation log) selects exactly
    * these columns, so a schema change edits one site. */
  def entry(ctx: JobContext, table: String, column: String,
            rowRef: Column, original: Column, issue: String): Seq[Column] = Seq(
    lit(ctx.jobId).as("job_id"),
    lit(table).as("table_name"),
    lit(column).as("column_name"),
    rowRef.cast(StringType).as("row_reference"),
    original.cast(StringType).as("original_value"),
    lit(issue).as("issue"),
    lit(ctx.asOfTs).as("log_timestamp"))

  val schema: StructType = StructType(Seq(
    StructField("job_id", StringType),
    StructField("table_name", StringType),
    StructField("column_name", StringType),
    StructField("row_reference", StringType),
    StructField("original_value", StringType),
    StructField("issue", StringType),
    StructField("log_timestamp", TimestampType)))

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)
}
