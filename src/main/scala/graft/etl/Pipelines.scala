package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.DqEngine.Rule
import graft.functions.Cleaning
import graft.io.Sinks

/** One ETL run's output: cleaned staging frame + its DQ log + audit entry. */
final case class EtlResult(staging: DataFrame, dqLog: DataFrame, audit: AuditEntry)

/** The three departmental clean→staging pipelines, re-expressing
  * /root/reference/02_Extract_and_transform_raw_data/ET_combined.py
  * (HR :10-163, Finance :165-279, Operations :282-428) as rule lists over
  * the [[DqEngine]]. Raw ingest is header CSV with every column string-typed
  * (late typing, mirroring the reference's TEXT staging columns —
  * combined_dw_schema.sql:156,172,184-185); types land in the final select.
  *
  * Each pipeline is a pure DataFrame → (DataFrame, DataFrame, AuditEntry)
  * function; [[Etl.runAll]] orchestrates the three and owns all writes
  * (staging via overwrite-swap, logs via append) — the reference's
  * `if_exists="replace"` / `"append"` split.
  */
object Etl {

  private def rawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  private val dec12_2 = DecimalType(12, 2)

  // ------------------------------------------------------------------- HR
  /** A2_hr_etl.py / ET_combined.py:10-163. Fallback EmployeeID `TEMP_{n}`
    * uses a global row_number — single-partition by design: raw seed files
    * are driver-small; a 100 TB ingest would use a key-based reference
    * instead (SURVEY §7 row-order hard part). */
  def hr(spark: SparkSession, rawPath: String, ctx: JobContext): EtlResult =
    hrFrame(spark, rawCsv(spark, rawPath), ctx)

  /** Same pipeline over an already-ingested raw frame (all-string columns,
    * header promoted) — the [[graft.sources.Xlsx]] path enters here, so
    * workbook and CSV ingest share every rule downstream. */
  def hrFrame(spark: SparkSession, raw: DataFrame, ctx: JobContext): EtlResult = {
    // TEMP ids for missing EmployeeID before rules (A2_hr_etl.py:80-86)
    val wAll = Window.orderBy(monotonically_increasing_id())
    // cached: the DQ-log branch and the staging branch both read __n, and
    // monotonically_increasing_id is only stable within one evaluation —
    // re-evaluating per branch could log a TEMP id that differs from the
    // staged one. The cache pins a single assignment (seed files are small).
    val withId = raw.withColumn("__n", row_number().over(wAll)).cache()
    val ref = col("EmployeeID")
    val idFixed = withId.withColumn("EmployeeID",
      when(ref.isNull || trim(ref) === "", concat(lit("TEMP_"), col("__n")))
        .otherwise(trim(ref)))
    val tempLog = withId.filter(ref.isNull || trim(ref) === "").select(
      DqLog.entry(ctx, "staging_employee", "EmployeeID",
        concat(lit("TEMP_"), col("__n")), ref, "missing_employee_id"): _*)

    val salary = Cleaning.coerceDecimal(col("Salary"))
    val rules = Seq(
      Rule("Gender",
        // explicit isNull: for null input the isin-negation is NULL (not
        // true), which would silently skip the DQ log while the fix still
        // rewrites the value
        col("Gender").isNull ||
          !upper(trim(col("Gender"))).isin("M", "MALE", "F", "FEMALE"),
        Cleaning.genderNormalize(col("Gender")), "unknown_gender"),
      Rule("DateOfJoining",
        Cleaning.dateSafe(col("DateOfJoining"), None).isNull,
        Cleaning.dateSafe(col("DateOfJoining"), None), "invalid_date"),
      Rule("Salary",
        salary.isNull || salary < 0,
        abs(salary), "invalid_or_negative_salary"),
      Rule("ManagerID",
        col("ManagerID").isNull || upper(trim(col("ManagerID"))).isin("", "NAN", "NULL"),
        Cleaning.nullNormalize(Cleaning.stripFloatSuffix(trim(col("ManagerID"))), "UNKNOWN"),
        "missing_manager"),
      Rule("Name",
        col("Name").isNull || trim(col("Name")) === "",
        when(col("Name").isNull || trim(col("Name")) === "",
          concat(lit("EMP_"), col("EmployeeID"))).otherwise(trim(col("Name"))),
        "missing_name"),
      Rule("Department",
        col("Department").isNull || upper(trim(col("Department"))).isin("", "NAN", "NULL"),
        Cleaning.nullNormalize(upper(trim(col("Department"))), "UNASSIGNED_DEPT"),
        "missing_department"),
      Rule("Status",
        col("Status").isNull ||
          !upper(trim(col("Status"))).isin("ACTIVE", "RESIGNED"),
        Cleaning.statusNormalize(col("Status")), "unknown_status"))
    val (cleaned, ruleLog) =
      DqEngine.clean(idFixed.drop("__n"), "staging_employee", col("EmployeeID"), rules, ctx)

    val typed = cleaned.select(
      col("EmployeeID").as("employee_id"),
      col("Name").as("name"),
      col("Department").as("department"),
      col("Gender").as("gender"),
      col("DateOfJoining").cast(DateType).as("date_of_joining"),
      col("ManagerID").as("manager_id"),
      col("Salary").cast(dec12_2).as("salary"),
      col("Status").as("status"))
    val (staged, dupLog) = DqEngine.dedupWithLog(
      typed, "staging_employee", col("employee_id"), col("employee_id"), ctx)

    val dq = tempLog.unionByName(ruleLog).unionByName(dupLog)
    finish(ctx, "staging_employee", staged, dq)
  }

  // -------------------------------------------------------------- Finance
  /** ET_combined.py:165-279 + B2_finance_etl.py (the deduping standalone
    * variant — ET_combined.py:232's no-op dedup is a documented reference
    * bug, SURVEY §7). Negative amounts are KEPT and flagged is_refund. */
  def finance(spark: SparkSession, rawPath: String, ctx: JobContext): EtlResult = {
    val raw = rawCsv(spark, rawPath)
    val amount = Cleaning.coerceDecimal(col("ExpenseAmount"))
    // silent typo remap (B2_finance_etl.py:18 — fix without DQ log)
    val typoFixed = raw.withColumn("ExpenseType",
      when(initcap(trim(col("ExpenseType"))) === "Travell", "Travel")
        .otherwise(initcap(trim(col("ExpenseType")))))
    val rules = Seq(
      Rule("ExpenseType",
        col("ExpenseType").isNull || trim(col("ExpenseType")) === "",
        Cleaning.nullNormalize(col("ExpenseType"), "Unknown"), "missing_expense_type"),
      Rule("ExpenseAmount",
        amount.isNull,
        coalesce(amount, lit(0).cast(dec12_2)), "invalid_amount"),
      Rule("ExpenseDate",
        Cleaning.dateSafe(col("ExpenseDate"), None).isNull,
        Cleaning.dateSafe(col("ExpenseDate"), None), "invalid_date"),
      Rule("ApprovedBy",
        col("ApprovedBy").isNull || upper(trim(col("ApprovedBy"))).isin("", "NAN", "NULL"),
        Cleaning.nullNormalize(Cleaning.stripFloatSuffix(trim(col("ApprovedBy"))), "UNKNOWN"),
        "missing_approver"))
    val (cleaned, ruleLog) =
      DqEngine.clean(typoFixed, "staging_finance", col("EmployeeID"), rules, ctx)

    val typed = cleaned.select(
      col("EmployeeID").as("employee_id"),
      col("ExpenseType").as("expense_type"),
      col("ExpenseAmount").cast(dec12_2).as("expense_amount"),
      col("ExpenseDate").cast(DateType).as("expense_date"),
      col("ApprovedBy").as("approved_by"))
      .withColumn("is_refund", col("expense_amount") < 0)
    val (staged, dupLog) = DqEngine.dedupWithLog(
      typed, "staging_finance", col("employee_id"), col("employee_id"), ctx)

    finish(ctx, "staging_finance", staged, ruleLog.unionByName(dupLog))
  }

  // ----------------------------------------------------------- Operations
  /** ET_combined.py:282-428. Missing downtime is group-mean imputed over
    * (department, process, location) — the J9 window+coalesce formulation
    * (C2_ops_etl.py:61-85; dbt stg_ops_downtime.sql:27-47): one shuffle on
    * the group key instead of an aggregate+join-back. Date fallback is
    * 1957-01-01 (the Ops-specific semantics; HR/Finance fall back to null).
    */
  def ops(spark: SparkSession, rawPath: String, ctx: JobContext): EtlResult = {
    val raw = rawCsv(spark, rawPath)
    val rules = Seq(
      Rule("Department",
        col("Department").isNull || upper(trim(col("Department"))).isin("", "NAN", "NULL"),
        Cleaning.nullNormalize(upper(trim(col("Department"))), "UNASSIGNED_DEPT"),
        "missing_department"),
      Rule("ProcessName",
        col("ProcessName").isNull || upper(trim(col("ProcessName"))).isin("", "NAN", "NULL"),
        Cleaning.nullNormalize(upper(trim(col("ProcessName"))), "UNKNOWN_PROCESS"),
        "missing_process"),
      Rule("Location",
        col("Location").isNull || upper(trim(col("Location"))).isin("", "NAN", "NULL"),
        Cleaning.nullNormalize(upper(trim(col("Location"))), "UNKNOWN_LOCATION"),
        "missing_location"),
      Rule("ProcessDate",
        Cleaning.dateSafe(col("ProcessDate"), None).isNull,
        Cleaning.dateSafe(col("ProcessDate"), Some("1957-01-01")), "invalid_date"))
    val (cleaned, ruleLog) =
      DqEngine.clean(raw, "staging_operations", col("Department"), rules, ctx)

    val hours = Cleaning.coerceDecimal(col("DowntimeHours"), 10, 2)
    val grp = Window.partitionBy(col("Department"), col("ProcessName"), col("Location"))
    val groupMean = round(avg(hours).over(grp), 2)
    val imputeLog = cleaned.filter(hours.isNull).select(
      DqLog.entry(ctx, "staging_operations", "DowntimeHours",
        col("Department"), col("DowntimeHours"), "imputed_downtime"): _*)
    val imputed = cleaned.withColumn("DowntimeHours",
      coalesce(hours, groupMean.cast(DecimalType(10, 2)), lit(0).cast(DecimalType(10, 2))))

    val staged = imputed.select(
      col("Department").as("department_name"),
      col("ProcessName").as("process_name"),
      col("Location").as("location_name"),
      col("DowntimeHours").as("downtime_hours"),
      col("ProcessDate").cast(DateType).as("process_date"))
    finish(ctx, "staging_operations", staged, ruleLog.unionByName(imputeLog))
  }

  private def finish(ctx: JobContext, table: String,
                     staged: DataFrame, dq: DataFrame): EtlResult = {
    // cache before the audit counts: staging and log are each consumed
    // again by the caller's writes (runAll) — without this the raw CSV is
    // re-read and every rule re-evaluated 4×. Lives for the job; Spark
    // evicts LRU if memory is needed.
    val stagedC = staged.cache()
    val dqC = dq.cache()
    val processed = stagedC.count()
    val failed = dqC.count()
    EtlResult(stagedC, dqC,
      AuditEntry.of(ctx, table, "extract_transform", processed, failed,
        s"$table cleaned: $processed rows staged, $failed DQ issues"))
  }

  // ----------------------------------------------------------- orchestrator
  /** ET_combined.py:435-439: one job id, three pipelines, staging replaced,
    * logs appended. `warehouseDir` layout: stg/<table>, logs/{dq,audit}. */
  def runAll(spark: SparkSession, rawDir: String, warehouseDir: String,
             ctx: JobContext = JobContext.fresh()): Seq[EtlResult] = {
    val runs = Seq(
      "staging_employee" -> hr(spark, s"$rawDir/HR_Dataset_Dirty.csv", ctx),
      "staging_finance" -> finance(spark, s"$rawDir/Finance_Dataset_Dirty.csv", ctx),
      "staging_operations" -> ops(spark, s"$rawDir/Operations_Dataset_Dirty.csv", ctx))
    runs.foreach { case (table, r) =>
      Sinks.overwriteSwap(r.staging, s"$warehouseDir/stg/$table")
      Sinks.appendParquet(r.dqLog, s"$warehouseDir/logs/data_quality_log")
      Sinks.appendParquet(
        AuditEntry.toDf(spark, ctx, Seq(r.audit)), s"$warehouseDir/logs/audit_log")
    }
    runs.map(_._2)
  }
}
