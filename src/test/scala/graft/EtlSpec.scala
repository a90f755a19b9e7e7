package graft

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Etl, JobContext}
import graft.io.Sinks
import graft.warehouse.{Dims, Facts, Scd2}

/** Golden tests for the ETL pipelines on the reference's dirty fixtures
  * (FIXTURES.md §1-3; seeds at /root/reference/05_dbt_implementation/
  * dbt_warehouse_project/seeds/raw/ — read-only inputs, never modified).
  * Asserts the exact dirty-value repairs the reference performs. */
class EtlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-etl-test")
  val seeds = "/root/reference/05_dbt_implementation/dbt_warehouse_project/seeds/raw"
  val ctx: JobContext = JobContext("test-job", Date.valueOf("2024-01-01"))

  lazy val hr = Etl.hr(spark, s"$seeds/HR_Dataset_Dirty.csv", ctx)
  lazy val fin = Etl.finance(spark, s"$seeds/Finance_Dataset_Dirty.csv", ctx)
  lazy val ops = Etl.ops(spark, s"$seeds/Operations_Dataset_Dirty.csv", ctx)

  test("HR: duplicate employee 1001 dropped and logged") {
    val staged = hr.staging.cache()
    assert(staged.filter(col("employee_id") === "1001").count() == 1)
    assert(staged.count() == 20) // 21 raw rows, 1 duplicate dropped
    val dup = hr.dqLog.filter(col("issue") === "duplicate_row")
    assert(dup.count() == 1)
    assert(dup.head().getAs[String]("row_reference") == "1001")
  }

  test("HR: dd-MM-yyyy date 15-01-2018 parsed, logged as invalid format") {
    val row = hr.staging.filter(col("employee_id") === "1005").head()
    assert(row.getAs[Date]("date_of_joining") == Date.valueOf("2018-01-15"))
  }

  test("HR: negative salary -10000 becomes 10000 and is logged") {
    val row = hr.staging.filter(col("employee_id") === "1004").head()
    assert(row.getAs[java.math.BigDecimal]("salary").doubleValue() == 10000.0)
    val logged = hr.dqLog.filter(
      col("issue") === "invalid_or_negative_salary" &&
        col("row_reference") === "1004")
    assert(logged.count() == 1)
    assert(logged.head().getAs[String]("original_value") == "-10000")
  }

  test("HR: blank department defaulted to UNASSIGNED_DEPT; 'It' uppercased") {
    val s = hr.staging.cache()
    assert(s.filter(col("employee_id") === "1003").head()
      .getAs[String]("department") == "UNASSIGNED_DEPT")
    assert(s.filter(col("employee_id") === "1002").head()
      .getAs[String]("department") == "IT")
  }

  test("HR: audit entry counts staged rows and DQ issues") {
    assert(hr.audit.rowsProcessed == 20)
    assert(hr.audit.rowsFailed == hr.dqLog.count())
    assert(hr.audit.status == "partial")
  }

  test("Finance: Travell typo corrected to Travel") {
    val s = fin.staging.cache()
    assert(s.filter(col("expense_type") === "Travell").count() == 0)
    assert(s.filter(col("expense_type") === "Travel").count() > 0)
  }

  test("Finance: refund -50.75 kept, flagged is_refund") {
    val r = fin.staging
      .filter(col("employee_id") === "1016" && col("expense_amount") < 0).head()
    assert(r.getAs[java.math.BigDecimal]("expense_amount").doubleValue() == -50.75)
    assert(r.getAs[Boolean]("is_refund"))
  }

  test("Finance: blank ApprovedBy becomes UNKNOWN and is logged") {
    assert(fin.staging.filter(col("approved_by") === "UNKNOWN").count() > 0)
    assert(fin.dqLog.filter(col("issue") === "missing_approver").count() > 0)
  }

  test("Ops: missing downtime group-mean imputed (never null), logged") {
    val s = ops.staging.cache()
    assert(s.filter(col("downtime_hours").isNull).count() == 0)
    assert(ops.dqLog.filter(col("issue") === "imputed_downtime").count() > 0)
  }

  test("Ops: missing date falls back to 1957-01-01; typo location kept") {
    val s = ops.staging.cache()
    assert(s.filter(col("process_date") === lit("1957-01-01").cast("date")).count() > 0)
    // 'Remot Site A' is NOT corrected by the reference — stays distinct
    assert(s.filter(col("location_name") === "REMOT SITE A").count() > 0)
  }

  test("FK-miss: finance employee 9999 not in HR dim is logged, not loaded") {
    val dimEmp = Scd2.initial(
      hr.staging.select(col("employee_id"), col("name"), col("department")),
      "employee_id", Seq("name", "department"), ctx.asOf)
    val (fact, misses) = Facts.loadWithFkCheck(
      fin.staging, dimEmp.filter(col("is_current")),
      "employee_id", "employee_id", "row_hash", "fact_expenses", ctx)
    assert(misses.filter(col("row_reference") === "9999").count() > 0)
    assert(fact.filter(col("employee_id") === "9999").count() == 0)
    assert(fact.count() + misses.count() == fin.staging.count())
  }

  test("HR: missing EmployeeID falls back to TEMP_{n} and is logged (W2)") {
    // fixture CSVs have no missing ids, so manufacture one (A2_hr_etl.py:80-86)
    val dir = Files.createTempDirectory("graft-hr-dirty")
    val csv = dir.resolve("hr.csv")
    Files.writeString(csv,
      """EmployeeID,Name,Department,Gender,DateOfJoining,ManagerID,Salary,Status
        |2001,Employee X,IT,M,2020-01-01,,50000,Active
        |,Employee Y,HR,F,2020-02-02,2001,60000,Active
        |""".stripMargin)
    val r = Etl.hr(spark, csv.toString, ctx)
    val temp = r.staging.filter(col("employee_id").startsWith("TEMP_"))
    assert(temp.count() == 1)
    assert(temp.head().getAs[String]("name") == "Employee Y")
    assert(r.dqLog.filter(col("issue") === "missing_employee_id").count() == 1)
  }

  test("runAll writes staging + appends logs via the sinks") {
    val dir = Files.createTempDirectory("graft-wh").toString
    Etl.runAll(spark, seeds, dir, ctx)
    assert(Sinks.readParquet(spark, s"$dir/stg/staging_employee").count() == 20)
    val audit1 = Sinks.readParquet(spark, s"$dir/logs/audit_log").count()
    assert(audit1 == 3)
    // second run: staging replaced (same count), logs appended (doubled)
    Etl.runAll(spark, seeds, dir, ctx)
    assert(Sinks.readParquet(spark, s"$dir/stg/staging_employee").count() == 20)
    assert(Sinks.readParquet(spark, s"$dir/logs/audit_log").count() == audit1 * 2)
  }

  test("overwriteSwap can rewrite a table that is being read (SCD2 case)") {
    val dir = Files.createTempDirectory("graft-swap").toString + "/dim"
    val df1 = spark.range(10).toDF("id")
    Sinks.overwriteSwap(df1, dir)
    val readBack = Sinks.readParquet(spark, dir).withColumn("id", col("id") + 100)
    Sinks.overwriteSwap(readBack, dir) // new state reads the old table
    val vals = Sinks.readParquet(spark, dir).collect().map(_.getLong(0)).sorted
    assert(vals.head == 100 && vals.length == 10)
  }

  test("dim upsert appends only new names with continuing ids") {
    val d0 = Dims.buildNameDim(
      ops.staging.select(col("department_name")), "department_name", "department_id")
    val withNew = Dims.upsertNameDim(d0,
      hr.staging.select(col("department").as("department_name")),
      "department_name", "department_id")
    assert(withNew.count() >= d0.count())
    // ids unique and dense from 1
    val ids = withNew.select("department_id").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (1 to ids.length))
  }
}
