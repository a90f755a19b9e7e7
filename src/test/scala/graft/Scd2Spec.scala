package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Scd2

/** Unit + invariant tests for the SCD2 batch merge (TL_combine.sql:22-62
  * semantics; SURVEY §5.4 property list). */
class Scd2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-scd2-test")
  import spark.implicits._

  private val d0 = Date.valueOf("2020-01-01")
  private val d1 = Date.valueOf("2024-01-01")
  private val attrs = Seq("name", "dept")

  private def snap(rows: (String, String, String)*) =
    rows.toSeq.toDF("emp_id", "name", "dept")

  test("changed row expires old version and inserts new") {
    val cur = Scd2.initial(snap(("e1", "Ann", "IT"), ("e2", "Bob", "HR")),
      "emp_id", attrs, d0)
    val merged = Scd2.merge(cur,
      snap(("e1", "Ann", "LEGAL"), ("e2", "Bob", "HR")), "emp_id", attrs, d1)
      .cache()
    val e1 = merged.filter($"emp_id" === "e1").orderBy($"valid_from").collect()
    assert(e1.length == 2)
    assert(e1(0).getAs[Date]("valid_to") == d1 && !e1(0).getAs[Boolean]("is_current"))
    assert(e1(1).getAs[String]("dept") == "LEGAL" &&
      e1(1).getAs[Boolean]("is_current") && e1(1).getAs[Date]("valid_from") == d1)
    // unchanged e2 passes through untouched
    val e2 = merged.filter($"emp_id" === "e2").collect()
    assert(e2.length == 1 && e2(0).getAs[Boolean]("is_current"))
  }

  test("new key inserts fresh current row; missing key stays current") {
    val cur = Scd2.initial(snap(("e1", "Ann", "IT")), "emp_id", attrs, d0)
    val merged = Scd2.merge(cur, snap(("e3", "Cyn", "OPS")), "emp_id", attrs, d1)
    assert(merged.filter($"emp_id" === "e3" && $"is_current").count() == 1)
    // e1 absent from batch: no hard delete (TL_combine semantics)
    assert(merged.filter($"emp_id" === "e1" && $"is_current").count() == 1)
  }

  test("invariants: ≤1 current row per key; rerun without changes is a no-op") {
    val cur = Scd2.initial(snap(("e1", "Ann", "IT"), ("e2", "Bob", "HR")),
      "emp_id", attrs, d0)
    val once = Scd2.merge(cur,
      snap(("e1", "Ann", "LEGAL"), ("e2", "Bob", "HR")), "emp_id", attrs, d1)
    val twice = Scd2.merge(once,
      snap(("e1", "Ann", "LEGAL"), ("e2", "Bob", "HR")), "emp_id", attrs, d1)
    val perKey = twice.filter($"is_current")
      .groupBy($"emp_id").count().filter($"count" > 1)
    assert(perKey.count() == 0)
    assert(twice.count() == once.count()) // idempotent under no changes
  }

  test("invalidateMissing expires absent keys at asOf; rerun idempotent") {
    val cur = Scd2.initial(snap(("e1", "Ann", "IT"), ("e2", "Bob", "HR")),
      "emp_id", attrs, d0)
    val batch = snap(("e2", "Bob", "HR")) // e1 hard-deleted upstream
    val once = Scd2.merge(cur, batch, "emp_id", attrs, d1,
      invalidateMissing = true).cache()
    val e1 = once.filter($"emp_id" === "e1").collect()
    assert(e1.length == 1)
    assert(!e1(0).getAs[Boolean]("is_current") &&
      e1(0).getAs[Date]("valid_to") == d1)
    // e2 untouched and still current
    assert(once.filter($"emp_id" === "e2" && $"is_current").count() == 1)
    // rerun with the same batch: e1 already non-current, nothing changes
    val twice = Scd2.merge(once, batch, "emp_id", attrs, d1,
      invalidateMissing = true)
    assert(twice.count() == once.count())
    assert(twice.filter($"is_current").count() == once.filter($"is_current").count())
    // default merge (no flag) still keeps missing keys current
    val soft = Scd2.merge(cur, batch, "emp_id", attrs, d1)
    assert(soft.filter($"emp_id" === "e1" && $"is_current").count() == 1)
  }

  test("null attribute is hashed null-safely (no collision with empty)") {
    val withNull = Seq(("e1", null.asInstanceOf[String], "IT"))
      .toDF("emp_id", "name", "dept")
    val cur = Scd2.initial(withNull, "emp_id", attrs, d0)
    // null -> "" coalesce means (null, IT) and ("", IT) hash the same by
    // design (dbt generate_surrogate_key); a real change must still trigger
    val merged = Scd2.merge(cur,
      Seq(("e1", "Ann", "IT")).toDF("emp_id", "name", "dept"),
      "emp_id", attrs, d1)
    assert(merged.filter($"emp_id" === "e1").count() == 2)
  }
}
