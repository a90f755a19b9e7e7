package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kpi.Kpi

/** All 8 KPI views build, register, and answer through spark.sql (the S7
  * view-sink surface); exact values for 4 of them are the DuckDB oracle's
  * job (q_kpi_* entries). */
class KpiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-kpi-test")
  val sfDir = "/root/testdata/sf0.001"

  test("all 8 KPI views register and are queryable via spark.sql") {
    val names = Kpi.registerAll(spark, sfDir)
    assert(names.length == 8)
    names.foreach { v =>
      assert(spark.sql(s"SELECT * FROM $v").count() > 0, s"$v is empty")
    }
  }

  test("access policy: roles see their views, fail closed otherwise") {
    import graft.kpi.AccessPolicy
    Kpi.registerAll(spark, sfDir)
    assert(AccessPolicy.resolve(spark, "hr_analyst",
      "vw_kpi_monthly_headcount").count() > 0)
    intercept[SecurityException] {
      AccessPolicy.resolve(spark, "hr_analyst", "vw_kpi_downtime_by_dept")
    }
    intercept[IllegalArgumentException] {
      AccessPolicy.resolve(spark, "intern", "vw_kpi_monthly_headcount")
    }
    // admin sees everything that is registered
    assert(AccessPolicy.roleViews("admin") ==
      AccessPolicy.roleViews.values.flatten.toSet)
  }

  test("role sessions ENFORCE grants: ungranted views do not resolve at all") {
    import graft.kpi.AccessPolicy
    val hr = AccessPolicy.sessionFor(spark, "hr_analyst", sfDir)
    // granted: resolves and answers
    assert(hr.table("vw_kpi_monthly_headcount").count() > 0)
    // ungranted: the view NAME does not exist in this session's catalog —
    // the same failure a revoked Postgres grant produces, unbypassable
    // because there is no wrapper to go around
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      hr.table("vw_kpi_downtime_by_dept").count()
    }
    assert(e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
    // admin session resolves every view
    val admin = AccessPolicy.sessionFor(spark, "admin", sfDir)
    AccessPolicy.roleViews("admin").foreach(v =>
      assert(admin.table(v).count() > 0, s"admin missing $v"))
    // unknown roles fail closed before any session is built
    intercept[IllegalArgumentException] {
      AccessPolicy.sessionFor(spark, "intern", sfDir)
    }
    // isolation is one-way: building a role session must not leak its
    // views into the parent — use a FRESH parent (the shared `spark`
    // already has registerAll's views), grant from it, and confirm the
    // parent still resolves nothing
    val freshBase = spark.newSession()
    val ops = AccessPolicy.sessionFor(freshBase, "ops_analyst", sfDir)
    assert(ops.table("vw_kpi_downtime_by_process").count() > 0)
    intercept[org.apache.spark.sql.AnalysisException] {
      freshBase.table("vw_kpi_downtime_by_process").count()
    }
  }

  test("net never exceeds gross") {
    val bad = Kpi.netVsGrossByType(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("net_amount") >
        org.apache.spark.sql.functions.col("gross_amount"))
    assert(bad.count() == 0)
  }

  test("dim_time covers the orders date range with correct weekend flags") {
    import org.apache.spark.sql.functions._
    val dt = Kpi.dimTime(spark).cache()
    assert(dt.count() == 2557) // 1995-01-01..2001-12-31
    val jan1_1995 = dt.filter(col("full_date") === lit("1995-01-01").cast("date")).head()
    assert(jan1_1995.getAs[Boolean]("is_weekend")) // a Sunday
    assert(jan1_1995.getAs[Int]("time_id") == 1)
  }
}
