package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DistributedRank, DistributedRankRewrite, DistributedWindowExec, WindowVarianceDecompose}

/** The stddev/variance window decomposition end to end: decomposed output
  * matches the built-in Welford plan (null pattern exactly, values to fp
  * tolerance) across frame families and both divide-by-zero modes, the
  * kill switch restores the native plan, decimal inputs route through
  * DistributedWindowExec under the marker with NO WindowExec left, and
  * the decimal path is bit-identical to the exact moments formula. */
class WindowVarianceDecomposeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = graft.core.Sessions.local(4, "graft-wvd-test")
    DistributedRank.install(s)
    s
  }

  private val M = DistributedRankRewrite.NameMarker

  /** groups of uneven size, doubles with a planted null run and one
    * all-null group (n = 0 frames), plus a decimal mirror column */
  private def fixture(n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      $"id",
      ($"id" % 7).as("g"),
      when($"id" % 11 === 0 || $"id" % 7 === 5, lit(null))
        .otherwise((hash(concat(lit("v"), $"id")) % 10000).cast("double")
          / 100.0).as("x"))
      .withColumn("xd", $"x".cast("decimal(12,2)"))
  }

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set(WindowVarianceDecompose.Flag, on.toString)
    try body finally spark.conf.set(WindowVarianceDecompose.Flag, "true")
  }

  private def volCols(df: DataFrame, c: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    df.select(col("id"), col("g"),
      stddev_samp(col(c)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("ss_run"),
      stddev_pop(col(c)).over(w.rowsBetween(-3, 0)).as("sp_roll"),
      var_samp(col(c)).over(w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)).as("vs_grp"),
      var_pop(col(c)).over(
        w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
        .as("vp_range"))
  }

  /** exact null-pattern + tolerance value compare, keyed by (g, id) */
  private def assertClose(a: Seq[Row], b: Seq[Row], tol: Double): Unit = {
    assert(a.size == b.size)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getLong(0) == rb.getLong(0) && ra.getLong(1) == rb.getLong(1))
      (2 until ra.size).foreach { i =>
        val (na, nb) = (ra.isNullAt(i), rb.isNullAt(i))
        assert(na == nb, s"null pattern differs at col $i row ${ra.getLong(0)}")
        if (!na) {
          val (va, vb) = (ra.getDouble(i), rb.getDouble(i))
          assert(va.isNaN == vb.isNaN,
            s"NaN pattern differs at col $i row ${ra.getLong(0)}")
          if (!va.isNaN)
            assert(math.abs(va - vb) <= tol * math.max(1.0, math.abs(vb)),
              s"col $i row ${ra.getLong(0)}: $va vs $vb")
        }
      }
    }
  }

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.orderBy(col("g"), col("id")).collect().toSeq

  test("decomposed output matches the native Welford plan: all four " +
       "functions over running/rolling/whole-group/RANGE frames, nulls " +
       "and n=0/n=1 edges included") {
    val df = fixture(2000)
    val native = withRule(false)(sortedRows(volCols(df, "x")))
    val decomposed = withRule(true)(sortedRows(volCols(df, "x")))
    assertClose(decomposed, native, 1e-9)
  }

  test("legacy statisticalAggregate mode: NaN at n=1 replicated") {
    val df = fixture(400)
    spark.conf.set("spark.sql.legacy.statisticalAggregate", "true")
    try {
      val native = withRule(false)(sortedRows(volCols(df, "x")))
      val decomposed = withRule(true)(sortedRows(volCols(df, "x")))
      // the fixture's id%7==5 group is all-null → n=0 frames; the first
      // non-null row of each other group is an n=1 running frame → the
      // legacy contract must surface NaN there, not NULL
      assert(native.exists(r => !r.isNullAt(2) && r.getDouble(2).isNaN))
      assertClose(decomposed, native, 1e-9)
    } finally
      spark.conf.set("spark.sql.legacy.statisticalAggregate", "false")
  }

  test("kill switch: rule off keeps the native central-moment window") {
    val df = fixture(100)
    val off = withRule(false) {
      volCols(df, "x").queryExecution.optimizedPlan.toString
    }
    val on = withRule(true) {
      volCols(df, "x").queryExecution.optimizedPlan.toString
    }
    assert(off.contains("stddev_samp") && !off.contains("__wvd_"))
    assert(on.contains("__wvd_") && !on.contains("stddev_samp("))
  }

  test("decimal input under the marker: routes DistributedWindowExec, " +
       "no WindowExec, and equals the native plan") {
    val df = fixture(3000)
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    def q(c: String): DataFrame = df
      .withColumn(s"${M}_ss", stddev_samp(col(c)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn(s"${M}_vp", var_pop(col(c)).over(w.rowsBetween(-3, 0)))
      .select(col("id"), col("g"), col(s"${M}_ss").as("ss"),
        col(s"${M}_vp").as("vp"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q("xd").queryExecution.executedPlan
      assert(plan.exists(_.isInstanceOf[DistributedWindowExec]),
        s"expected DistributedWindowExec in:\n$plan")
      assert(!plan.exists(_.isInstanceOf[WindowExec]),
        s"unexpected WindowExec in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val dist = sortedRows(q("xd"))
    val native = withRule(false)(sortedRows(q("xd")))
    assertClose(dist, native, 1e-9)
  }

  /** y correlates with x plus noise; its OWN null pattern differs from
    * x's, so pair-masking (a row counts only when BOTH are non-null) is
    * exercised — the built-in's covariance update guard. */
  private def fixture2(n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    fixture(n).withColumn("y",
      when($"id" % 13 === 0, lit(null))
        .otherwise($"x" * 0.5
          + (hash(concat(lit("w"), $"id")) % 1000).cast("double") / 100.0))
  }

  private def corrCols(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    df.select(col("id"), col("g"),
      corr(col("x"), col("y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("corr_run"),
      covar_samp(col("x"), col("y")).over(w.rowsBetween(-5, 0))
        .as("cs_roll"),
      covar_pop(col("x"), col("y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .as("cp_grp"))
  }

  test("two-input family (corr/covar_samp/covar_pop) matches the native " +
       "plan across frames, pair-null masking and n=0/n=1 edges included") {
    val df = fixture2(2000)
    val native = withRule(false)(sortedRows(corrCols(df)))
    val decomposed = withRule(true)(sortedRows(corrCols(df)))
    assertClose(decomposed, native, 1e-9)
  }

  test("two-input family under the marker routes DistributedWindowExec") {
    val df = fixture2(1000)
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q = fixture2(1000)
      .withColumn(s"${M}_cr",
        corr(col("xd").cast("double"), col("y")).over(w))
      .select(col("id"), col("g"), col(s"${M}_cr").as("cr"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = q.queryExecution.executedPlan
      assert(plan.exists(_.isInstanceOf[DistributedWindowExec]),
        s"expected DistributedWindowExec in:\n$plan")
      assert(!plan.exists(_.isInstanceOf[WindowExec]),
        s"unexpected WindowExec in:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val dist = sortedRows(q)
    val native = withRule(false)(sortedRows(q))
    assertClose(dist, native, 1e-9)
  }

  test("decimal path is bit-identical to the exact moments formula") {
    val df = fixture(1500)
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaRule = sortedRows(df.select(col("id"), col("g"),
      stddev_samp(col("xd")).over(w).as("ss")))
    val manual = sortedRows(df
      .select(col("id"), col("g"),
        sum(col("xd")).over(w).as("sx"),
        sum(col("xd") * col("xd")).over(w).as("sxx"),
        count(col("xd")).over(w).as("n"))
      .select(col("id"), col("g"),
        when(col("n") === 0, lit(null).cast("double"))
          .when(col("n") === 1, lit(null).cast("double"))
          .otherwise(sqrt(greatest(lit(0d),
            col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")
                / col("n").cast("double"))
            / (col("n").cast("double") - 1d))).as("ss")))
    viaRule.zip(manual).foreach { case (a, b) =>
      assert(a.isNullAt(2) == b.isNullAt(2))
      if (!a.isNullAt(2))
        assert(java.lang.Double.doubleToLongBits(a.getDouble(2)) ==
               java.lang.Double.doubleToLongBits(b.getDouble(2)),
          s"row ${a.getLong(0)}: ${a.getDouble(2)} vs ${b.getDouble(2)}")
    }
  }
}
