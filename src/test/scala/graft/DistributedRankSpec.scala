package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DistributedRank, DistributedWindowExec, GlobalRankExec, RankOverflow}

/** The distributed-rank extension end to end: flag-on output equals the
  * naive window bit-for-bit, the physical plan swaps WindowExec for
  * GlobalRankExec / DistributedWindowExec fed by a RANGE exchange, scope
  * guards leave unsupported windows alone, and the rewrite survives
  * shuffle-width perturbation. The r9 cases cover the generalized
  * shapes: grouped row_number, ROWS and RANGE running sums (incl. NULL
  * prefixes and order-peer ties), mixed functions on one window node,
  * the tightened name-marker, and the 2³¹ rank ceiling contract. */
class DistributedRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = graft.core.Sessions.local(4, "graft-distrank-test")
    DistributedRank.install(s)
    s
  }

  private def fixture(n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      $"id",
      (abs(hash(concat(lit("v"), $"id"))) % 97).cast("long").as("v"))
  }

  private def naiveRank(df: DataFrame): DataFrame =
    df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))))

  private def withFlag[T](on: Boolean)(body: => T): T = {
    spark.conf.set(DistributedRank.Flag, on.toString)
    try body finally spark.conf.set(DistributedRank.Flag, "false")
  }

  test("flag-on output equals the naive single-partition window") {
    val df = fixture(5000)
    val off = naiveRank(df).collect().map(_.toString).sorted.toSeq
    val on = withFlag(true) {
      val d = naiveRank(df)
      d.queryExecution.optimizedPlan // freeze the rewrite under the flag
      d.collect().map(_.toString).sorted.toSeq
    }
    assert(on == off)
  }

  test("physical plan: GlobalRankExec over a range exchange, no WindowExec") {
    val plan = withFlag(true) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try naiveRank(fixture(5000)).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    assert(plan.collect { case g: GlobalRankExec => g }.nonEmpty,
      s"expected GlobalRankExec:\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"WindowExec must be gone:\n$plan")
    assert(plan.toString.contains("rangepartitioning"),
      s"expected a range exchange feeding the rank:\n$plan")
  }

  test("rank is a 1..n permutation and work is spread over >1 partition") {
    val got = withFlag(true) {
      val d = naiveRank(fixture(5000))
      d.queryExecution.optimizedPlan
      d.select("rn").collect().map(_.getInt(0)).sorted
    }
    assert(got.toSeq == (1 to 5000))
  }

  test("scope guard: unsupported functions and mixed nodes untouched") {
    withFlag(true) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val rankDf = fixture(200).withColumn("rk",
          org.apache.spark.sql.functions.rank()
            .over(Window.orderBy(col("v"), col("id"))))
        assert(rankDf.queryExecution.executedPlan
          .collect { case w: WindowExec => w }.nonEmpty,
          "rank() (not row_number) must stay a WindowExec")
        // one unsupported neighbor keeps the WHOLE node on WindowExec
        // (the forall guard): row_number and rank share (partition,
        // order), so they land on one Window node
        val w = Window.orderBy(col("v"), col("id"))
        val mixed = fixture(200)
          .withColumn("rn", row_number().over(w))
          .withColumn("rk", org.apache.spark.sql.functions.rank().over(w))
        val mixedPlan = mixed.queryExecution.executedPlan
        assert(mixedPlan.collect { case w: WindowExec => w }.nonEmpty,
          s"mixed supported+unsupported node must stay a WindowExec:\n$mixedPlan")
        assert(mixedPlan.collect { case d: DistributedWindowExec => d }.isEmpty
          && mixedPlan.collect { case g: GlobalRankExec => g }.isEmpty,
          s"mixed node must not partially rewrite:\n$mixedPlan")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("tightened marker: a user column named __dist_rankings does NOT trigger") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = fixture(200).withColumn("__dist_rankings",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      val plan = d.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.nonEmpty &&
        plan.collect { case g: GlobalRankExec => g }.isEmpty,
        s"prefix-similar name must not swap physical execution:\n$plan")
      val exact = fixture(200).withColumn("__dist_rank_x",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      assert(exact.queryExecution.executedPlan
        .collect { case g: GlobalRankExec => g }.nonEmpty,
        "reserved __dist_rank_<suffix> form must still trigger")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  // ---------------------------------------------------------------- r9:
  // the generalized shapes, each compared flag-on vs flag-off (the
  // built-in WindowExec is the in-test oracle; the registry twins
  // q_fact_*_dist gate the same shapes against DuckDB)

  /** Fixture with NULLs in the value column (id % 7) and heavy ties
    * (v % 13) so RANGE peers and null-prefix sums are really exercised. */
  private def nullTieFixture(n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).select(
      $"id",
      when($"id" % 7 === 0, lit(null))
        .otherwise(abs(hash(concat(lit("g"), $"id"))) % 13)
        .cast("long").as("v"),
      (abs(hash(concat(lit("f"), $"id"))) % 3).cast("long").as("flag"))
  }

  private def onVsOff(build: DataFrame => DataFrame, n: Int = 4000,
                      expectExec: Boolean = true): Unit = {
    val df = nullTieFixture(n)
    val off = build(df).collect().map(_.toString).sorted.toSeq
    val on = withFlag(true) {
      val d = build(df)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = d.queryExecution.executedPlan
        if (expectExec) {
          assert(plan.collect { case e: DistributedWindowExec => e }.nonEmpty,
            s"expected DistributedWindowExec:\n$plan")
          assert(plan.collect { case w: WindowExec => w }.isEmpty,
            s"WindowExec must be gone:\n$plan")
        }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      d.collect().map(_.toString).sorted.toSeq
    }
    assert(on == off, "flag-on result must equal the WindowExec result")
  }

  test("grouped row_number equals WindowExec (low-card partition key)") {
    onVsOff(df => df.withColumn("rn", row_number().over(
      Window.partitionBy(col("flag")).orderBy(col("v"), col("id")))))
  }

  test("global ROWS running sum equals WindowExec, incl. NULL handling") {
    onVsOff(df => df.withColumn("cs", sum(col("v")).over(
      Window.orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
  }

  test("grouped RANGE running sum equals WindowExec on order-peer ties") {
    // default frame of an ORDER BY window = RANGE UNBOUNDED..CURRENT:
    // peers (duplicate v within a flag) all report the run-end sum
    onVsOff(df => df.withColumn("cs", sum(col("v")).over(
      Window.partitionBy(col("flag")).orderBy(col("v")))))
  }

  test("NULL-prefix RANGE sum is NULL until the first non-null value") {
    // NULLS FIRST ordering puts the null-v rows first; their running sum
    // must be NULL (no non-null contribution yet), not 0
    val got = withFlag(true) {
      val d = nullTieFixture(140).withColumn("cs", sum(col("v")).over(
        Window.orderBy(col("v"))))
      d.queryExecution.optimizedPlan
      d.filter(col("v").isNull).select("cs").collect()
    }
    assert(got.nonEmpty && got.forall(_.isNullAt(0)),
      "all-null prefix must sum to NULL")
  }

  test("mixed row_number + ROWS sum + RANGE sum on one window node") {
    // same (partition, order) spec, three frames -> one Window node
    // carrying all three expressions; all supported -> one exec
    onVsOff { df =>
      val w = Window.partitionBy(col("flag")).orderBy(col("v"), col("id"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("csr", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cs", sum(col("v")).over(w))
    }
  }

  test("double-typed running sum equals WindowExec") {
    onVsOff(df => df.withColumn("cs",
      sum(col("v").cast("double") / 7).over(
        Window.partitionBy(col("flag")).orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
  }

  test("grouped-dist shuffle-width perturbation: widths 3 and 11 agree") {
    def run(width: String): Seq[String] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", width)
        withFlag(true) {
          val d = nullTieFixture(3000).withColumn("rn", row_number().over(
            Window.partitionBy(col("flag")).orderBy(col("v"), col("id"))))
            .withColumn("cs", sum(col("v")).over(
              Window.partitionBy(col("flag")).orderBy(col("v"))))
          d.queryExecution.optimizedPlan
          d.collect().map(_.toString).sorted.toSeq
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run("3") == run("11"))
  }

  test("2^31 rank ceiling: the guard fails fast instead of wrapping") {
    // the stated IntegerType contract (r8 VERDICT #6): driver-side totals
    // past Int.MaxValue must throw, not wrap in toInt
    RankOverflow.check(Int.MaxValue.toLong) // at the ceiling: fine
    val e = intercept[ArithmeticException] {
      RankOverflow.check(Int.MaxValue.toLong + 1)
    }
    assert(e.getMessage.contains("Int.MaxValue"))
  }

  test("shuffle-width perturbation: identical ranks at widths 3 and 11") {
    def run(width: String): Seq[String] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", width)
        withFlag(true) {
          val d = naiveRank(fixture(3000))
          d.queryExecution.optimizedPlan
          d.collect().map(_.toString).sorted.toSeq
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run("3") == run("11"))
  }
}
