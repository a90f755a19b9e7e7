package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Inference

/** Identity checks for the nonparametric-statistics family — each operator
  * carries a textbook identity that must hold on ANY input, so these run
  * against the sf0.001 tables rather than synthetic fixtures.
  */
class InferenceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-inference-test")
  val sfDir = "/root/testdata/sf0.001"

  test("mann-whitney: U_we + U_wd == n_we * n_wd (rank-sum identity)") {
    val r = Inference.qMannWhitney(spark, sfDir).collect()(0)
    val (nWd, nWe) = (r.getAs[Long]("n_wd"), r.getAs[Long]("n_we"))
    val u = r.getAs[Double]("u_we") + r.getAs[Double]("u_wd")
    assert(u === (nWd * nWe).toDouble)
    assert(r.getAs[Double]("u_we") >= 0 && r.getAs[Double]("u_wd") >= 0)
  }

  test("ks statistic is in [0,1] and samples partition the day count") {
    val r = Inference.qKsTest(spark, sfDir).collect()(0)
    val ks = r.getAs[Double]("ks")
    assert(ks >= 0.0 && ks <= 1.0)
    val days = graft.core.Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_orderdate"))).collect()(0).getLong(0)
    assert(r.getAs[Long]("n_wd") + r.getAs[Long]("n_we") === days)
  }

  test("spearman rho is in [-1,1]; gini is in [0,1)") {
    val rho = Inference.qSpearman(spark, sfDir)
      .collect()(0).getAs[Double]("rho")
    assert(rho >= -1.0 && rho <= 1.0)
    val g = Inference.qGini(spark, sfDir).collect()(0).getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
  }

  test("abc classes partition the parts and shares sum to ~1, A-share largest") {
    val rows = Inference.qAbcClass(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("cls")).toSeq === Seq("A", "B", "C"))
    val nParts = graft.core.Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_parts")).sum === nParts)
    val shares = rows.map(_.getAs[Double]("rev_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    // by construction A covers ~80% of revenue, so its share dominates
    assert(shares(0) > shares(1) && shares(0) > shares(2))
  }

  test("theil-sen pair count is C(k,2) for the k-day tail") {
    val r = Inference.qTheilSen(spark, sfDir).collect()(0)
    val daily = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate")).count()
    val k = daily
      .crossJoin(broadcast(daily.agg(max(col("o_orderdate")).as("md"))))
      .filter(col("o_orderdate") >= date_sub(col("md"), 59))
      .count()
    assert(r.getAs[Long]("n_pairs") === k * (k - 1) / 2)
    assert(!r.isNullAt(r.fieldIndex("slope_cents_per_day")))
  }
}
