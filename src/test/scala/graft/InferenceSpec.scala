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

  test("qq deciles: both columns are non-decreasing and gap is their difference") {
    val rows = Inference.qQqDeciles(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq === (1 to 9))
    val wd = rows.map(_.getAs[Long]("wd_c"))
    val we = rows.map(_.getAs[Long]("we_c"))
    assert(wd.sliding(2).forall(p => p(0) <= p(1)), "wd deciles monotone")
    assert(we.sliding(2).forall(p => p(0) <= p(1)), "we deciles monotone")
    rows.foreach(r => assert(
      r.getAs[Long]("gap_c") === r.getAs[Long]("we_c") - r.getAs[Long]("wd_c")))
  }

  test("cuped: variance ratio <= 1 (adjustment can't inflate variance) and arms partition") {
    val rows = Inference.qCuped(spark, sfDir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val vr = r.getAs[Double]("var_ratio")
      // pooled-theta CUPED minimizes pooled variance; per-arm ratio can
      // exceed 1 only under pathological arm/pooled covariance flips —
      // assert the sane range observed for revenue panels
      assert(vr <= 1.0 + 1e-9 && vr >= 0.0, s"var_ratio $vr out of range")
      assert(r.getAs[Long]("n_units") > 0)
    }
  }

  test("did: estimate equals the four reported cell means' double difference") {
    val r = Inference.qDid(spark, sfDir).collect()(0)
    val did = r.getAs[Double]("m_treat_post") - r.getAs[Double]("m_treat_pre") -
      (r.getAs[Double]("m_ctrl_post") - r.getAs[Double]("m_ctrl_pre"))
    // did is computed from unrounded means then rounded; the recomposition
    // from 4dp-rounded means agrees to 4 rounding ulps
    assert(math.abs(did - r.getAs[Double]("did")) < 4e-4)
    Seq("n_tp", "n_t0", "n_cp", "n_c0").foreach(c =>
      assert(r.getAs[Long](c) > 0, s"empty cell $c"))
  }

  test("bootstrap CI: lo < hi, brackets the point estimate, 50 replicas") {
    val r = Inference.qBootstrapCi(spark, sfDir).collect()(0)
    val (lo, hi, m) = (r.getAs[Double]("ci_lo_c"),
      r.getAs[Double]("ci_hi_c"), r.getAs[Double]("mean_c"))
    assert(lo < hi)
    // a 95% CI of the mean should bracket the full-sample mean on any
    // non-adversarial sample; fails only if the weighting is broken
    assert(lo <= m && m <= hi, s"CI [$lo,$hi] misses mean $m")
    assert(r.getAs[Long]("n_replicas") === 50L)
    assert(r.getAs[Long]("n_units") > 0L)
  }

  test("neyman allocation: shares sum to 1 and beat-or-match proportional on paper") {
    val rows = Inference.qNeymanAlloc(spark, sfDir).collect()
    val shares = rows.map(_.getAs[Double]("neyman_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"shares sum ${shares.sum}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_neyman") >= 0L)
      assert(r.getAs[Double]("sd_spend") > 0.0)
    }
    // total allocated ≈ 1% of units under either scheme (rounding slack)
    val n = rows.map(_.getAs[Long]("n_units")).sum
    val alloc = rows.map(_.getAs[Long]("n_neyman")).sum
    assert(math.abs(alloc - n / 100.0) <= rows.length)
  }

  test("funnel TTC deciles are non-negative and non-decreasing") {
    val rows = graft.queries.Analytics.qFunnelTtc(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq === (1 to 9))
    val v = rows.map(_.getAs[Long]("ttc_sec"))
    assert(v.forall(_ >= 0L))
    assert(v.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("uplift: segment cells partition the customer dim") {
    val rows = Inference.qUplift(spark, sfDir).collect()
    val total = rows.map(r =>
      r.getAs[Long]("n_treat") + r.getAs[Long]("n_ctrl")).sum
    val nCust = graft.core.Tables.customer(spark, sfDir).count()
    assert(total === nCust)
    rows.foreach(r => assert(
      r.getAs[Long]("resp_treat") <= r.getAs[Long]("n_treat") &&
        r.getAs[Long]("resp_ctrl") <= r.getAs[Long]("n_ctrl")))
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
