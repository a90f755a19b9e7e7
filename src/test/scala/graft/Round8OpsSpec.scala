package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Analytics, Graph, Inference, Stats, TemporalJoins, TimeSeries, WarehouseOps}

/** Driver-side replications and invariants for the round-8 operator
  * batch — each test recomputes the answer from first principles on the
  * small sf0.001 tables (collected to the driver) or asserts a
  * structural identity the operator must satisfy, independently of the
  * DuckDB oracle. */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-r8-test")
  val sfDir = "/root/testdata/sf0.001"

  private def custSpend(): Array[(Long, Long)] =
    graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("spend"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("gini: banded result equals the brute-force closed form") {
    val sorted = custSpend().sortBy(t => (t._2, t._1))
    val n = sorted.length.toDouble
    val sx = sorted.map(_._2.toDouble).sum
    val six = sorted.zipWithIndex.map { case ((_, x), i) => (i + 1) * x.toDouble }.sum
    val expected = math.rint((2 * six - (n + 1) * sx) / (n * sx) * 1e6) / 1e6
    val got = Inference.qGini(spark, sfDir).collect().head
    assert(got.getAs[Long]("n_customers") == sorted.length)
    assert(math.abs(got.getAs[Double]("gini") - expected) < 1e-9)
  }

  test("gini_by_nation: per-nation values bracket sanely and count to all customers") {
    val rows = Inference.qGiniByNation(spark, sfDir).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getAs[Long]("n_customers")).sum == custSpend().length)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
  }

  test("srm_check: chi2 recomputes from the emitted counts; flag is the 3.841 cut") {
    val r = Inference.qSrmCheck(spark, sfDir).collect().head
    val nt = r.getAs[Long]("n_treat"); val nc = r.getAs[Long]("n_control")
    val d = (nt - nc).toDouble; val n = (nt + nc).toDouble
    assert(math.abs(r.getAs[Double]("chi2") - math.rint(d * d / n * 1e6) / 1e6) < 1e-12)
    assert(r.getAs[Boolean]("srm_flag") ==
      (BigInt(nt - nc).pow(2) * 1000 > BigInt(nt + nc) * 3841))
  }

  test("qte_deciles: both arms' decile curves are monotone nondecreasing") {
    val rows = Inference.qQteDeciles(spark, sfDir).collect()
    assert(rows.length == 9)
    val ctl = rows.map(_.getAs[Long]("y_control_c"))
    val trt = rows.map(_.getAs[Long]("y_treat_c"))
    assert(ctl.sliding(2).forall(p => p(0) <= p(1)), "control deciles not monotone")
    assert(trt.sliding(2).forall(p => p(0) <= p(1)), "treat deciles not monotone")
    rows.foreach(r => assert(r.getAs[Long]("qte_c") ==
      r.getAs[Long]("y_treat_c") - r.getAs[Long]("y_control_c")))
  }

  test("iv_wald: LATE recomposes as ITT_y/ITT_x from the emitted pieces") {
    val r = Inference.qIvWald(spark, sfDir).collect().head
    val itty = r.getAs[Double]("itt_y"); val ittx = r.getAs[Double]("itt_x")
    val late = r.getAs[Double]("late_spend")
    // rounding at the projection makes exact recomposition approximate;
    // the identity must hold to the rounding granularity
    assert(math.abs(late - itty / ittx) < math.abs(late) * 0.01 + 0.01)
    // the Wald ratio amplifies the ITT (|ITT_x| <= 1 always)
    assert(math.abs(ittx) <= 1.0)
  }

  test("modularity: contributions are bounded and intra-edges never exceed degree sums") {
    val rows = Graph.qModularity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("contribution_ppm")
      assert(ppm > -1000000L && ppm < 1000000L, s"contribution out of (-1,1): $r")
      // each intra-community edge contributes 2 to the community degree sum
      assert(2 * r.getAs[Long]("intra_edges") <= r.getAs[Long]("degree_sum"))
    }
  }

  test("periodogram: exact replication from the collected daily series") {
    // (the weekly peak itself is scale-dependent — it dominates at sf0.1,
    // verified in BENCH_NOTES — so the spec proves the TRANSFORM exactly
    // rather than asserting a data property of the tiny fixture)
    val dayRows = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").cast("date").cast("string").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("x"))
      .collect()
      .map(r => (java.time.LocalDate.parse(r.getAs[String]("day")),
        r.getAs[Long]("x")))
    val d0 = dayRows.map(_._1).min(
      Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    // t is a DATE DIFFERENCE (calendar gaps preserved), and both
    // roundings are HALF_UP (Spark's round()), not rint's half-even
    def halfUp(v: Double, scale: Int): BigDecimal =
      BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    val daily = dayRows.map { case (d, x) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, d), x)
    }
    val rows = TimeSeries.qPeriodogram(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("period")).toSeq == (2 to 14))
    rows.foreach { r =>
      val p = r.getAs[Int]("period")
      def term(f: Double => Double): Long = daily.map { case (t, x) =>
        val c = halfUp(f(2.0 * math.Pi * t / p), 6)
        halfUp((BigDecimal(x) * c).toDouble, 0).toLong
      }.sum
      assert(r.getAs[Long]("r_c") == term(math.cos), s"R mismatch at p=$p")
      assert(r.getAs[Long]("i_c") == term(math.sin), s"I mismatch at p=$p")
    }
  }

  test("bitemporal: corrected flag is exactly the belief-diff predicate") {
    val rows = TemporalJoins.qBitemporal(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val changed = r.isNullAt(r.fieldIndex("attr_asof_half")) ||
        r.getAs[String]("attr_asof_half") != r.getAs[String]("attr_current") ||
        r.getAs[Long]("value_asof_half_c") != r.getAs[Long]("value_current_c")
      assert(r.getAs[Boolean]("corrected") == changed, s"flag mismatch: $r")
    }
    // the half-load cut must actually hide some later corrections
    assert(rows.exists(_.getAs[Boolean]("corrected")),
      "fixture produced no corrections — the knowledge cut is vacuous")
  }

  test("inferred_members: exactly the fact keys the withheld dim cannot resolve") {
    val rows = WarehouseOps.qInferredMembers(spark, sfDir).collect()
    val factKeys = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val loaded = graft.core.Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 50 =!= 0)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val expected = factKeys -- loaded
    assert(rows.map(_.getAs[Long]("c_custkey")).toSet == expected)
    assert(rows.forall(_.getAs[Boolean]("is_inferred")))
  }

  test("lead_time: nation means recompute from collected lineitem joins") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .join(graft.core.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.core.Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), datediff(col("l_shipdate"), col("o_orderdate"))
        .cast("long").as("lead"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = li.groupBy(_._1).map { case (nation, rs) =>
      val sum = rs.map(_._2).sum
      // mirror the query exactly: truncating micro-day division, /1e6
      // as a double, then Spark round() = HALF_UP (not rint's
      // half-even — review finding)
      val meanMicro = (BigInt(sum) * 1000000 / rs.length).toLong
      val mean = BigDecimal(meanMicro / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      nation -> (rs.length.toLong, mean)
    }
    val got = Analytics.qLeadTime(spark, sfDir).collect()
    got.foreach { r =>
      val (n, mean) = expected(r.getAs[String]("nation"))
      assert(r.getAs[Long]("n_lineitems") == n)
      assert(math.abs(r.getAs[Double]("mean_lead_days") - mean) < 1e-9)
    }
  }

  test("yoy_growth: growth_bps recomputes from the emitted revenue pair") {
    val rows = Analytics.qYoyGrowth(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (r.isNullAt(r.fieldIndex("prev_c")))
        assert(r.isNullAt(r.fieldIndex("growth_bps")))
      else {
        val want = (BigInt(r.getAs[Long]("revenue_c") - r.getAs[Long]("prev_c"))
          * 10000 / BigInt(r.getAs[Long]("prev_c"))).toLong
        assert(r.getAs[Long]("growth_bps") == want, s"bps mismatch: $r")
      }
    }
  }

  test("return_rates: ppm shares recompute and bound by 1e6") {
    val rows = Analytics.qReturnRates(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val want = (BigInt(r.getAs[Long]("n_returned")) * 1000000 /
        BigInt(r.getAs[Long]("n_lineitems"))).toLong
      assert(r.getAs[Long]("return_rate_ppm") == want)
      assert(r.getAs[Long]("return_rate_ppm") <= 1000000L)
    }
  }

  test("price_elasticity: slope sign/scale sane and zero-variance guard works") {
    val rows = Stats.qPriceElasticity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("elasticity"))) {
        val e = r.getAs[Double]("elasticity")
        assert(e > -100 && e < 100, s"implausible elasticity: $r")
      }
    }
  }
}
