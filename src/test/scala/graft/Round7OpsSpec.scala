package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Inference, Stats, TextAnalysis, TimeSeries, TextDedup, TrainingData}

/** Driver-side exact replications for the round-7 operator batch: each
  * test recomputes the operator's answer from first principles on the
  * small sf0.001 tables (collected to the driver) and compares exactly —
  * a second, independent implementation next to the DuckDB oracle.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-r7-test")
  val sfDir = "/root/testdata/sf0.001"

  private def dailyCents(): Array[Long] =
    graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("x"))
      .orderBy(col("day"))
      .collect().map(_.getAs[Long]("x"))

  test("weighted median: exact replication from collected lineitem") {
    val rows = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"),
        col("l_quantity").cast("decimal(18,2)").cast("long").as("qty"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val total = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { r => cum += r._3; cum * 2 >= total }.get._2
      (flag, total, med)
    }.toSeq.sortBy(_._1)
    val got = Stats.qWeightedMedian(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("changepoint: level-1 split is the brute-force scaled-CUSUM argmax") {
    val x = dailyCents()
    val n = x.length.toLong
    val t = x.sum
    var c = 0L
    val stats = x.dropRight(1).zipWithIndex.map { case (xi, i) =>
      c += xi
      (math.abs(n * c - (i + 1) * t), i + 1)
    }
    val best = stats.minBy { case (s, rn) => (-s, rn) }
    val all = TimeSeries.qChangepoint(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(all("all") === best._1)
    // segment rows exist and sit on their own side of the split
    // change_day surfaces as whatever temporal class the vintage maps to —
    // compare on the ISO string, which orders correctly for all of them
    val bySeg = TimeSeries.qChangepoint(spark, sfDir).collect()
      .map(r => r.getString(0) -> String.valueOf(r.get(1))).toMap
    assert(bySeg.keySet === Set("all", "pre", "post"))
    assert(bySeg("pre") <= bySeg("all"))
    assert(bySeg("post") > bySeg("all"))
  }

  test("seasonal backtest: exact replication of both models' MAE and MAPE") {
    val x = dailyCents()
    val idx = 7 until x.length
    def expect(lagN: Int, name: String): (String, Long, Long, Double, Long) = {
      val errs = idx.map(i => math.abs(x(i) - x(i - lagN)))
      val apes = idx.map(i => math.abs(x(i) - x(i - lagN)) * 1000000L / x(i))
      (name, idx.length.toLong, errs.sum,
        errs.sum.toDouble / idx.length, apes.sum / idx.length)
    }
    val got = TimeSeries.qSeasonalBacktest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got === Seq(expect(1, "naive_1"), expect(7, "seasonal_7")))
  }

  test("string-sim join: sound (all pairs verified <= 2) and complete " +
    "within the block+length candidate set") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.core.Tables.part(spark, sfDir)
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    val expected = (for {
      a <- names; b <- names
      if a < b
      if a.split(" ").last == b.split(" ").last
      if math.abs(a.length - b.length) <= 2
      if lev(a, b) <= 2
    } yield (a, b, lev(a, b))).toSet
    val got = TextDedup.qStringSimJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("naive bayes: confusion rows partition the odd-id test docs per language") {
    val rows = graft.queries.TextAnalysis.qNaiveBayes(spark, sfDir).collect()
    val byTrue = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val expected = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 =!= 0)
      // docs whose tokenization is empty produce no (doc, tok) rows and
      // are unscoreable — mirror the operator's universe
      .filter(size(expr(
        """split(lower(trim(text)), '\\s+')""")) > 0)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTrue === expected)
    // predictions live in the training label space
    val langs = expected.keySet
    rows.foreach(r => assert(langs.contains(r.getString(1))))
  }

  test("robust anomaly: every flagged day deviates by > 3*1.4826 MADs of its DOW cohort") {
    val daily = dailyCents()
    // replicate cohorts driver-side
    val days = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("x"))
      .select(expr("datediff(day, DATE '1970-01-01') % 7").as("dow"), col("x"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.length + 1) / 2 - 1)
    }
    val med = days.groupBy(_._1).view.mapValues(g => lowerMedian(g.map(_._2).toSeq)).toMap
    val mad = days.groupBy(_._1).view.mapValues { g =>
      lowerMedian(g.map(r => math.abs(r._2 - med(r._1))).toSeq)
    }.toMap
    val expectedFlagged = days.count { case (dow, x) =>
      math.abs(x - med(dow)) * 10000 > mad(dow) * 44478
    }
    val got = graft.queries.TimeSeries.qRobustAnomaly(spark, sfDir).collect()
    assert(got.length === expectedFlagged)
    got.foreach { r =>
      val (dow, x) = (r.getAs[Int]("dow"), r.getAs[Long]("x"))
      assert(r.getAs[Long]("med") === med(dow))
      assert(r.getAs[Long]("mad") === mad(dow))
      assert(math.abs(x - med(dow)) * 10000 > mad(dow) * 44478)
    }
    assert(daily.nonEmpty) // the shared helper stays exercised
  }

  test("revenue bridge: the waterfall identity reconstructs each month's revenue delta") {
    import org.apache.spark.sql.functions.{col => c}
    val monthly = graft.core.Tables.orders(spark, sfDir)
      .groupBy(expr("(year(cast(o_orderdate as timestamp)) * 12" +
        " + month(cast(o_orderdate as timestamp))) - 1").as("m"))
      .agg(sum((c("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("rev"))
      .collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val bridge = graft.queries.Analytics.qRevenueBridge(spark, sfDir).collect()
    assert(bridge.nonEmpty)
    bridge.foreach { r =>
      val m = r.getAs[Number](0).longValue
      val delta = monthly.getOrElse(m, 0L) - monthly.getOrElse(m - 1, 0L)
      assert(r.getAs[Long]("net_change_c") === delta,
        s"month $m bridge ${r.getAs[Long]("net_change_c")} != delta $delta")
    }
  }

  test("drawdown: brute-force replication over the collected daily series") {
    val x = dailyCents()
    var peak = Long.MinValue
    var best = -1L; var bestIdx = -1
    x.zipWithIndex.foreach { case (v, i) =>
      peak = math.max(peak, v)
      if (peak - v > best) { best = peak - v; bestIdx = i }
    }
    val r = graft.queries.TimeSeries.qDrawdown(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("drawdown_c") === best)
    assert(r.getAs[Long]("trough_c") === x(bestIdx))
    assert(r.getAs[Long]("peak_c") === x.take(bestIdx + 1).max)
  }

  test("seasonal strength F-measures are in [0,1]") {
    val r = graft.queries.TimeSeries.qSeasonalStrength(spark, sfDir).collect()(0)
    val (fs, ft) = (r.getAs[Double]("f_seasonal"), r.getAs[Double]("f_trend"))
    assert(fs >= 0.0 && fs <= 1.0, s"f_seasonal $fs")
    assert(ft >= 0.0 && ft <= 1.0, s"f_trend $ft")
    assert(r.getAs[Long]("n_days") > 0)
  }

  test("context-window stats: exact replication from per-doc token counts") {
    val toks = graft.core.Tables.documents(spark, sfDir)
      .select(size(expr(
        """regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"""))
        .cast("long").as("t"))
      .collect().map(_.getLong(0))
    val got = TrainingData.qContextWindowStats(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("win")).toSeq === Seq(512L, 2048L, 8192L))
    got.foreach { r =>
      val w = r.getAs[Long]("win")
      val kept = toks.map(t => math.min(t, w))
      val seqs = toks.map(t => (math.min(t, w) + w - 1) / w)
      assert(r.getAs[Long]("n_docs") === toks.length.toLong)
      assert(r.getAs[Long]("n_truncated") === toks.count(_ > w).toLong)
      assert(r.getAs[Long]("tokens_total") === toks.sum)
      assert(r.getAs[Long]("tokens_kept") === kept.sum)
      assert(r.getAs[Long]("tokens_lost") === toks.sum - kept.sum)
      assert(r.getAs[Long]("n_sequences") === seqs.sum)
      assert(r.getAs[Double]("utilization") ===
        kept.sum.toDouble / (seqs.sum * w).toDouble)
    }
  }

  test("js divergence: exact replication from collected documents") {
    // same rounding as Spark's Round on double: shortest-decimal BigDecimal
    // (valueOf semantics — Scala 2.13 BigDecimal(Double) matches), HALF_UP
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def nano(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val counts = graft.core.Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).trim.toLowerCase.split("\\s+")
          .map(w => (r.getString(0), w))
      }
      .groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.length.toLong) }
      .toSeq
    val nSrc = counts.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._3).sum }
    val cv = counts.groupBy(_._2).map { case (w, xs) => w -> xs.map(_._3).sum }
    val nTotal = cv.values.sum
    val bySrc = counts.groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(t => t._2 -> t._3).toMap }
    val expected = nSrc.keys.toSeq.sorted.map { s =>
      val n = nSrc(s)
      val cMap = bySrc(s)
      var sumNano = 0L
      var overlap = 0L
      cv.toSeq.foreach { case (w, cc) =>
        val c = cMap.getOrElse(w, 0L)
        val q = cc.toDouble / nTotal
        val p = c.toDouble / n
        val m = (p + q) / 2
        val t1 = if (c > 0) { overlap += 1; 0.5 * p * r6(math.log(p / m)) }
                 else 0.0
        sumNano += nano((t1 + 0.5 * q * r6(math.log(q / m))) * 1e9)
      }
      (s, n, overlap, sumNano / 1e9)
    }
    val got = TextAnalysis.qJsDivergence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("overlap_vocab"), r.getAs[Double]("jsd_nats"))).toSeq
    assert(got === expected)
    // JSD is bounded by ln 2 and nonnegative
    got.foreach { case (_, _, _, j) =>
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9, s"jsd out of range: $j")
    }
  }

  test("cramers v: exact replication from collected lineitem") {
    def nano(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val rows = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity)
      .map { case (k, xs) => (k._1, k._2, xs.length.toLong) }.toSeq
    val rt = cells.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._3).sum }
    val ct = cells.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val tt = rows.length.toLong
    val chi2Nano = cells.map { case (f, t, o) =>
      // dev exact in BigInt, then to double — same rounding as Spark's
      // decimal(38,0) → double cast
      val dev = (BigInt(o) * BigInt(tt) - BigInt(rt(f)) * BigInt(ct(t))).toDouble
      nano(dev * dev / (tt.toDouble * rt(f).toDouble * ct(t).toDouble) * 1e9)
    }.sum
    val (rr, cc) = (rt.size.toLong, ct.size.toLong)
    val expV = BigDecimal(math.sqrt((chi2Nano / 1e9)
        / (tt.toDouble * math.min(rr - 1, cc - 1).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = Stats.qCramersV(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n") === tt)
    assert(r.getAs[Long]("dof") === (rr - 1) * (cc - 1))
    assert(r.getAs[Double]("chi2") === chi2Nano / 1e9)
    assert(r.getAs[Double]("cramers_v") === expV)
    assert(expV >= 0.0 && expV <= 1.0, s"V out of range: $expV")
  }

  test("theil index: exact replication + decomposition identity") {
    def nano(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spend = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("spend"))
      .join(graft.core.Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(graft.core.Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("spend")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byNation = spend.groupBy(_._1)
    val nAll = spend.length.toLong
    val sAll = spend.map(_._2).sum
    val expected = byNation.keys.toSeq.sorted.map { nat =>
      val xs = byNation(nat).map(_._2)
      val nG = xs.length.toLong
      val sG = xs.sum
      val mu = sG.toDouble / nG.toDouble
      val twNano = xs.map { x =>
        val r = x.toDouble / mu; nano(r * r6(math.log(r)) * 1e9)
      }.sum
      val p = sG.toDouble / sAll.toDouble
      val q = nG.toDouble / nAll.toDouble
      (nat, nG, sG, (twNano / 1e9) / nG.toDouble, p * r6(math.log(p / q)))
    }
    val got = Inference.qTheilIndex(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_customers"),
        r.getAs[Long]("spend_cents"), r.getAs[Double]("theil_within"),
        r.getAs[Double]("between_term"))).toSeq
    assert(got === expected)
    // the decomposition identity (unrounded doubles): total Theil equals
    // sum of between-terms plus revenue-share-weighted within-terms
    val muAll = sAll.toDouble / nAll.toDouble
    val tAll = spend.map { case (_, x) =>
      val r = x.toDouble / muAll; r * math.log(r)
    }.sum / nAll.toDouble
    val recomposed = byNation.map { case (_, xs0) =>
      val xs = xs0.map(_._2)
      val sG = xs.sum
      val mu = sG.toDouble / xs.length
      val tW = xs.map { x =>
        val r = x.toDouble / mu; r * math.log(r)
      }.sum / xs.length
      val p = sG.toDouble / sAll.toDouble
      p * tW + p * math.log(p / (xs.length.toDouble / nAll.toDouble))
    }.sum
    assert(math.abs(tAll - recomposed) < 1e-9,
      s"decomposition broke: $tAll vs $recomposed")
  }

  test("lorenz curve: exact replication from collected orders") {
    val sp = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("spend"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = sp.length.toLong
    val sAll = sp.map(_._2).sum
    val deciles = sp.sortBy { case (k, x) => (x, k) }.zipWithIndex
      .map { case ((_, x), i0) => (((i0.toLong) * 10) / n, x) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, xs) => (d.toInt, xs.length.toLong, xs.map(_._2).sum) }
    var cum = BigInt(0)
    val expected = deciles.map { case (d, nc, sc) =>
      cum += sc
      (d, nc, sc, ((cum * 1000000) / sAll).toLong)
    }
    val got = Inference.qLorenzCurve(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_customers"),
        r.getAs[Long]("spend_cents"), r.getAs[Long]("cum_share_ppm"))).toSeq
    assert(got === expected)
    assert(got.last._4 === 1000000L, "full cumulative share must be 1e6 ppm")
    assert(got.map(_._4) === got.map(_._4).sorted, "cum share must ascend")
  }

  test("hoover index: exact replication from collected orders") {
    val sp = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("spend"))
      .collect().map(_.getAs[Long]("spend"))
    val n = BigInt(sp.length)
    val sAll = BigInt(sp.sum)
    val sdev = sp.map(x => (BigInt(x) * n - sAll).abs).sum
    val expPpm = ((sdev * 1000000) / (2 * n * sAll)).toLong
    val r = Inference.qHooverIndex(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_customers") === sp.length.toLong)
    assert(r.getAs[Long]("spend_cents") === sp.sum)
    assert(r.getAs[Long]("hoover_ppm") === expPpm)
    assert(expPpm >= 0L && expPpm <= 1000000L, s"out of range: $expPpm")
  }

  test("palma ratio: exact replication from collected orders") {
    val sp = graft.core.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("spend"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("spend")))
    val n = sp.length.toLong
    val sorted = sp.sortBy { case (k, x) => (x, k) }.map(_._2)
    val bottom = sorted.take(((4 * n) / 10).toInt).sum
    val top = sorted.drop((n - n / 10).toInt).sum
    val expPpm = ((BigInt(top) * 1000000) / BigInt(bottom)).toLong
    val r = Inference.qPalmaRatio(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_customers") === n)
    assert(r.getAs[Long]("top10_cents") === top)
    assert(r.getAs[Long]("bottom40_cents") === bottom)
    assert(r.getAs[Long]("palma_ppm") === expPpm)
  }
}
