package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.KmvAgg

/** Semantic invariants of the sketch (KmvAgg / q_kmv_distinct) and layout
  * (q_zorder) operators — exact values are the DuckDB oracle's job. */
class SketchLayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-test")
  val sfDir = "/root/testdata/sf0.001"

  test("kmv buffer keeps the k smallest DISTINCT hashes") {
    val buf = new KmvAgg.Buffer(3)
    Seq(50L, 10L, 10L, 40L, 20L, 30L, 10L).foreach(buf.offer)
    // distinct = {10,20,30,40,50}; 3 smallest = {10,20,30}; kth = 30
    assert(buf.size == 3)
    assert(buf.kth == 30L)
    var kept = List.empty[Long]
    buf.foreach(h => kept ::= h)
    assert(kept.sorted == List(10L, 20L, 30L))
  }

  test("kmv is exact below k and merge-invariant across partitionings") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val hashExpr = "cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint)"
    // 40 distinct values < k=64: the sketch IS the distinct set
    val small = (1 to 40).map(i => i % 40).toDF("v")
    val r = small.selectExpr(s"kmv($hashExpr, 64) AS sk")
      .selectExpr("sk.n_kept").as[Int].head()
    assert(r == 40)
    // partial-aggregation invariance: 1 vs 8 partitions, same sketch
    val big = (1 to 5000).toDF("v")
    def sketch(parts: Int) = big.repartition(parts)
      .selectExpr(s"kmv($hashExpr, 64) AS sk")
      .selectExpr("sk.n_kept", "sk.kth").as[(Int, Long)].head()
    assert(sketch(1) == sketch(8))
  }

  test("kmv_sketch value is the sorted k distinct minima; kmv_merge of " +
       "grouped sketches equals the one-pass sketch of the full stream") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val hashExpr = "cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint)"
    // below k with duplicates: the sketch IS the sorted distinct hash set
    val small = (1 to 80).map(i => i % 40).toDF("v")
    val arr = small.selectExpr(s"kmv_sketch($hashExpr, 64) AS sk")
      .selectExpr("sk").as[Seq[Long]].head()
    val exact = small.select(expr(hashExpr).as("h")).distinct()
      .as[Long].collect().sorted.toSeq
    assert(arr == exact)
    // the union property the serving path rests on: merging per-group
    // sketches == sketching the concatenated raw stream (and both equal
    // KmvAgg's (n_kept, kth) summary of the same stream)
    val big = (1 to 5000).map(i => (i % 17, i)).toDF("g", "v")
    val onePass = big.selectExpr(s"kmv_sketch($hashExpr, 64) AS sk")
      .selectExpr("sk").as[Seq[Long]].head()
    val merged = big.groupBy($"g")
      .agg(expr(s"kmv_sketch($hashExpr, 64)").as("sk"))
      .agg(expr("kmv_merge(sk, 64)").as("m"))
      .selectExpr("m").as[Seq[Long]].head()
    assert(merged == onePass)
    assert(onePass.length == 64 && onePass == onePass.sorted)
    val summary = big.selectExpr(s"kmv($hashExpr, 64) AS sk")
      .selectExpr("sk.n_kept", "sk.kth").as[(Int, Long)].head()
    assert(summary == ((onePass.length, onePass.last)))
    // conditional-merge idiom skips NULL sketch rows instead of failing
    val cond = big.groupBy($"g")
      .agg(expr(s"kmv_sketch($hashExpr, 64)").as("sk"))
      .agg(expr("kmv_merge(CASE WHEN g < 0 THEN sk END, 64)").as("m"))
      .selectExpr("size(m)").as[Int].head()
    assert(cond == 0)
  }

  test("kmv estimate lands within the ~1/sqrt(k) error regime") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val hashExpr = "cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint)"
    val n = 5000
    val (kept, kth) = (1 to n).toDF("v")
      .selectExpr(s"kmv($hashExpr, 64) AS sk")
      .selectExpr("sk.n_kept", "sk.kth").as[(Int, Long)].head()
    assert(kept == 64)
    val est = 63.0 * 1152921504606846976.0 / kth
    // 1/sqrt(64) = 12.5% standard error; allow 4 sigma
    assert(math.abs(est - n) / n < 0.5, s"estimate $est vs exact $n")
  }

  /** Round-9 VERDICT item 3: the KMV hash domain is 60-bit (15 md5 hex
    * chars), widened from 32-bit. Collision budget: among n true
    * distincts the expected number of colliding pairs is ~n²/2⁶¹ —
    * at n = 10⁹ (the DAU/MAU serving path's target) that is ~4·10⁻⁴
    * expected collisions vs ~10⁸ in the old 2³² space (where the sketch
    * saturates outright past ~2³² keys and estimates bias low). This
    * case proves the domain is actually wide: kth scales to 2⁶⁰, i.e.
    * lands far past the old 2³² ceiling, and the estimator uses the
    * matching 2⁶⁰ scale. */
  test("kmv hashes occupy the 60-bit domain, not the old 32-bit one") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val hashExpr = "cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint)"
    val (kept, kth) = (1 to 5000).toDF("v")
      .selectExpr(s"kmv($hashExpr, 64) AS sk")
      .selectExpr("sk.n_kept", "sk.kth").as[(Int, Long)].head()
    assert(kept == 64)
    // expected kth ≈ (64/5000)·2⁶⁰ ≈ 1.5e16 — astronomically above 2³²;
    // under the old 8-hex-digit hash kth could never exceed 2³²
    assert(kth > (1L << 32), s"kth=$kth still looks 32-bit")
    assert(kth < (1L << 60), s"kth=$kth outside the 60-bit domain")
  }

  test("q_kmv_distinct: exact column is truly exact, estimate within rel_err") {
    val rows = SparkEntry.queries("q_kmv_distinct")(spark, sfDir).collect()
    assert(rows.length == 3) // return flags A/N/R
    rows.foreach { r =>
      val (exact, est, err) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(exact > 0)
      assert(math.abs(est - exact) / exact == err)
      assert(err < 0.5, s"flag ${r.getString(0)}: rel_err $err")
    }
  }

  test("zorder: morton key bijects and interleaves bits correctly") {
    // reference interleave computed independently (bit twiddling in Scala)
    def morton(x: Int, y: Int): Int =
      (0 until 8).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum
    val rows = SparkEntry.queries("q_zorder")(spark, sfDir).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    rows.foreach { case (zx, zy, zval, cluster) =>
      assert(zval == morton(zx, zy), s"($zx,$zy) -> $zval")
      assert(cluster == zval >> 8)
    }
    // distinct coordinates -> distinct keys (bijection on the quantized grid)
    assert(rows.map(t => (t._1, t._2)).distinct.length ==
      rows.map(_._3).distinct.length)
  }

  test("zorder: a cluster's members are rectangle-local in both dimensions") {
    val rows = SparkEntry.queries("q_zorder")(spark, sfDir).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(4)))
    // high byte of a 16-bit morton key fixes the top 4 bits of each dim:
    // within a cluster both coordinates span at most 2^4 = 16 values
    rows.groupBy(_._3).foreach { case (c, grp) =>
      val (xs, ys) = (grp.map(_._1), grp.map(_._2))
      assert(xs.max - xs.min < 16, s"cluster $c x-spread")
      assert(ys.max - ys.min < 16, s"cluster $c y-spread")
    }
  }
}
