package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SketchDistinctRewrite

/** The AQP optimizer rule: with the flag on, exact COUNT(DISTINCT)
  * rewrites to the kmv sketch estimator — same values as the explicit
  * sketch formulation, reversible by conf, inert for unsupported shapes. */
class SketchRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = graft.core.Sessions.local(4, "graft-rewrite-test")
    // runtime injection path (live session); GraftExtensions covers the
    // spark.sql.extensions path with the same rule object
    s.experimental.extraOptimizations ++= Seq(SketchDistinctRewrite)
    s
  }
  val sfDir = "/root/testdata/sf0.001"

  private def flagged[A](on: Boolean)(body: => A): A = {
    spark.conf.set(SketchDistinctRewrite.Flag, on.toString)
    try body finally spark.conf.set(SketchDistinctRewrite.Flag, "false")
  }

  private def grouped(): Map[String, Long] = {
    import spark.implicits._
    graft.core.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("flag on: count distinct returns the kmv estimate; flag off: exact") {
    import spark.implicits._
    val exact = flagged(on = false)(grouped())
    val approx = flagged(on = true)(grouped())
    // the expected estimate, via the explicit sketch the gate already
    // verified (same hash, same k, same arithmetic, cast long)
    val expected = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(expr("kmv(cast(conv(substring(md5(cast(l_partkey as string))," +
        " 1, 15), 16, 10) as bigint), 64)").as("sk"))
      .select($"l_returnflag",
        when($"sk.n_kept" < 64, $"sk.n_kept".cast("long"))
          .otherwise((lit(63.0 * 1152921504606846976.0) / $"sk.kth").cast("long"))
          .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx == expected, "rewrite must equal the explicit kmv formulation")
    // groups over k distinct keys estimate (≠ exact, within ~1/√k); groups
    // strictly under k are exact even through the sketch (a group AT
    // exactly k fills the sketch and takes the estimator branch)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      if (ex < 64) assert(ap == ex, s"group $k under k must be exact")
      else assert(math.abs(ap - ex).toDouble / ex < 0.5,
        s"group $k estimate $ap implausibly far from exact $ex")
    }
    assert(exact.exists { case (k, ex) => ex > 64 && approx(k) != ex },
      "fixture should exercise the estimating regime")
  }

  // single-aggregate queries below: a LONE distinct survives to the
  // extraOptimizations batch (multi-distinct would already be expanded
  // there — see the rule's injection-path scaladoc), so each shape's
  // guard/behavior is genuinely exercised on this injection path
  test("double-typed distinct is out of scope and stays exact under the flag") {
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val exact = li.agg(countDistinct($"l_extendedprice")).collect()(0).getLong(0)
    val same = flagged(on = true) {
      li.agg(countDistinct($"l_extendedprice")).collect()(0).getLong(0)
    }
    assert(same == exact, "double-typed distinct must not rewrite")
  }

  test("a null-producing when() child rewrites null-safely: estimate matches " +
    "the explicit kmv over the same conditional") {
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val approx = flagged(on = true) {
      li.agg(countDistinct(when($"l_quantity" > 25, $"l_partkey")))
        .collect()(0).getLong(0)
    }
    // nulls never enter the sketch (kmv skips null hashes), matching
    // COUNT(DISTINCT)'s null semantics — same arithmetic, built explicitly
    val expected = li
      .agg(expr("kmv(cast(conv(substring(md5(cast(" +
        "case when l_quantity > 25 then l_partkey end as string)), 1, 15)," +
        " 16, 10) as bigint), 64)").as("sk"))
      .select(when($"sk.n_kept" < 64, $"sk.n_kept".cast("long"))
        .otherwise((lit(63.0 * 1152921504606846976.0) / $"sk.kth").cast("long")))
      .collect()(0).getLong(0)
    assert(approx == expected)
  }
}
