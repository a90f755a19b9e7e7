package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** SpaceSavingAgg invariants: the frequent-item superset guarantee
  * (every item with true count > N/c survives), capacity bounding, and
  * stability under repartitioning (the weighted merge path). */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-ss-test")

  private def forAllSampled[A](g: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  /** Zipf-ish stream: a few hot keys over a long uniform tail. */
  private val streamGen: Gen[List[Long]] = for {
    hot <- Gen.listOfN(3, Gen.chooseNum(0L, 9L))
    burst <- Gen.chooseNum(30, 80)
    tail <- Gen.listOfN(400, Gen.chooseNum(100L, 399L))
  } yield hot.flatMap(h => List.fill(burst)(h)) ++ tail

  test("superset guarantee: every item with count > N/c is a candidate, " +
    "for any partitioning") {
    import spark.implicits._
    val cap = 32
    forAllSampled(Gen.zip(streamGen, Gen.choose(1, 9))) { case (xs, parts) =>
      val df = xs.toDF("x").repartition(parts)
      val cand = df.agg(expr(s"spacesaving(cast(x as bigint), $cap)"))
        .head.getSeq[Long](0).toSet
      assert(cand.size <= cap, s"summary exceeded capacity: ${cand.size}")
      val n = xs.size
      val truth = xs.groupBy(identity).view.mapValues(_.size)
      val mustKeep = truth.filter(_._2 > n / cap).keySet.toSet
      assert(mustKeep.subsetOf(cand),
        s"lost heavy items: ${mustKeep -- cand} (n=$n, cap=$cap, parts=$parts)")
    }
  }

  test("exact regime: capacity >= distinct keys keeps every item") {
    import spark.implicits._
    val xs = (1L to 100L) ++ (1L to 50L)
    val cand = xs.toDF("x").repartition(5)
      .agg(expr("spacesaving(cast(x as bigint), 256)"))
      .head.getSeq[Long](0)
    assert(cand.sorted == (1L to 100L))
  }

  test("q_heavy_hitters two-pass result equals the naive groupBy/HAVING") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Sketches.qHeavyHitters(spark, dir)
    val li = graft.core.Tables.lineitem(spark, dir)
    val n = li.count()
    val thr = (n * 3 + 3999) / 4000
    val want = li.groupBy($"l_partkey".cast("long").as("l_partkey"))
      .agg(count(lit(1)).as("n")).filter($"n" >= thr)
      .orderBy($"l_partkey")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "two-pass heavy hitters diverged from the exact aggregation")
    assert(got.count() > 0, "threshold produced an empty result at sf0.001")
  }
}
