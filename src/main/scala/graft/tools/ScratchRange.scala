package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics probe behind the r14 RANGE-offset-frame collapse
  * (graft.plans.RangeFrameCollapse): prints the BUILT-IN WindowExec
  * results for literal-offset RANGE frames on edge fixtures — NULL order
  * values, empty both-PRECEDING frames, duplicate order values (peer
  * runs), count-vs-sum empty-frame contracts — so the collapsed plan's
  * equivalence argument rests on observed behavior. Run:
  * `sbt "runMain graft.tools.ScratchRange"`. */
object ScratchRange {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local(4, "scratch-range")
    import s.implicits._

    // g=1: plain runs with duplicate v; g=2: null order values mixed in
    val rows = Seq(
      (1, 1, Some(10L), 1.0), (1, 2, Some(10L), 2.0), (1, 3, Some(12L), 4.0),
      (1, 4, Some(15L), 8.0), (1, 5, Some(16L), 16.0), (1, 6, Some(30L), 32.0),
      (2, 1, None: Option[Long], 1.0), (2, 2, None: Option[Long], 2.0),
      (2, 3, Some(5L), 4.0), (2, 4, Some(6L), 8.0), (2, 5, Some(20L), 16.0)
    ).toDF("g", "id", "v", "x")

    val w = Window.partitionBy($"g").orderBy($"v")
    println("=== RANGE BETWEEN 2 PRECEDING AND CURRENT ROW ===")
    rows.select($"g", $"id", $"v", $"x",
      sum($"x").over(w.rangeBetween(-2, 0)).as("sum_2p"),
      count($"x").over(w.rangeBetween(-2, 0)).as("cnt_2p"),
      min($"x").over(w.rangeBetween(-2, 0)).as("min_2p"))
      .orderBy($"g", $"id").show(20)

    println("=== RANGE BETWEEN 5 PRECEDING AND 3 PRECEDING (can be empty) ===")
    rows.select($"g", $"id", $"v", $"x",
      sum($"x").over(w.rangeBetween(-5, -3)).as("sum_p"),
      count($"x").over(w.rangeBetween(-5, -3)).as("cnt_p"))
      .orderBy($"g", $"id").show(20)

    println("=== RANGE BETWEEN 1 PRECEDING AND 4 FOLLOWING ===")
    rows.select($"g", $"id", $"v", $"x",
      sum($"x").over(w.rangeBetween(-1, 4)).as("sum_f"),
      count($"x").over(w.rangeBetween(-1, 4)).as("cnt_f"))
      .orderBy($"g", $"id").show(20)

    println("=== DESC order, RANGE 2 PRECEDING ===")
    val wd = Window.partitionBy($"g").orderBy($"v".desc)
    rows.select($"g", $"id", $"v", $"x",
      sum($"x").over(wd.rangeBetween(-2, 0)).as("sum_d"))
      .orderBy($"g", $"id").show(20)
    s.stop()
  }
}
