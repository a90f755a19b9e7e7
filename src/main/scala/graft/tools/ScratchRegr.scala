package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics probe behind the r14 regr/skew/kurt window decomposition
  * (graft.plans.WindowVarianceDecompose): prints the BUILT-IN window
  * results on edge fixtures — null on one pair side, constant x,
  * single-row frames, all-null groups — under both settings of
  * `spark.sql.legacy.statisticalAggregate`, so the decomposed formulas'
  * NULL/NaN/masking contracts are copied from observed behavior, not
  * assumed. Run: `sbt "runMain graft.tools.ScratchRegr"`. */
object ScratchRegr {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local(4, "scratch-regr")
    import s.implicits._

    // g=1: clean pairs; g=2: nulls on each side; g=3: constant x;
    // g=4: single row; g=5: all pairs broken (n=0 after masking)
    val rows = Seq(
      (1, 1, Some(2.0), Some(1.0)), (1, 2, Some(4.0), Some(2.0)),
      (1, 3, Some(7.0), Some(3.0)), (1, 4, Some(8.0), Some(4.0)),
      (2, 1, Some(2.0), Some(1.0)), (2, 2, None: Option[Double], Some(2.0)),
      (2, 3, Some(6.0), None: Option[Double]), (2, 4, Some(9.0), Some(4.0)),
      (3, 1, Some(2.0), Some(5.0)), (3, 2, Some(4.0), Some(5.0)),
      (3, 3, Some(6.0), Some(5.0)),
      (4, 1, Some(3.0), Some(2.0)),
      (5, 1, None: Option[Double], Some(1.0)),
      (5, 2, Some(2.0), None: Option[Double]),
      (6, 1, Some(5.0), Some(1.0)), (6, 2, Some(5.0), Some(2.0)),
      (6, 3, Some(5.0), Some(3.0))
    ).toDF("g", "id", "y", "x")

    val run = Window.partitionBy($"g").orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def show(legacy: Boolean): Unit = {
      s.conf.set("spark.sql.legacy.statisticalAggregate", legacy.toString)
      println(s"=== legacy.statisticalAggregate=$legacy ===")
      rows
        .withColumn("slope", expr("regr_slope(y, x)").over(run))
        .withColumn("icept", expr("regr_intercept(y, x)").over(run))
        .withColumn("r2", expr("regr_r2(y, x)").over(run))
        .withColumn("sxx", expr("regr_sxx(y, x)").over(run))
        .withColumn("syy", expr("regr_syy(y, x)").over(run))
        .withColumn("sxy", expr("regr_sxy(y, x)").over(run))
        .withColumn("avgx", expr("regr_avgx(y, x)").over(run))
        .withColumn("cnt", expr("regr_count(y, x)").over(run))
        .withColumn("skew", skewness($"x").over(run))
        .withColumn("kurt", kurtosis($"x").over(run))
        .orderBy($"g", $"id")
        .show(50, truncate = false)
    }
    show(legacy = false)
    show(legacy = true)

    // What does the analyzer turn regr_count/avgx into? (RuntimeReplaceable)
    val plan = rows.withColumn("cnt", expr("regr_count(y, x)").over(run))
      .withColumn("avgx", expr("regr_avgx(y, x)").over(run))
      .withColumn("sxx", expr("regr_sxx(y, x)").over(run))
      .queryExecution.analyzed
    println(plan.toString.take(4000))
    s.stop()
  }
}
