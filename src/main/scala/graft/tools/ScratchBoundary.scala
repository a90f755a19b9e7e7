package graft.tools

import org.apache.spark.sql.functions._

/** Measurement harness behind the round-10 boundary-sketch numbers quoted
  * in graft.core.BandedRank / BENCH_NOTES: times the boundary pass
  * formulations in isolation over sf0.1 lineitem cents, plus the full
  * q_weighted_median consumer. Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScratchBoundary /root/testdata/sf0.1"`. */
object ScratchBoundary {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.core.Sessions.local(cpus, "scratch-boundary")
    import graft.core.Tables

    def li = Tables.lineitem(s, dir).select(
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("cents"),
      col("l_quantity").cast("decimal(18,2)").cast("long").as("qty"))

    def time(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    time("gk_percentile_1500") {
      li.agg(percentile_approx(col("cents").cast("double"),
        lit((1 until 64).map(_.toDouble / 64).toArray), lit(1500)))
        .write.mode("overwrite").format("noop").save()
    }
    time("boundary_sketch") {
      li.select(col("cents").cast("double").as("v"))
        .withColumn("n", monotonically_increasing_id())
        .select(col("v"), xxhash64(col("v"), col("n")).as("h"))
        .agg(expr("boundary_sketch(v, h, 64)"))
        .write.mode("overwrite").format("noop").save()
    }
    time("minmax_baseline") {
      li.agg(min(col("cents")), max(col("cents")))
        .write.mode("overwrite").format("noop").save()
    }
    time("q_weighted_median_full") {
      graft.queries.Stats.queries("q_weighted_median")(s, dir)
        .write.mode("overwrite").format("noop").save()
    }
    s.stop()
  }
}
