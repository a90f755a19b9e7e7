package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage-by-stage cost of q_spearman at sf0.1. */
object ScratchSpearman {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Sessions.tune(spark)
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val OP = graft.core.OracleParity
    def perCust = graft.core.Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(sum((OP.dec2($"o_totalprice") * 100).cast("long")).as("spend"),
        count(lit(1)).as("n_orders"))
    // warmup
    perCust.write.mode("overwrite").format("noop").save()
    for (_ <- 1 to 2) {
      time("agg-only")(perCust.write.mode("overwrite").format("noop").save())
      time("agg+freq")(graft.core.BandedRank
        .freqAvgRank2(perCust, "n_orders", "ry_l")
        .write.mode("overwrite").format("noop").save())
      time("agg+avgRank2")(graft.core.BandedRank
        .avgRank2(perCust, "spend", "rx_l")
        .write.mode("overwrite").format("noop").save())
      time("full")(graft.queries.Inference.queries("q_spearman")(spark, dir)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
