package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement behind the BENCH_NOTES r11 KMV error-bar line
  * (the committed numbers must be reproducible, not remembered). */
object KmvErrScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.tune(spark)
    val n = 10000000L
    val hashed = spark.range(n).selectExpr(
      "cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as bigint) AS hv")
    val r = hashed.selectExpr("kmv(hv, 64) AS s64", "kmv(hv, 1024) AS s1024")
      .selectExpr("s64.kth", "s1024.kth").head()
    val dom = 1152921504606846976.0
    val e64 = 63.0 * dom / r.getLong(0)
    val e1024 = 1023.0 * dom / r.getLong(1)
    println(f"KMVERR k64 est=$e64%.0f relerr=${math.abs(e64 - n).toDouble / n}%.4f" +
      f"  k1024 est=$e1024%.0f relerr=${math.abs(e1024 - n).toDouble / n}%.4f")
    spark.stop()
  }
}
