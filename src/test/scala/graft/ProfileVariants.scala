package graft

import org.apache.spark.sql.functions._

/** Throwaway micro-bench for BENCH_NOTES: prices the q_profile_approx
  * aggregate variants (exact multi-distinct vs md5+kmv vs xxhash64+kmv vs
  * Spark HLL) on sf0.1 lineitem. Run: Test/runMain graft.ProfileVariants */
object ProfileVariants {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, "variant-bench")
    val dir = "/root/testdata/sf0.1"
    val li = graft.core.Tables.lineitem(spark, dir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus")
    def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"VARIANT $tag%-28s ${ts.min}%.2f s")
    }
    def num(c: String) =
      if (c.startsWith("l_r") || c.startsWith("l_l")) c
      else s"cast(cast($c as decimal(18,2)) as string)"
    def md5h(c: String) =
      s"cast(conv(substring(md5(${num(c)}),1,8),16,10) as bigint)"
    time("exact-6-distinct")(li.agg(
      count_distinct(col(cols.head)), cols.tail.map(c => count_distinct(col(c))): _*))
    time("md5-hash-only")(li.agg(
      max(expr(md5h(cols.head))), cols.tail.map(c => max(expr(md5h(c)))): _*))
    time("md5-kmv")(li.agg(
      expr(s"kmv(${md5h(cols.head)}, 64)"),
      cols.tail.map(c => expr(s"kmv(${md5h(c)}, 64)")): _*))
    time("xxhash64-kmv")(li.agg(
      expr(s"kmv(xxhash64(${cols.head}), 64)"),
      cols.tail.map(c => expr(s"kmv(xxhash64($c), 64)")): _*))
    time("spark-hll")(li.agg(
      approx_count_distinct(col(cols.head)),
      cols.tail.map(c => approx_count_distinct(col(c))): _*))
    spark.stop()
  }
}
