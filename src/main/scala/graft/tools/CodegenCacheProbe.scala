package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev measurement (guide §1): quantify how much of a full-sweep query
  * timing is CODEGEN RECOMPILE caused by the 100-entry generated-class
  * cache thrashing across a 338-query registry. Times a probe query
  * twice consecutively (warm), then runs `interleave` other registry
  * queries once, then times the probe again — if the post-interleave
  * time returns to the cold cost while the consecutive rerun was fast,
  * the delta is cache eviction, not planning (planning is paid fresh in
  * every rep). Run with -DcacheEntries=N to size the static conf.
  *
  * Usage: runMain graft.tools.CodegenCacheProbe <sfDir> <probe> [interleave] [cpus]
  */
object CodegenCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probe = args(1)
    val interleave = if (args.length > 2) args(2).toInt else 150
    val cpus = if (args.length > 3) args(3) else "32"
    val entries = sys.props.getOrElse("cacheEntries", "100")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", entries)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.tune(spark)

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    println(s"[probe] cacheEntries=$entries probe=$probe interleave=$interleave")
    println(f"[probe] cold        : ${time(probe)}%.3f s")
    println(f"[probe] consecutive1: ${time(probe)}%.3f s")
    println(f"[probe] consecutive2: ${time(probe)}%.3f s")
    val others = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_ == probe).filterNot(_.startsWith("q_stream"))
      .take(interleave)
    val t0 = System.nanoTime()
    others.foreach { n =>
      try time(n) catch { case e: Throwable =>
        System.err.println(s"[probe] $n failed: ${e.getMessage.take(80)}") }
    }
    println(f"[probe] interleaved $interleave queries in ${(System.nanoTime()-t0)/1e9}%.1f s")
    println(f"[probe] post-interleave1: ${time(probe)}%.3f s")
    println(f"[probe] post-interleave2: ${time(probe)}%.3f s")
    spark.stop()
  }
}
