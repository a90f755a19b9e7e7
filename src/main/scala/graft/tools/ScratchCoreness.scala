package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement harness behind the [[graft.queries.Graph.CorenessRounds]]
  * bound: per test scale, how many clamped H-index rounds until the
  * label table stops moving. Round r is recomputed from scratch (O(R²)
  * total rounds — fine at probe scale); `changed_vs_prev` = labels that
  * differ from the (r−1)-round run, so the first 0 marks stability and
  * (because the iterate is monotone toward coreness) exactness.
  * Measured for the round-9 rewrite: stable from r=1 at sf0.001, 0.01
  * AND 0.1 — the co-purchase graph is dense enough that nearly every
  * node saturates at the cap immediately. */
object ScratchCoreness {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Sessions.tune(spark)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (dir <- dirs) {
      val edges = graft.queries.Graph.coOrderEdges(spark, dir)
      var prevLabels: Map[Long, Long] = Map.empty
      for (r <- 1 to 8) {
        val c = graft.queries.Graph.corenessLabels(spark, edges, r)
        val m = c.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
        c.unpersist(blocking = false)
        val diff = if (prevLabels.isEmpty) -1
          else m.count { case (k, v) => prevLabels.get(k) != Some(v) }
        println(s"[scratch] $dir rounds=$r changed_vs_prev=$diff")
        prevLabels = m
      }
    }
    spark.stop()
  }
}
