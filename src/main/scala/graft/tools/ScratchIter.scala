package graft.tools

/** Measurement harness for the iterative-graph-family shuffle-width
  * question: the loops run 10-15 rounds of join+agg+persist+count over a
  * SMALL graph (thousands of nodes at sf0.1), so per-round FIXED cost
  * (task launch + state per shuffle partition) can dominate real work.
  * IterativePerturbationSpec pins results bit-identical across widths,
  * so narrowing the session shuffle width for these queries is
  * semantics-free. Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScratchIter /root/testdata/sf0.1"`. */
object ScratchIter {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = graft.core.Sessions.local(cpus, "scratch-iter")

    def time(name: String, width: String)(f: => Unit): Unit = {
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", width)
      try {
        f // warmup
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[scratch] $name%-14s width=$width%-3s min=${ts.min}%.3f")
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }

    for (q <- Seq("q_hits", "q_kmeans", "q_mmr_rerank", "q_motif",
                  "q_bfs_levels", "q_components");
         w <- Seq("32", "8")) {
      time(q, w) {
        graft.SparkEntry.queries(q)(s, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    s.stop()
  }
}
