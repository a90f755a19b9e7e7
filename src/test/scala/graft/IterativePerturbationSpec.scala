package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-width perturbation across the WHOLE iterative family (round-7
  * VERDICT item 6; extends the pagerank-only fixture in
  * StatsGraphSpec): every fixed-point operator's FULL output must be
  * bit-identical when `spark.sql.shuffle.partitions` changes, because a
  * different shuffle width reorders every aggregation's combine sequence
  * and every iteration's partition layout — if any per-iteration state
  * leaked float order-dependence (or a tie-break depended on physical row
  * order), the outputs would diverge here long before a 1000-executor
  * cluster exposed it.
  *
  * Runs at sf0.01 (the driver's correctness scale) with widths {7, 32}:
  * 7 is coprime to everything and forces uneven partition boundaries; 32
  * matches the driver's bench layout. Outputs compare as the exact
  * rendered row set — bit-identical values, not approximate. */
class IterativePerturbationSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.Sessions.local(4, "graft-perturb-test")
  val sfDir = "/root/testdata/sf0.01"

  private val iterative = Seq(
    "q_pagerank", "q_ppr", "q_hits", "q_label_prop", "q_kcore", "q_kmeans",
    // the remaining fixed-point/frontier operators, same contract
    "q_components", "q_bfs_levels", "q_harmonic_centrality")

  private def run(name: String, width: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", width)
      SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (name <- iterative)
    test(s"$name: full output identical at shuffle widths 32 and 7") {
      val wide = run(name, "32")
      val narrow = run(name, "7")
      assert(wide.nonEmpty, s"$name returned no rows at sf0.01")
      assert(wide == narrow,
        s"$name diverged under shuffle-width change: " +
          s"${wide.size} vs ${narrow.size} rows; first diff: " +
          wide.zip(narrow).find { case (a, b) => a != b }
            .orElse(Some((wide.size, narrow.size))).get)
    }
}
