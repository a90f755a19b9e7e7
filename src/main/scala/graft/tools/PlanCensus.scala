package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Whole-registry plan census: for every batch entry in
  * `SparkEntry.queries`, build the DataFrame and count the plan features
  * the 100-TB review cares about — exchanges,
  * join strategies, cartesians, scans and their projected widths,
  * whole-stage-codegen coverage, unpartitioned windows. One JSON line
  * per query to `<outPath>`, plus a summary line to stdout. This backs
  * the BENCH_NOTES plan-audit claims ("no cartesian products, no
  * unpushed scans") with a checkable artifact instead of prose.
  *
  * Caveats on "build": most builders are lazy, but IndexStore-backed
  * queries (the LSH/shingle/shell/graph asset consumers) MATERIALIZE
  * their stored assets on first build, and the iterative graph loops
  * run their persist+count rounds — so run the census at a SMALL sfDir,
  * and read those queries' counts as the consumer plan over the stored
  * asset (the build pipelines' own shapes are pinned by their gated
  * entries and PlanAuditSpec, not here). Streaming entries execute
  * their pipeline inside the builder, so they are skipped (their plan
  * properties are pinned by StreamsSpec fixtures instead). AQE is
  * disabled for the census — under AQE the static plan is one opaque
  * adaptive node.
  *
  * Usage: `sbt "runMain graft.tools.PlanCensus <sfDir> <outPath>"`. */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Sessions.tune(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val batch = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("q_stream_"))
    val rows = batch.flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        Some(name -> census(plan))
      } catch {
        case e: Throwable =>
          System.err.println(s"[census] $name failed: ${e.getMessage}")
          None
      }
    }
    val json = rows.map { case (n, c) => s"""  "$n": $c""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    // completeness gate (r9 VERDICT item 2: 14 registry entries were
    // never censused because failures only warned): every batch entry
    // must produce a census row, or the run exits nonzero naming the gap
    val missing = batch.map(_._1).toSet -- rows.map(_._1).toSet
    if (missing.nonEmpty) {
      System.err.println(s"[census] INCOMPLETE: ${missing.size} of " +
        s"${batch.size} batch entries missing: " +
        missing.toSeq.sorted.mkString(", "))
      spark.stop()
      sys.exit(1)
    }

    def total(key: String): Int = rows.map(_._2).map(_(key)).sum
    // interpretation notes (r7 census at sf0.001, 265 batch queries):
    //  - cartesian MUST stay 0; bnlj (~97) is the deliberate 1-row
    //    broadcast-scalar crossJoin idiom (totals/watermarks/thetas),
    //    not a join-strategy failure — watch the DELTA, not the level;
    //  - wide_scans flags >6-col full-width scans; the one standing hit
    //    (q_minhash_est) reads a 17-col minhash SIGNATURE table whose
    //    columns are all genuinely consumed — a heuristic false positive;
    //  - unpartitioned_windows are all over bounded aggregates, pinned
    //    per-family by PlanAuditSpec.
    println(s"""{"queries": ${rows.size}, """ +
      s""""cartesian": ${total("cartesian")}, """ +
      s""""broadcast_nested_loop": ${total("bnlj")}, """ +
      s""""sort_merge_joins": ${total("smj")}, """ +
      s""""broadcast_joins": ${total("bhj")}, """ +
      s""""exchanges": ${total("exchanges")}, """ +
      s""""unpartitioned_windows": ${total("global_windows")}, """ +
      s""""scans_reading_all_cols": ${total("wide_scans")}}""")
    spark.stop()
  }

  private case class Census(m: Map[String, Int]) {
    def apply(k: String): Int = m(k)
    override def toString: String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ", ", "}")
  }

  private def census(plan: SparkPlan): Census = {
    val scans = plan.collect { case s: FileSourceScanExec => s }
    Census(Map(
      "exchanges" -> plan.collect { case e: ShuffleExchangeExec => e }.size,
      "bhj" -> plan.collect { case j: BroadcastHashJoinExec => j }.size,
      "smj" -> plan.collect { case j: SortMergeJoinExec => j }.size,
      "cartesian" -> plan.collect { case j: CartesianProductExec => j }.size,
      "bnlj" -> plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size,
      "scans" -> scans.size,
      // a scan projecting every column of a wide (>6 col) schema usually
      // means pruning failed; dims with few columns are exempt
      "wide_scans" -> scans.count(s =>
        s.relation.schema.size > 6 &&
          s.requiredSchema.size == s.relation.schema.size),
      "codegen_spans" -> plan.collect { case w: WholeStageCodegenExec => w }.size,
      "global_windows" -> plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.size))
  }
}
