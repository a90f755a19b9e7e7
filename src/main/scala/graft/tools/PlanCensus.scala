package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
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
    // BNLJ self-policing (r13 VERDICT item 8): every BNLJ's build side
    // must be in one of the two mechanically proven categories
    // (buildProven), or carry a REVIEWED per-query justification below.
    // A new BNLJ outside all three is exactly the dangerous shape the
    // census previously couldn't distinguish — it fails the run. Stale
    // allowlist entries (query no longer unproven) also fail, so the
    // list cannot rot.
    val offenders = rows.filter(_._2("bnlj_unproven") > 0).map(_._1).toSet
    val unreviewed = (offenders -- ReviewedBnlj.keySet).toSeq.sorted
    if (unreviewed.nonEmpty) {
      System.err.println(s"[census] UNPROVEN, UNREVIEWED BNLJ build " +
        s"sides in ${unreviewed.size} queries: ${unreviewed.mkString(", ")}" +
        " — each BroadcastNestedLoopJoin must broadcast a row-bound " +
        "(maxRows <= 4096) or literal-equality-keyed plan, or be added " +
        "to ReviewedBnlj with a bounded-by-construction justification")
      spark.stop()
      sys.exit(1)
    }
    val stale = (ReviewedBnlj.keySet -- offenders).toSeq.sorted
    if (stale.nonEmpty) {
      System.err.println("[census] STALE ReviewedBnlj entries (now " +
        s"mechanically proven or gone): ${stale.mkString(", ")} — remove them")
      spark.stop()
      sys.exit(1)
    }
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

  /** BNLJs whose build side is bounded BY CONSTRUCTION but not provable
    * from static maxRows or a literal-keyed filter — each reviewed in
    * r14 against its source. Adding here requires naming the bound. */
  private val ReviewedBnlj: Map[String, String] = Map(
    "q_ab_test" -> "2-arm grouped aggregate (treatment flag) broadcast back",
    "q_active_users" -> "O(days) daily-count aggregate joined to the 30-row report grid",
    "q_active_users_kmv" -> "O(days) daily KMV sketch rows range-joined to the 30-row report",
    "q_embed_ivf2" -> "k<=64 ranked-centroid rows fanned out to the query",
    "q_js_divergence" -> "2-source grouped token-mass aggregates (one row per source)",
    "q_kendall_tau" -> "nested scalar joins over the <=1770-pair dim-bounded self-join",
    "q_motif" -> "rank-filtered window over the O(days) series (top-k motif seeds)",
    "q_sliding_quantiles" -> "O(days) per-day quantile rows self-joined over a +/-3-day band",
    "q_t_closeness" -> "class x band grid (<= m*k rows, both dim-bounded) broadcast",
    "q_tfidf_cosine" -> "O(vocab-sample) idf rows + query-doc tf vector broadcast",
    "q_theil_sen" -> "O(days^2 <= 1770) slope pairs from the dim-bounded day series")

  private case class Census(m: Map[String, Int]) {
    def apply(k: String): Int = m(k)
    override def toString: String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ", ", "}")
  }

  /** BNLJ build-side boundedness proof, two accepted categories:
    *  - ROW-BOUND: a logical maxRows ≤ 4096 somewhere down the build
    *    chain (Limit, ungrouped Aggregate, bounded LocalRelation) —
    *    walks THROUGH ReusedExchangeExec, which is a leaf wrapping the
    *    original exchange (where most scalar broadcasts hide on their
    *    second use);
    *  - KEYED FILTER: the build subtree filters on an equality against
    *    a foldable literal (the query-vector / keyed-selector idiom,
    *    e.g. `vec_id = 0` — bounded by the key's multiplicity). Not a
    *    hard row proof, but a named, reviewable shape; everything
    *    OUTSIDE both categories fails the census. */
  private def buildProven(j: BroadcastNestedLoopJoinExec): Boolean = {
    val build = j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }
    def bound(p: SparkPlan): Option[Long] = p match {
      case r: ReusedExchangeExec => bound(r.child)
      case _ => p.logicalLink.flatMap(_.maxRows)
        .orElse(p.children.headOption.flatMap(bound))
    }
    def hasLiteralEq(e: Expression): Boolean = e match {
      case EqualTo(_, r) if r.foldable => true
      case EqualTo(l, _) if l.foldable => true
      case And(a, b) => hasLiteralEq(a) || hasLiteralEq(b)
      case _ => false
    }
    def keyedFilter(p: SparkPlan): Boolean = {
      val inner = p match { case r: ReusedExchangeExec => r.child; case x => x }
      inner.collectFirst {
        case f: FilterExec if hasLiteralEq(f.condition) => f
      }.isDefined
    }
    bound(build).exists(_ <= 4096L) || keyedFilter(build)
  }

  private def census(plan: SparkPlan): Census = {
    val scans = plan.collect { case s: FileSourceScanExec => s }
    val bnljs = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    Census(Map(
      "exchanges" -> plan.collect { case e: ShuffleExchangeExec => e }.size,
      "bhj" -> plan.collect { case j: BroadcastHashJoinExec => j }.size,
      "smj" -> plan.collect { case j: SortMergeJoinExec => j }.size,
      "cartesian" -> plan.collect { case j: CartesianProductExec => j }.size,
      "bnlj" -> bnljs.size,
      // build sides in NEITHER accepted category (r14): must be 0
      "bnlj_unproven" -> bnljs.count(j => !buildProven(j)),
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
