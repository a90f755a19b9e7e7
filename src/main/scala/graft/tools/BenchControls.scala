package graft.tools

import org.apache.spark.sql.SparkSession

/** BENCH CONTROLS — the box-state instrument (r13 VERDICT item 4).
  *
  * `runMain graft.tools.BenchControls <sfDir> <outJson> [prevBenchJson]`
  *
  * The r13 sweep rose +15% round-over-round and cost a full forensic
  * investigation to adjudicate as ENVIRONMENTAL (page cache churned by
  * ~100 GB of generator traffic). This tool makes that adjudication a
  * committed artifact instead of a hunt:
  *
  *  1. PRE-TOUCH (the quiesce step): stream every byte of `<sfDir>`'s
  *     parquet through the page cache before anything is timed, so a
  *     cold or churned cache cannot masquerade as a code regression in
  *     the sweep that follows;
  *  2. run the TEN canonical scan-bound controls — stable queries whose
  *     code hasn't changed in rounds, covering scan, aggregate,
  *     broadcast join, sort/limit, set-op and scalar families — one
  *     untimed warmup + three timed runs each, min;
  *  3. when the PREVIOUS round's BENCH_FULL json is supplied, emit each
  *     control's round-over-round ratio and the MEDIAN ratio. A median
  *     far from 1.0 on untouched code is a box-state shift, detected
  *     mechanically — the sweep total is then read relative to it.
  *
  * Run this immediately BEFORE the full bench sweep (closeout step
  * order) so the sweep inherits the pre-touched cache. */
object BenchControls {
  /** Ten untouched scan-bound controls — the r13 adjudication set, made
    * canonical. Code-stable since r8 or earlier; none executes a
    * distributed-window, LSH, graph or iterative operator. */
  val Controls: Seq[String] = Seq(
    "q1_agg", "q_top10_orders", "q_star_join", "q_group_mean",
    "q_count_distinct", "q_filter_project", "q_null_filter",
    "q_union_distinct", "q_date_safe", "q_token_count")

  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: BenchControls <sfDir> <outJson> [prevBenchJson]")
    val (sfDir, outJson) = (args(0), args(1))
    val prev: Map[String, Double] = if (args.length > 2) {
      // the previous BENCH_FULL line: {"queries":{"name":sec,...},...} —
      // extract just the controls with a targeted scan, no JSON library
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args(2))), java.nio.charset.StandardCharsets.UTF_8)
      Controls.flatMap { c =>
        val re = ("\"" + java.util.regex.Pattern.quote(c) +
          "\":([0-9.Ee+-]+)").r
        re.findFirstMatchIn(txt).map(m => c -> m.group(1).toDouble)
      }.toMap
    } else Map.empty

    val missing = Controls.filterNot(graft.SparkEntry.queries.contains)
    require(missing.isEmpty, s"controls not in registry: $missing")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.tune(spark)

    // ---- 1. pre-touch: every byte of the SF dir through the page cache
    val t0 = System.nanoTime()
    var touched = 0L
    val root = java.nio.file.Paths.get(sfDir)
    val files = java.nio.file.Files.walk(root)
    try {
      val it = files.filter(java.nio.file.Files.isRegularFile(_)).iterator()
      val buf = new Array[Byte](1 << 20)
      while (it.hasNext) {
        val in = java.nio.file.Files.newInputStream(it.next())
        try {
          var n = in.read(buf)
          while (n >= 0) { touched += n; n = in.read(buf) }
        } finally in.close()
      }
    } finally files.close()
    println(f"[controls] pre-touched ${touched / 1e6}%.0f MB of $sfDir " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // ---- 2. controls: warmup + min of 3
    def runOnce(name: String): Double = {
      val t = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t) / 1e9
    }
    val rows = Controls.map { c =>
      runOnce(c)
      val sec = Seq(runOnce(c), runOnce(c), runOnce(c)).min
      val ratio = prev.get(c).map(p => sec / p)
      println(f"[controls] $c%-18s ${sec}%6.3f s" +
        ratio.fold("")(r => f"  (x$r%.3f vs prev round)"))
      (c, sec, ratio)
    }

    // ---- 3. artifact
    val ratios = rows.flatMap(_._3).sorted
    val median = if (ratios.isEmpty) None
      else Some(ratios(ratios.size / 2))
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    val qs = rows.map { case (c, sec, ratio) =>
      jstr(c) + s""":{"sec":${f"$sec%.3f"}""" +
        prev.get(c).fold("")(p => s""","prev_sec":${f"$p%.3f"}""") +
        ratio.fold("")(r => s""","ratio":${f"$r%.3f"}""") + "}"
    }.mkString("{", ",", "}")
    val line = s"""{"sf":${jstr(sfDir)},"pretouched_bytes":$touched,""" +
      s""""controls":$qs""" +
      median.fold("")(m => s""","median_ratio":${f"$m%.3f"}""") + "}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      line + "\n")
    println(s"[controls] wrote $outJson" +
      median.fold("")(m => f" (median ratio $m%.3f)"))
    spark.stop()
  }
}
