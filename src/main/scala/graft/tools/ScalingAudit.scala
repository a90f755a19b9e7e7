package graft.tools

import org.apache.spark.sql.SparkSession

/** The SCALING AUDIT (r10 VERDICT item 1): measure — not argue — how the
  * headline scale operators grow from sf0.1 to a 10× self-generated sf1
  * ([[ScaleGen]]), and commit the growth-ratio table.
  *
  * `runMain graft.tools.ScalingAudit <smallDir> <bigDir> <outJson>`
  *
  * Protocol per (query, dir): one untimed warmup (JVM/codegen/footer
  * cache + any per-(dir, JVM) IndexStore asset build — the build is a
  * one-time cost by design, and excluding it at BOTH scales keeps the
  * ratio an apples-to-apples measure of the query's own plan), then two
  * timed full-materialization runs (noop sink, the Bench contract),
  * min of two. Ratio = big/small. A ratio near the data ratio (10×) is
  * LINEAR; well under it means fixed costs still dominate at this size;
  * well over it is a super-linear red flag the audit exists to catch. */
object ScalingAudit {
  /** The headline scale surface: one representative per mechanism the
    * repo's 100-TB story leans on (SURVEY §2 families + the VERDICT's
    * named claims). Kept to pure registry entries so the driver gate
    * already proves their correctness at both scales' law.
    *
    * r12 (VERDICT item 3): widened from 25 to every bench entry over
    * ~2 s at sf0.1 plus the remaining named families (PQ/SQ/MaxSim,
    * MMR, item-CF, HITS/PPR/label-prop, motif, prefix-join, span dedup,
    * profile variants, k-means, the bounded streams) — the r11 audit
    * found 3 super-linear bugs in 25 operators, so the slow tail is
    * exactly where more fixed parameters would hide. */
  val AuditQueries: Seq[String] = Seq(
    // scan / aggregate / join fundamentals
    "q1_agg", "q_group_mean", "q_count_distinct", "q_star_join",
    "q_top10_orders",
    // banded-rank family + the custom distributed-window operator
    "q_fact_rank", "q_fact_rank_dist", "q_fact_runagg_dist",
    "q_fact_rolling_dist", "q_fact_cumsum_dist", "q_forward_fill_dist",
    "q_fact_fullframe_dist", "q_weighted_median", "q_mad",
    // warehouse loads (incremental prune, SCD2 merge)
    "q_hwm_incremental", "q_scd2_merge",
    // LSH dedup chain over documents
    "q_dedup_exact", "q_minhash_bucket", "q_minhash_pairs", "q_simhash",
    "q_minhash_recall", "q_prefix_join", "q_span_dedup",
    // embeddings / ANN / clustering
    "q_embed_ivf", "q_embed_ann", "q_embed_ann_mp", "q_pq_ann",
    "q_scalar_quant", "q_maxsim", "q_mmr_rerank", "q_kmeans",
    // iterative graph over the events-derived edge asset
    "q_pagerank", "q_kcore", "q_hits", "q_ppr", "q_label_prop",
    "q_components", "q_bfs_levels", "q_item_cf", "q_basket_rules",
    "q_journey_sim",
    // sketches / AQP / profiling
    "q_kmv_distinct", "q_cms_freq", "q_bloom_join", "q_profile",
    "q_profile_approx",
    // text analysis / time series
    "q_token_count", "q_tfidf_cosine", "q_motif",
    // bounded streams (a 10x-longer stream must not grow state:
    // Append + watermark evicts per window)
    "q_stream_tumbling", "q_stream_kmv", "q_stream_interval_join",
    "q_stream_outer_join", "q_stream_full_outer")

  def main(args: Array[String]): Unit = {
    val (smallDir, bigDir, outJson) = (args(0), args(1), args(2))
    // optional 4th arg: comma list selecting the audit set — any registry
    // name, not just AuditQueries (re-measuring a fix, or a query whose
    // shape changed after the headline list was written, without paying
    // for the full sweep)
    val selected: Seq[String] = if (args.length > 3) {
      val asked = args(3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val unknown = asked.filterNot(graft.SparkEntry.queries.contains)
      require(unknown.isEmpty, s"not in the registry: ${unknown.mkString(", ")}")
      asked
    } else AuditQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // back-to-back timed runs in ONE JVM leave each run's shuffle
      // files on disk until the ContextCleaner's periodic GC fires —
      // default every 30 min, longer than a whole audit, so a
      // shuffle-heavy query's files ACCUMULATE across warmup+2 runs ×
      // 2 dirs and can fill the disk (r14: q_label_prop at a 3×
      // gen-sf30 lineitem died on ENOSPC with 75 GB free at run start).
      // A 2-minute cadence caps live shuffle debris at ~one run's worth.
      .config("spark.cleaner.periodicGC.interval", "120s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.tune(spark)

    // shuffle-write bytes per timed run — the linearity witness that
    // separates PLAN growth from execution-environment residue (GC,
    // fixed-partition spill): a query whose bytes scale with the data
    // ratio while its wall-clock scales faster has a linear plan under
    // memory-system pressure, not a super-linear algorithm
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def runOnce(name: String, dir: String): (Double, Long) = {
      // listenerBus is private[spark]; a short settle pause lets the
      // async stage-completed events drain — MB-scale precision is all
      // the linearity witness needs
      Thread.sleep(1500)
      val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500)
      (secs, shuffleBytes.get() - b0)
    }
    def measure(name: String, dir: String): (Double, Long) = {
      runOnce(name, dir) // warmup + IndexStore build for this (dir, JVM)
      // report the FASTER run's own (time, bytes) tuple, so each JSON row
      // reflects one real execution — an independent min over each field
      // could pair run 1's wall-clock with run 2's shuffle volume when
      // AQE or partial caching makes them differ (r13 ADVICE)
      val (t1, b1) = runOnce(name, dir); val (t2, b2) = runOnce(name, dir)
      if (t1 <= t2) (t1, b1) else (t2, b2)
    }

    def has(dir: String, t: String) =
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"$t.parquet"))
    // per-table rows AND bytes for every table present in BOTH dirs: the
    // r13 adjudication showed rows alone mis-denominate text operators
    // (ScaleGen's token cipher inflates documents ~24.7% chars/row per
    // replica decade), and the correction was applied by hand in
    // BENCH_NOTES — the artifact now carries both denominators itself
    // (r13 VERDICT item 6). Bytes = on-disk parquet size (footer-free
    // walk); rows = a metadata-only count job.
    val tableStats: Seq[(String, (Long, Long, Long, Long))] =
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .filter(t => has(smallDir, t) && has(bigDir, t))
        .map { t =>
          def bytes(dir: String): Long = {
            val root = java.nio.file.Paths.get(dir, s"$t.parquet")
            val s = java.nio.file.Files.walk(root)
            try s.filter(java.nio.file.Files.isRegularFile(_))
              .mapToLong(java.nio.file.Files.size(_)).sum()
            finally s.close()
          }
          def rows(dir: String): Long =
            spark.read.parquet(s"$dir/$t.parquet").count()
          t -> (rows(smallDir), rows(bigDir), bytes(smallDir), bytes(bigDir))
        }
    require(tableStats.nonEmpty,
      s"no table present in BOTH $smallDir and $bigDir — the data ratio " +
        "needs one shared table")

    // headline data ratio from lineitem when both dirs carry it; a
    // tables-subset ScaleGen output (e.g. a documents-only wider replica
    // for a single adjudication) falls back to documents
    val ratioTable =
      if (tableStats.exists(_._1 == "lineitem")) "lineitem" else "documents"
    val dataRatio = tableStats.find(_._1 == ratioTable).map {
      case (_, (sr, br, _, _)) => br.toDouble / sr
    }.getOrElse {
      val (_, (sr, br, _, _)) = tableStats.head; br.toDouble / sr
    }

    val rows = selected.map { q =>
      try {
        val (small, sBytes) = measure(q, smallDir)
        val (big, bBytes) = measure(q, bigDir)
        val ratio = big / small
        val byteRatio =
          if (sBytes > 0) f"${bBytes.toDouble / sBytes}%.2f" else "null"
        println(f"[scaling] $q%-22s small=$small%7.2fs big=$big%7.2fs " +
          f"ratio=$ratio%5.2fx shuffleMB=${sBytes / 1e6}%.1f/${bBytes / 1e6}%.1f")
        (q, Right((small, big, ratio, sBytes, bBytes, byteRatio)))
      } catch { case e: Throwable =>
        // one broken query must not void the whole audit run
        println(s"[scaling] $q FAILED: ${e.getMessage}")
        (q, Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)))
      }
    }

    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qs = rows.map {
      case (q, Right((s, b, r, sB, bB, bR))) =>
        jstr(q) + s""":{"small_s":${f"$s%.3f"},"big_s":${f"$b%.3f"},"ratio":${f"$r%.2f"},""" +
          s""""small_shuffle_b":$sB,"big_shuffle_b":$bB,"shuffle_ratio":$bR}"""
      case (q, Left(err)) => jstr(q) + s""":{"err":${jstr(err)}}"""
    }.mkString("{", ",", "}")
    val tbl = tableStats.map { case (t, (sr, br, sb, bb)) =>
      jstr(t) + s""":{"small_rows":$sr,"big_rows":$br,""" +
        s""""rows_ratio":${f"${br.toDouble / sr}%.2f"},""" +
        s""""small_bytes":$sb,"big_bytes":$bb,""" +
        s""""bytes_ratio":${f"${bb.toDouble / sb}%.2f"}}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"small":${jstr(smallDir)},"big":${jstr(bigDir)},""" +
      s""""data_ratio":${f"$dataRatio%.2f"},"cpus":$cpus,""" +
      s""""tables":$tbl,"queries":$qs}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      line + "\n")
    println(s"[scaling] wrote $outJson")
    spark.stop()
  }
}
