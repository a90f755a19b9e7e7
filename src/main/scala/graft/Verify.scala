package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // tune up front: with SPARK_GRAFT_ONLY selecting a query that never
    // touches Tables (the synthetic-media entries), nothing else applies
    // the session conf — ANSI mode would stay at the Spark 4 default and
    // the colstats hash sum throws on long overflow
    graft.core.Sessions.tune(spark)
    new java.io.File(outDir).mkdirs()
    // Persist the ten shared input tables once per run (r12 VERDICT item
    // 4b: the gate re-read the same parquet scans ~330 times, and gate
    // wall-clock grows with the registry). Spark's CacheManager rewrites
    // any later plan embedding the same canonicalized scan subtree to the
    // in-memory copy, so every registry query hits the cache with zero
    // code change — values are exact, only the plan's leaf changes. The
    // gate runs at sf0.01/sf0.1 where all ten tables fit comfortably;
    // this is harness-side only (Bench does NOT cache: it measures the
    // real scan cost).
    val cachedTables = graft.core.Tables.all.flatMap { t =>
      try {
        val df = if (t == "events") graft.core.Tables.events(spark, sfDir)
                 else graft.core.Tables.load(spark, sfDir, t)
        df.persist()
        df.count()
        Some(df)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] cache of $t skipped: ${e.getMessage}")
        None
      }
    }
    val colStats = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.selectedQueries
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // stats are a debug artifact — a stats failure (e.g. an exotic
        // column type xxhash64 rejects) must not read as a QUERY failure
        try colStats(name) = columnStats(spark, s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name colstats skipped: ${e.getMessage}")
        }
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Hash-debug artifact (round-6 verdict ask): when a driver-side hash
    // mismatch doesn't reproduce locally, this localizes it to a COLUMN
    // — per-column dtype, null count, min/max, and an order-independent
    // xxhash64 checksum of the written parquet.
    val statsJson = colStats
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/colstats.json"), statsJson)
    cachedTables.foreach(_.unpersist())
    spark.stop()
  }

  /** Per-column diagnostics over a just-written (small, coalesced) query
    * output: dtype, nulls, min/max as strings, and sum(xxhash64(col)) —
    * order-independent, so it isolates value divergence from row-order
    * divergence. Reads the parquet back, so it checks the bytes the
    * driver will hash, not the pre-write plan. */
  private def columnStats(spark: SparkSession, path: String): String = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(path)
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // min/max in the column's OWN type, cast to string only after the
    // aggregate — min(cast-to-string) would order "10" < "9"
    // lexicographically and point a divergence hunt at the wrong range
    // (review finding). Row count rides the same single aggregate job.
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(when(c.isNull, 1)).as(s"${f.name}::nulls"),
        min(c).cast("string").as(s"${f.name}::min"),
        max(c).cast("string").as(s"${f.name}::max"),
        sum(xxhash64(c)).as(s"${f.name}::xxh"))
    } :+ count(lit(1)).as("::rows")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(row.length - 1)
    val cols = df.schema.fields.zipWithIndex.map { case (f, i) =>
      val base = i * 4
      s"""${esc(f.name)}: {"dtype": ${esc(f.dataType.simpleString)}, """ +
        s""""nulls": ${row.getLong(base)}, """ +
        s""""min": ${Option(row.get(base + 1)).map(v => esc(v.toString)).getOrElse("null")}, """ +
        s""""max": ${Option(row.get(base + 2)).map(v => esc(v.toString)).getOrElse("null")}, """ +
        s""""xxh": ${Option(row.get(base + 3)).map(_.toString).getOrElse("null")}}"""
    }
    s"""{"rows": $n, "cols": {${cols.mkString(",")}}}"""
  }
}
