package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sinks for the warehouse write path.
  *
  * The reference persists three ways (SURVEY §2.1 S3/S4): staging tables are
  * full-replaced each run (`to_sql(if_exists="replace")`,
  * /root/reference/02_Extract_and_transform_raw_data/ET_combined.py:137,253,401),
  * log tables are append-only (A2_hr_etl.py:98,119), facts are append-only
  * with anti-join dedup. Under pure Parquet (no Delta/Iceberg jars in this
  * build) "replace" needs care: Spark cannot overwrite a directory that one
  * of its own running plans is reading, and a crashed overwrite must not
  * leave a half-written table. Hence [[overwriteSwap]]: write the new state
  * to a temp dir next to the target, then swap via rename — readers either
  * see the old complete state or the new complete state.
  *
  * Scale: all writes go through the normal distributed Parquet committer;
  * the swap itself is two driver-side namespace ops (O(1) on HDFS-like
  * stores; on object stores a real deployment would swap a catalog pointer
  * instead — this is the single place to change that).
  */
object Sinks {

  /** Append-only sink (audit/DQ logs, incremental facts). */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Full-replace sink with temp-dir-and-swap semantics (staging tables,
    * SCD2 dimension rewrite). Safe to call when `df` reads from `path`
    * itself (the SCD2 rewrite case): the plan materializes entirely into the
    * temp dir before the target is touched. */
  def overwriteSwap(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = fs.makeQualified(new Path(path))
    val tmp = new Path(target.getParent, target.getName + ".__swap_tmp")
    val old = new Path(target.getParent, target.getName + ".__swap_old")
    fs.delete(tmp, true)
    // Crash recovery: a prior run killed between the two renames below left
    // the target absent with the previous state only in .__swap_old. Restore
    // it (rename old -> target) rather than deleting the sole surviving copy
    // — essential when `df`'s plan reads from `target` itself (SCD2
    // self-rewrite), which would otherwise fail on a missing table with the
    // backup already destroyed. Only discard .__swap_old when the target
    // exists (then .old is a stale leftover from a completed swap).
    if (!fs.exists(target) && fs.exists(old)) {
      if (!fs.rename(old, target))
        throw new java.io.IOException(
          s"overwriteSwap: found interrupted swap but cannot restore $old -> $target")
    } else {
      fs.delete(old, true)
    }
    df.write.mode("overwrite").parquet(tmp.toString)
    // Swap: current -> .old, tmp -> current, drop .old. The window between
    // the two renames (driver killed mid-swap) leaves the table absent with
    // the previous state intact in .__swap_old — recoverable by a rename,
    // never a half-written mix. A transactional catalog pointer (the
    // documented object-store deployment) closes even that window.
    val hadTarget = fs.exists(target)
    if (hadTarget && !fs.rename(target, old))
      throw new java.io.IOException(s"overwriteSwap: cannot move $target aside")
    if (!fs.rename(tmp, target)) {
      if (!hadTarget) // first-time write: nothing to roll back
        throw new java.io.IOException(
          s"overwriteSwap: cannot promote $tmp (new data remains there)")
      if (!fs.rename(old, target)) // roll back
        throw new java.io.IOException(
          s"overwriteSwap: promote of $tmp failed AND rollback failed — " +
            s"previous state preserved at $old, manual rename required")
      throw new java.io.IOException(s"overwriteSwap: cannot promote $tmp")
    }
    fs.delete(old, true)
  }

  /** Read a table previously written by either sink. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JDBC sink — reference parity for the Postgres write path
    * (`to_sql(..., if_exists="replace")`,
    * /root/reference/02_Extract_and_transform_raw_data/ET_combined.py:137,253,401
    * — psycopg2 there, `DataFrameWriter.jdbc` here). Parquet stays the
    * default warehouse format (SURVEY §2 S3 sanctions the substitution;
    * the harness is parquet-native); this closes the cosmetic gap for a
    * user pointing the library at a live database.
    *
    * `mode=Overwrite` reproduces if_exists="replace" (drop+recreate),
    * `Append` the log-table if_exists="append". Scale note: every
    * executor opens its own connection and writes its partitions
    * batched (`batchsize`, default 1000) — repartition down before
    * calling if the target DB can't take cluster-width parallel
    * writers; `numPartitions` here caps it at 8 connections by default
    * for exactly that reason. */
  def jdbc(df: DataFrame, url: String, table: String,
           mode: String = "overwrite",
           options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      // options first, explicit arguments last: a stray "url"/"dbtable"
      // in a copied options map must not silently redirect the write
      // away from the named target (review finding)
      .options(Map("numPartitions" -> "8") ++ options)
      .option("url", url)
      .option("dbtable", table)
      .mode(mode)
      .save()

  /** Read a table written by [[jdbc]] (or any JDBC-visible table). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Compaction outcome: file/byte counts before and after. */
  final case class CompactStats(filesBefore: Long, filesAfter: Long, bytes: Long)

  /** Small-file compaction for an append-heavy table: rewrite `path` into
    * ⌈bytes/targetFileBytes⌉ uniformly-sized files. The append sinks
    * (streaming foreachBatch micro-batches, incremental loads) produce one
    * file per task per batch; at 100 TB that is millions of KB-sized files,
    * and scan cost becomes file-open latency instead of I/O. Compaction is
    * the standing maintenance pass every such table needs.
    *
    * Round-robin `repartition(n)` (one shuffle) rather than `coalesce(n)`:
    * coalesce merges whole input partitions and inherits their skew, so one
    * output file can end up with most of the bytes — uniform file sizes are
    * the point of compacting. The rewrite goes through [[overwriteSwap]],
    * so concurrent READERS see the old complete state or the new one, and
    * a crash never mixes them. Concurrent WRITERS are the caller's
    * contract: a file appended between this function's scan and its swap
    * is not in the rewrite and is lost with the swapped-out directory —
    * pure directory-of-parquet has no append/rewrite transaction to detect
    * it. Run compaction in the maintenance window of the table's ingest
    * cadence (pause appends, or compact only partitions past the active
    * write head — the usual shape, since hot partitions are recent ones);
    * a table format with optimistic transactions (Delta/Iceberg, not in
    * this build) is the lift that removes the constraint. At real scale
    * this runs per table-partition (each an independent job over its own
    * directory), bounded by the partition's size, not the table's. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): CompactStats = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(new Path(path), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith(".")) buf += st
      }
      buf.toSeq
    }
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    overwriteSwap(spark.read.parquet(path).repartition(nOut), path)
    CompactStats(before.size.toLong, dataFiles().size.toLong, bytes)
  }
}
