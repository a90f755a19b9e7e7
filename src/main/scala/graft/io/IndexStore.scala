package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once-read-many store for derived index tables (LSH buckets,
  * shingle posting lists, signature tables). At 100 TB an index is built by
  * ONE upstream corpus pass per snapshot and consumed by every downstream
  * query; re-deriving the derivation subtree inside each consumer
  * multiplies the most expensive scan in the pipeline by the number of
  * consumers. Each table is written exactly once per (corpus dir, table)
  * per JVM via the crash-safe [[Sinks.overwriteSwap]] and read back, so
  * consumer plans contain parquet scans of the stored index, not the
  * derivation. (Moved out of TextDedup in round 3 so the corpus-quality
  * pipeline shares it.) */
object IndexStore {
  private val built = scala.collection.mutable.HashSet.empty[String]

  /** Root is PID-scoped so concurrent JVMs over the same corpus (same
    * java.io.tmpdir) never swap/read the same directory, and a shutdown
    * hook removes the whole root so indexes don't accumulate across runs.
    * (A real deployment would instead write to a shared warehouse path
    * keyed by corpus-snapshot id, built by one upstream job.) */
  private val root: String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_lsh_index_${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(f)))
    f.getAbsolutePath
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  def materialized(s: SparkSession, dir: String, what: String)
      (build: => DataFrame): DataFrame = synchronized {
    // "ix_" prefix: a leading "_" would make the directory invisible to
    // Spark's file index (hidden-path convention), silently reading empty.
    // The md5 suffix disambiguates dirs the readable sanitization would
    // collide ("/d/sf-1" vs "/d/sf_1"). Index lifetime: per (corpus dir,
    // JVM) — a corpus snapshot is immutable for a run; a long-lived
    // service that rewrites the corpus in place would key on a snapshot
    // id instead.
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val key = "ix_" + dir.replaceAll("[^A-Za-z0-9.]", "_") +
      "_" + dirHash + "__" + what
    val path = s"$root/$key"
    if (!built.contains(key)) { // rebuilt once per JVM: never stale
      Sinks.overwriteSwap(build, path)
      built += key
    }
    s.read.parquet(path)
  }
}
