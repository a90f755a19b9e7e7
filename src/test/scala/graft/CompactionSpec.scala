package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sinks

/** Small-file compaction: a fragmented append table collapses to the
  * computed file count with identical contents, through the crash-safe
  * swap. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-compact-test")

  test("compact collapses a fragmented table without changing its rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // 32 micro-appends — the streaming/incremental fragmentation pattern
    val df = spark.range(10000).select($"id", md5($"id".cast("string")).as("h"))
    df.repartition(32).write.parquet(dir)
    val expected = df.orderBy($"id").collect().toSeq

    val stats = Sinks.compact(spark, dir, targetFileBytes = 512L * 1024)
    assert(stats.filesBefore === 32L)
    assert(stats.filesAfter < stats.filesBefore,
      s"expected fewer files, got $stats")
    // contents unchanged, table still readable through the normal path
    val after = Sinks.readParquet(spark, dir).orderBy($"id").collect().toSeq
    assert(after === expected)
  }

  test("compact to a single file when under the target size") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact1").toString + "/t"
    spark.range(100).toDF("id").repartition(16).write.parquet(dir)
    val stats = Sinks.compact(spark, dir) // default 128 MiB target
    assert(stats.filesAfter === 1L, s"tiny table should become 1 file: $stats")
    assert(Sinks.readParquet(spark, dir).count() === 100L)
  }
}
