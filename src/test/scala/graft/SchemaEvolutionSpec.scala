package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sinks

/** Schema evolution on the append path: a fact table gains a column
  * WITHOUT rewriting history — new appends carry the new column, old files
  * stay as written, and a mergeSchema read reconciles them (old rows null
  * for the new column). The everyday warehouse migration that must not
  * require an O(history) rewrite at 100 TB. */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-evo-test")

  test("appended column is readable across old and new files via mergeSchema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evo").toString + "/fact"
    // epoch 1: (id, amount)
    Sinks.appendParquet(
      spark.range(0, 100).select($"id", ($"id" * 2).as("amount")), dir)
    // epoch 2 adds a channel column — no rewrite of epoch 1
    Sinks.appendParquet(
      spark.range(100, 150)
        .select($"id", ($"id" * 2).as("amount"), lit("web").as("channel")), dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("amount", "channel", "id"))
    assert(merged.count() == 150)
    // old rows surface the new column as null; new rows carry it
    assert(merged.filter($"id" < 100 && $"channel".isNull).count() == 100)
    assert(merged.filter($"id" >= 100 && $"channel" === "web").count() == 50)
    // aggregates over the union'd schema behave (null-safe)
    val byChannel = merged.groupBy(coalesce($"channel", lit("legacy")).as("ch"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byChannel == Map("legacy" -> 100L, "web" -> 50L))
  }

  test("a projection that avoids the new column still reads old files untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evo2").toString + "/fact"
    Sinks.appendParquet(spark.range(0, 10).select($"id"), dir)
    Sinks.appendParquet(
      spark.range(10, 20).select($"id", lit(1).as("extra")), dir)
    // reading WITHOUT mergeSchema and selecting only the stable column is
    // the cheap path (no footer reconciliation) and must stay valid
    val ids = spark.read.parquet(dir).select($"id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 20L))
  }
}
