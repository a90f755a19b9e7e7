package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for selected queries (all, if no
  * args) so plan shape — PushedFilters, ReadSchema, broadcast vs shuffle
  * joins, WholeStageCodegen spans, exchange reuse — can be audited against
  * each operator's documented scale design. Not part of the driver
  * contract. Usage: runMain graft.PlanAudit [sfDir] [query ...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Sessions.tune(spark)
    names.foreach { n =>
      println(s"\n=== $n ===")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
