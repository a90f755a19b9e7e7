package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Diagnostic for the census BNLJ proof (r14): print each BNLJ build
  * side's physical chain with every node's logical link and maxRows —
  * what the PlanCensus bound-walk sees.
  * `runMain graft.tools.ScratchBnlj <sfDir> <query>[,query...]` */
object ScratchBnlj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Sessions.tune(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    args(1).split(",").foreach { q =>
      println(s"==== $q")
      val plan = graft.SparkEntry.queries(q)(spark, args(0))
        .queryExecution.executedPlan
      plan.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        def walk(p: SparkPlan, d: Int): Unit = {
          println(("  " * d) + p.getClass.getSimpleName + " link=" +
            p.logicalLink.map(l => l.getClass.getSimpleName +
              " maxRows=" + l.maxRows).getOrElse("none"))
          p.children.foreach(walk(_, d + 1))
        }
        walk(build, 1)
      }
    }
    spark.stop()
  }
}
