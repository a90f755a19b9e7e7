package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev measurement tool (guide §1): run one query N times and print every
  * Spark JOB's wall-clock, description and gap-to-previous-job, so the
  * serial driver fraction between jobs (planning, codegen, collects,
  * chain assembly) is separated from genuinely parallel task time. Not
  * part of the driver contract.
  *
  * Usage: runMain graft.tools.JobBreakdown <sfDir> <query> [reps] [cpus]
  */
object JobBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val query = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.tune(spark)

    case class Job(id: Int, desc: String, start: Long, var end: Long)
    val jobs = new scala.collection.mutable.ArrayBuffer[Job]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += Job(j.jobId,
            Option(j.properties.getProperty("spark.job.description"))
              .getOrElse(""), j.time, -1L)
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == j.jobId).foreach(_.end = j.time)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (r <- 1 to reps) {
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain (dev tool)
      println(f"%n== rep $r: $query wall=$wall%.3f s")
      jobs.synchronized {
        var prevEnd = -1L
        jobs.sortBy(_.start).foreach { j =>
          val dur = (j.end - j.start) / 1e3
          val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
          prevEnd = math.max(prevEnd, j.end)
          println(f"  job ${j.id}%3d dur=$dur%7.3f s gap-before=$gap%7.3f s ${j.desc.take(80)}")
        }
        val jobSum = jobs.map(j => (j.end - j.start) / 1e3).sum
        println(f"  sum(job dur)=$jobSum%.3f s; outside-jobs=${wall - jobSum}%.3f s (planning/codegen/driver)")
      }
    }
    spark.stop()
  }
}
