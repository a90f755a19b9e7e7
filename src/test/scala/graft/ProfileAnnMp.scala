package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-bench for BENCH_NOTES (r12 VERDICT item 2): prices the three
  * q_embed_ann_mp formulations by wall time AND total shuffle-write bytes
  * (the quantity the verdict asked to compare):
  *
  *   window-r12    payload probe join, rn=1 window  — pair volume crosses
  *                 a second exchange to be ranked
  *   maxby-r13     payload probe join, partial-agg max_by — pair volume
  *                 collapses map-side; the production shape
  *   metadata-probe  explode only (vec_id, probe) keys, join, then fetch
  *                 BOTH payloads per surviving pair — the in-scaladoc
  *                 candidate design; scoring needs both payloads per PAIR,
  *                 so the fetch moves payloads pair-volume times
  *
  * All three must return identical rows (asserted via xxhash64 checksum).
  * Run: Test/runMain graft.ProfileAnnMp [sfDir]
  */
object ProfileAnnMp {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, "annmp-bench")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    val emb = graft.core.Tables.embeddings(spark, dir)
    val n = emb.count()
    // the PRODUCTION plane count — an inline copy here would silently
    // measure a different count if numPlanes' constants change (review
    // finding)
    val np = graft.queries.Embeddings.numPlanes(n)
    val nFlips = math.min(4, np)
    println(s"PROFILE n=$n planes=$np flips=$nFlips dir=$dir")

    val base = graft.queries.Embeddings.annMpEmb(spark, dir, np, nFlips)

    def pairsPayload: DataFrame =
      graft.queries.Embeddings.annMpPairs(spark, dir, np, nFlips)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("nn_id"))
    val windowR12 = pairsPayload
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("nn_id"), col("cos_sim"))

    val maxbyR13 = graft.queries.Embeddings.annMpBest(pairsPayload)

    val metadataProbe: DataFrame = {
      val lk = base.select(col("vec_id"), explode(col("probes")).as("probe"))
      val rk = base.select(col("bucket").as("probe"), col("vec_id").as("nn_id"))
      val pairsMeta = lk.join(rk, Seq("probe"))
        .filter(col("vec_id") =!= col("nn_id"))
        .select(col("vec_id"), col("nn_id"))
      val qp = base.select(col("vec_id"), col("embedding"), col("norm"))
      val cp = base.select(col("vec_id").as("nn_id"),
        col("embedding").as("emb2"), col("norm").as("norm2"))
      val scored = pairsMeta.join(qp, Seq("vec_id")).join(cp, Seq("nn_id"))
        .withColumn("cos_sim", round(
          expr("float_dot(embedding, emb2)") / (col("norm") * col("norm2")), 4))
      graft.queries.Embeddings.annMpBest(scored)
    }

    def checksum(df: DataFrame): Long = df
      .agg(sum(xxhash64(col("vec_id"), col("nn_id"),
        col("cos_sim").cast("string")))).head().getLong(0)

    def run(tag: String)(df: DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save() // warm
      val times = (1 to 2).map { _ =>
        shuffleBytes = 0L
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // listener bus drain
        (dt, shuffleBytes)
      }
      val best = times.minBy(_._1)
      println(f"VARIANT $tag%-16s ${best._1}%6.2f s   shuffle-write " +
        f"${times.map(_._2).max / 1048576.0}%8.2f MiB")
      checksum(df)
    }

    val h1 = run("window-r12")(windowR12)
    val h2 = run("maxby-r13")(maxbyR13)
    val h3 = run("metadata-probe")(metadataProbe)
    assert(h1 == h2 && h2 == h3,
      s"variant outputs diverge: window=$h1 maxby=$h2 metadata=$h3")
    println(s"CHECKSUM all equal: $h1")
    spark.stop()
  }
}
