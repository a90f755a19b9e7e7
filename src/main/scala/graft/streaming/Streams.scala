package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming lift of the batch engine (SURVEY §2.10: the
  * reference is batch-only; this is the scale extension a continuously-fed
  * warehouse needs). The design rule that makes it cheap: every cleaning /
  * DQ operator in graft is a pure DataFrame → DataFrame function, so the
  * identical code runs inside a stream, either directly on the streaming
  * frame (stateless ops) or per micro-batch via foreachBatch (stateful
  * loads like SCD2 merge and the incremental fact append).
  *
  * Scale: state is keyed (user/window) so it shards across executors;
  * watermarks bound state size; the foreachBatch path reuses the batch
  * library's bucketed joins unchanged.
  */
object Streams {
  /** Input/state rows for [[userRunningCounts]] — top-level so Spark can
    * derive case-class Encoders. */
  final case class UserEvent(user_id: Long, value: Double)
  final case class UserState(n: Long, total: Double)

  /** Watermarked tumbling-window aggregation over the events shape
    * (ts, user_id, event_type, value): per-window per-type count + exact
    * decimal sum — the streaming twin of the q_group_mean aggregate. */
  def windowedEventStats(events: DataFrame,
                         window_ : String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Per-user running session state via mapGroupsWithState: event count and
    * last-seen timestamp per user — the custom-state surface
    * (KeyValueGroupedDataset) for sessionization-style operators. */
  def userRunningCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val updated = events.selectExpr("user_id", "value").as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val batch = rows.toSeq
          val next = UserState(prev.n + batch.size, prev.total + batch.map(_.value).sum)
          state.update(next)
          (user, next.n, next.total)
      }
    updated.toDF("user_id", "n_events", "total_value")
  }

  /** Streaming exact-dedup — the ingest-side twin of the batch
    * dedup-with-capture (A8) for continuously arriving documents/events:
    * duplicates by `keyCols` are dropped while their event-time is within
    * the watermark window; state for keys older than the watermark is
    * evicted, so memory stays bounded at any stream length. (Late
    * duplicates beyond the watermark fall through to the batch
    * anti-dedup at load time — same contract as
    * [[graft.warehouse.Incremental]]'s tail window.) */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           watermark: String, keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.toSeq)

  /** Stream-stream interval join (the attribution shape): each left event
    * joined to right events of the same user within `within` AFTER it.
    * Both sides carry watermarks so the join state is evicted once the
    * interval can no longer match — bounded memory at any stream length;
    * state shards by the join key. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   within: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_type").as("l_event")).withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_type").as("r_event")).withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + interval $within"))
      .select(col("l_user").as("user_id"), col("l_event"), col("r_event"),
        col("l_ts"), col("r_ts"))
  }

  /** foreachBatch bridge: run any batch-library stage (cleaning, DQ,
    * incremental fact append) against each micro-batch. Returns a started
    * query writing through `stage`. */
  def foreachBatchSink(stream: DataFrame, checkpoint: String)(
      stage: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch(stage)
      .start()
}
