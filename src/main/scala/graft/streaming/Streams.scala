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
    * derive case-class Encoders. Money is carried as exact cents so the
    * running total is independent of accumulation order (a Double sum
    * would drift with partitioning/batching and could never be gated
    * against a SQL oracle). */
  final case class UserEvent(user_id: Long, cents: Long)
  final case class UserState(n: Long, cents: Long)

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
    val updated = events
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, (Long, Long, Double)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var n = prev.n; var c = prev.cents
          rows.foreach { r => n += 1; c += r.cents }
          val next = UserState(n, c)
          state.update(next)
          (user, next.n, next.cents / 100.0)
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
                   watermark: String = "2 hours",
                   joinType: String = "inner"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("ts").as("l_ts"),
      col("event_type").as("l_event")).withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("event_type").as("r_event")).withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + interval $within"),
      joinType)
      // coalesce: under full_outer an unmatched RIGHT row carries a null
      // l_user; for inner/left_outer the coalesce is an identity
      .select(coalesce(col("l_user"), col("r_user")).as("user_id"),
        col("l_event"), col("r_event"), col("l_ts"), col("r_ts"))
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

  // ---------------------------------------------------------------------
  // Batch-equivalence correctness entries: the streaming operators above,
  // driven end-to-end over the events table as a bounded file-source
  // stream, with the SAME DuckDB oracle as their batch twins. This puts
  // the streaming path under the driver's correctness gate (r2 verdict
  // item 6) — a stream that processes a bounded input must produce exactly
  // the batch answer.
  // ---------------------------------------------------------------------

  /** Per-invocation scratch root, DELETED after the bounded run completes —
    * repeat invocations (verify reruns in one session) must not accumulate
    * checkpoints/output. AvailableNow runs need no checkpoint afterwards. */
  private def scratch(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_stream_run")

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Stateful micro-batch cost is dominated by per-partition fixed work —
    * every trigger opens/commits ONE state store per shuffle partition, so
    * at the session default (32) a 3-batch AvailableNow run pays ~96 store
    * lifecycles regardless of row volume. A stream's state partition count
    * is pinned at FIRST start (persisted in the checkpoint), so the gated
    * queries — fresh checkpoint each run — lower it for the duration of
    * `start()`: identical results (state sharding is invisible to
    * semantics), fewer fixed-cost units. At production volume the inverse
    * applies: size this UP so each store's delta fits memory. */
  private val StreamShufflePartitions = 8
  private def withStreamShuffle[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, StreamShufflePartitions.toString)
    try withStateStore(s)(body) finally s.conf.set(key, prev)
  }

  /** Opt-in RocksDB state store for the whole streaming family (r12
    * VERDICT item 7): the default HDFS-backed provider keeps every state
    * row on the executor HEAP — at production stream scale (interval-join
    * state ~ rows-in-watermark-span, dedup state ~ keys-in-span) the
    * state store, not the computation, is the binding constraint, and
    * RocksDB keeps state off-heap with spill-to-disk, bounded block-cache
    * memory, and changelog checkpointing. Set `spark.graft.streaming
    * .rocksdb=true` on the session BEFORE a query starts (a stream's
    * provider is pinned in its checkpoint at first start). Results are
    * provider-independent by contract — StreamsSpec pins gated-query
    * parity and provider engagement. Per-query state sizing (bytes/key ×
    * keys at the watermark span) is tabulated in BENCH_NOTES r13. */
  val RocksDbFlag = "spark.graft.streaming.rocksdb"
  private[graft] val RocksDbProviderClass =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private def withStateStore[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val want = java.lang.Boolean.parseBoolean(
      s.conf.get(RocksDbFlag, "false").trim)
    if (!want) body
    else {
      val prev = s.conf.getOption(key)
      s.conf.set(key, RocksDbProviderClass)
      try body
      finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  /** Sentinel event type appended by [[flushedEventsStream]]; its rows
    * exist only to advance the event-time watermark. */
  private[streaming] val FlushType = "__flush__"

  /** The events stream plus ONE far-future `__flush__` sentinel row,
    * staged through a scratch copy of the table (a single coalesced file,
    * so AvailableNow consumes everything in one batch and the sentinel
    * can never race ahead of real rows). Once the bounded input is
    * consumed, the sentinel holds the event-time watermark past every
    * REAL window's end, so an Append-mode windowed aggregate emits each
    * real window exactly once and EVICTS its state — the bounded-gate
    * stand-in for tomorrow's data arriving on a production stream, where
    * the next hour's events are what close the previous window and no
    * sentinel exists (r10 VERDICT item 1: Complete-mode retention grew
    * with stream history; Append + watermark is the unbounded-safe
    * shape). Returns the stream and the sentinel's timestamp; the
    * sentinel's own window never closes (watermark stops `delay` short of
    * it) and callers filter it out besides.
    *
    * The staged copy is SHARED: q_stream_tumbling and q_stream_kmv stage
    * the identical events+flush fixture, so paying the ~1.1 s write twice
    * per sweep was pure harness waste (r11 VERDICT item 7). The copy is
    * memoized per (dir, events-file mtime+size signature) for the JVM —
    * regenerated data invalidates by key — and the staging dirs are
    * removed by a shutdown hook instead of per call (bounded: one per
    * distinct input vintage per JVM; production streams stage nothing). */
  private val flushStageCache = scala.collection.mutable.HashMap
    .empty[(String, String), (String, java.sql.Timestamp)]
  /** Content signature of `$dir/events.parquet` — the shared dual-layout
    * helper (single file vs directory of part files) so a future layout
    * fix lands in ONE place for every memo (r12 ADVICE; review finding:
    * this was a byte-for-byte private copy of [[graft.core.Tables
    * .signature]]). */
  private def eventsSignature(dir: String): String =
    graft.core.Tables.signature(dir, "events")
  private def flushedEventsStream(s: SparkSession, dir: String)
      : (DataFrame, java.sql.Timestamp) = {
    graft.core.Sessions.tune(s)
    // check under the lock, stage OUTSIDE it, insert under the lock: the
    // staging write is a ~1 s Spark job, and holding the global lock
    // through it would serialize concurrent queries on unrelated dirs
    // behind it (r12 ADVICE — same fix as Embeddings.corpusSize). Two
    // racing stagers build duplicate fixtures; both are correct, the
    // loser's dir is reaped by its own shutdown hook.
    val key = (dir, eventsSignature(dir))
    val (path, flushTs) = flushStageCache.synchronized(flushStageCache.get(key))
      .getOrElse {
        val events = graft.core.Tables.events(s, dir)
        val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
        // max(ts) over an empty table is NULL — fail with the actual
        // problem instead of an NPE on .toInstant (r11 ADVICE)
        require(maxTs != null,
          s"events table at $dir is empty — no watermark to flush past")
        val fts = java.sql.Timestamp.from(
          maxTs.toInstant.plus(java.time.Duration.ofDays(3650)))
        val sentinel = events.limit(1).select(
          lit(-1L).as("event_id"), lit(fts).as("ts"), lit(-1L).as("user_id"),
          lit(FlushType).as("event_type"), lit(0.0).as("value"),
          lit(null).cast("string").as("props"))
        val staging = scratch()
        Runtime.getRuntime.addShutdownHook(
          new Thread(() => deleteRecursively(staging)))
        val p = staging.resolve("events").toString
        events.unionByName(sentinel).coalesce(1)
          .write.mode("overwrite").parquet(p)
        val entry = (p, fts)
        flushStageCache.synchronized(
          flushStageCache.getOrElseUpdate(key, entry))
      }
    val schema = s.read.parquet(path).schema
    (s.readStream.schema(schema).parquet(path), flushTs)
  }

  /** The events table as a bounded file-source STREAM, normalizing ts
    * exactly as [[graft.core.Tables.events]] does (nanos-as-long vintage →
    * integer-div truncate; µs-timestamp vintage → session-UTC cast) so
    * batch and stream see identical rows. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    // idempotent session tune (nanosAsLong etc.) — the stream entries must
    // not depend on a batch query having touched Tables.load first in the
    // same session (latent ordering bug caught by a subset Verify run)
    graft.core.Sessions.tune(s)
    val path = s"$dir/events.parquet"
    // two physical layouts exist: the driver testdata ships events.parquet
    // as a single FILE (the file source needs a directory base, so glob it
    // out of the dataset dir), while Spark-written datasets (ScaleGen)
    // make it a DIRECTORY of part files (stream the directory itself —
    // the r12 scaling audit caught the glob matching NOTHING there and
    // the stream silently processing zero rows). A source that would
    // match zero files FAILS LOUDLY here, with the layout named, BEFORE
    // the query starts — a bounded stream over nothing completes
    // instantly with an empty result, which reads as success (r12
    // VERDICT item 5: only the audit's absurd ~0.1× ratios exposed it).
    // The listing check runs before the schema read so even a
    // no-schema-to-infer empty directory gets this diagnostic, not a
    // generic inference error. The walk is RECURSIVE: a
    // partition-directory layout (p_year=…/part-*.parquet) is files the
    // directory stream reads, not a zero-file case.
    val p = java.nio.file.Paths.get(path)
    val isDirLayout = java.nio.file.Files.isDirectory(p)
    if (isDirLayout) {
      val st = java.nio.file.Files.walk(p)
      val nParts = // regular files only: the walk includes the root dir,
        // whose own name ends with ".parquet" in this layout
        try st.filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet")).count()
        finally st.close()
      require(nParts > 0,
        s"stream source would read ZERO files: $path is a directory " +
          "layout (Spark-written dataset) but contains no *.parquet " +
          "part files")
    } else require(java.nio.file.Files.isRegularFile(p),
      s"stream source would read ZERO files: $path is neither a " +
        "parquet file (driver-testdata layout) nor a directory of " +
        "part files (Spark-written layout)")
    val schema = s.read.parquet(path).schema
    val raw =
      if (isDirLayout) s.readStream.schema(schema).parquet(path)
      else s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Streaming twin of q_tumbling: [[windowedEventStats]] over the bounded
    * events stream in APPEND mode — a window emits ONCE when the
    * watermark passes its end and its state row is evicted, so state (and
    * per-batch output) is bounded by the watermark span at ANY stream
    * length, never by stream history (r10 VERDICT item 1: the previous
    * Complete-mode shape retained one state row per hour of history
    * forever and rewrote all of it every micro-batch). The bounded gate
    * closes the tail windows with [[flushedEventsStream]]'s sentinel;
    * production needs no sentinel — the next hour's data is the flush.
    * Memory sink is the harness-side collection; production appends
    * closed windows through [[foreachBatchSink]] — see [[qStreamDedup]]
    * for that path under the same gate. Oracle: the identical batch
    * tumbling SQL. StreamsSpec pins emit-once + state-drop per window. */
  def qStreamTumbling(s: SparkSession, dir: String): DataFrame = {
    // fixed sink name, dropped up front: repeat invocations replace the
    // previous run's memory table instead of accumulating one per call
    // (the sequential verify/bench harness has finished with the prior
    // result by then)
    val name = "graft_stream_tumbling"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val (ev, _) = flushedEventsStream(s, dir)
    val q = withStreamShuffle(s) {
      // NO sentinel filter inside the stream: a predicate on a grouping
      // column pushes below the aggregation AND the EventTimeWatermark
      // node, so it would drop the sentinel before the watermark tracker
      // ever sees it (measured: the last 3 real windows stayed open).
      // The sentinel's own window never closes, so it never reaches the
      // sink; the read-back filters defensively besides.
      windowedEventStats(ev)
        .writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name)
      // null-safe (events carries real NULL event_type groups the oracle
      // keeps; `=!=` would drop them with the sentinel)
      .filter(!(col("event_type") <=> lit(FlushType)))
      .orderBy(col("window_start"), col("event_type"))
  }

  private val qStreamTumblingSql =
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |  event_type, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Streaming exact-dedup under the batch gate: the events stream unioned
    * with ITSELF (every row arrives twice — manufactured duplicates),
    * deduped by event_id via [[dedupWithinWatermark]], sunk per micro-batch
    * through [[foreachBatchSink]] + the append sink to parquet, read back.
    * A watermark wider than the data's time range makes the streaming dedup
    * exactly global DISTINCT, so the oracle is simply the events table. */
  def qStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val deduped = dedupWithinWatermark(
      eventsStream(s, dir).unionByName(eventsStream(s, dir)),
      "ts", "3650 days", "event_id")
    // fixed output root, cleared up front: repeat invocations overwrite
    // instead of leaking a directory per call — and a stale previous run
    // can never leak rows into this one's append sink. The returned frame
    // reads the output lazily, so the parquet must outlive this call;
    // clearing on the NEXT invocation is what makes that safe under the
    // sequential harness.
    val root = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_stream_dedup_out").toPath
    deleteRecursively(root)
    val out = s"$root/events_deduped"
    val ck = scratch()
    val q = withStreamShuffle(s) {
      deduped.writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.io.Sinks.appendParquet(batch, out)
        }
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.read.parquet(out).orderBy(col("event_id"))
  }

  private val qStreamDedupSql =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
      |  value, props
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------------------ q_stream_sessions
  /** Open-session state for [[qStreamSessions]]: event-time bounds in
    * MICROseconds plus exact cents so the emitted aggregate is
    * decimal-exact. */
  final case class SessState(startUs: Long, lastUs: Long, n: Long, cents: Long)

  /** Gap-based sessionization as a STREAMING operator:
    * flatMapGroupsWithState keyed by user, 30-minute gap, event-time
    * timeout. Sessions closed by a later event (gap ≥ 30 min, the
    * session_window convention) are emitted in the data batch; the tail
    * session of each user is emitted by the event-time TIMEOUT once the
    * watermark passes last_event + 30 min — a session the stream can
    * PROVE closed. Sessions still provably-open at end-of-input are
    * never emitted (a streaming sessionizer cannot know they ended), and
    * the oracle mirrors exactly that: the batch islands derivation MINUS
    * still-open tails, with the timeout comparison done in floor-to-ms
    * space because Spark watermarks are millisecond-based.
    *
    * Scale: state is one 4-long struct per ACTIVE user (not per event) —
    * sharded by user, evicted by timeout; aggregation inside the group
    * function is O(batch) with nothing retained but the open session.
    * This is the custom-state operator class (c)-tier streaming needs —
    * session semantics built-in operators can't express incrementally
    * (session_window in streaming needs full-window retention; this
    * emits closed sessions immediately and keeps 32 bytes per user). */
  def sessionizeStream(spark: SparkSession, events: DataFrame): org.apache.spark.sql.Dataset[
      (Long, java.time.Instant, java.time.Instant, Long, Double)] = {
    import spark.implicits._
    val GapUs = 1800L * 1000000L
    def emit(u: Long, st: SessState) = {
      def inst(us: Long) = java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      (u, inst(st.startUs), inst(st.lastUs + GapUs), st.n, st.cents / 100.0)
    }
    events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withWatermark("ts", "0 seconds")
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState,
        (Long, java.time.Instant, java.time.Instant, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            val out = Iterator.single(emit(user, state.get))
            state.remove()
            out
          } else {
            val sorted = rows.map(r => (r._3, r._4)).toArray.sortBy(_._1)
            var open = state.getOption
            val closed = Seq.newBuilder[(Long, java.time.Instant,
              java.time.Instant, Long, Double)]
            sorted.foreach { case (us, cents) =>
              open match {
                case Some(st) if us - st.lastUs < GapUs =>
                  open = Some(SessState(st.startUs, us, st.n + 1, st.cents + cents))
                case Some(st) =>
                  closed += emit(user, st)
                  open = Some(SessState(us, us, 1L, cents))
                case None =>
                  open = Some(SessState(us, us, 1L, cents))
              }
            }
            open.foreach { st =>
              state.update(st)
              // ms-floor: watermarks are millisecond-based
              state.setTimeoutTimestamp(st.lastUs / 1000L + 1800L * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** [[sessionizeStream]] over the bounded events stream, memory-sink
    * collected. Oracle: the q_session_agg islands SQL minus sessions the
    * stream provably cannot close (tail sessions whose ms-floored timeout
    * never drops below the final ms-floored watermark = max event time). */
  def qStreamSessions(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_sessions"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val q = withStreamShuffle(s) {
      sessionizeStream(s, eventsStream(s, dir))
        .toDF("user_id", "session_start", "session_end", "n_events", "total_value")
        .writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name).orderBy(col("user_id"), col("session_start"))
  }

  private val qStreamSessionsSql =
    """WITH evts AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |flagged AS (
      |  SELECT user_id, ts, value,
      |    CAST((prev_us IS NULL OR (us - prev_us) >= 1800000000) AS INT)
      |      AS is_new
      |  FROM (
      |    SELECT *, epoch_us(ts) AS us,
      |      LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts)
      |        AS prev_us
      |    FROM evts)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |agg AS (
      |  SELECT user_id, sid, min(ts) AS session_start,
      |    max(ts) AS last_ts,
      |    max(ts) + INTERVAL 30 MINUTE AS session_end,
      |    count(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |  FROM sessions GROUP BY user_id, sid)
      |SELECT user_id, session_start, session_end, n_events, total_value
      |FROM agg
      |WHERE sid < (SELECT max(sid) FROM agg a2 WHERE a2.user_id = agg.user_id)
      |   OR (epoch_us(last_ts) // 1000 + 1800000)
      |        < ((SELECT max(epoch_us(ts)) FROM evts) // 1000)
      |ORDER BY user_id, session_start""".stripMargin

  // ------------------------------------------------- q_stream_interval_join
  /** [[intervalJoin]] under the batch gate: purchases joined to same-user
    * clicks within 6 hours AFTER them, over the bounded events stream. The
    * watermark (60 days) is wider than the data's 30-day span, so no row is
    * ever late and the stream's inner-join output is exactly the batch
    * interval-join answer — the same batch-equivalence argument that gates
    * q_stream_tumbling/q_stream_sessions. Ordering by (user_id, l_ts, r_ts)
    * is total up to fully-identical rows (l_event/r_event are constants). */
  def qStreamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_ijoin"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val joined = intervalJoin(
      eventsStream(s, dir).filter(col("event_type") === "purchase"),
      eventsStream(s, dir).filter(col("event_type") === "click"),
      within = "6 hours", watermark = "60 days")
    val q = withStreamShuffle(s) {
      joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name).orderBy(col("user_id"), col("l_ts"), col("r_ts"))
  }

  private val qStreamIntervalJoinSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events)
      |SELECT l.user_id AS user_id, l.event_type AS l_event,
      |  r.event_type AS r_event, l.ts AS l_ts, r.ts AS r_ts
      |FROM e l JOIN e r ON l.user_id = r.user_id
      |  AND l.event_type = 'purchase' AND r.event_type = 'click'
      |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR
      |ORDER BY user_id, l_ts, r_ts""".stripMargin

  // ----------------------------------------------- q_stream_running_counts
  /** [[userRunningCounts]] (mapGroupsWithState) under the batch gate: the
    * bounded events stream produces, per user, a changelog of running
    * (count, total) pairs — one emission per micro-batch that saw the user.
    * The FINAL running value per user is the batch aggregate, selected
    * batching-independently as the emission with the max event count (n is
    * strictly increasing per user across emissions). Totals are exact-cents
    * inside the state, so the Double rendered here is bit-identical to the
    * oracle's decimal-sum-cast regardless of row order. */
  def qStreamRunningCounts(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_counts"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val q = withStreamShuffle(s) {
      userRunningCounts(s, eventsStream(s, dir))
        .writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name).groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_value"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.total_value").as("total_value"))
      .orderBy(col("user_id"))
  }

  private val qStreamRunningCountsSql =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------------- q_stream_enrich
  /** Stream-static dimension enrichment: the events stream broadcast-joined
    * to the static customer dim, aggregated per market segment — the
    * standard "enrich the firehose with reference data" shape. The static
    * side needs no watermark or state: each micro-batch joins against the
    * (re-resolvable) dim snapshot, and because the dim is broadcast the
    * stream never shuffles for the lookup — exactly the batch star-join
    * discipline carried into streaming. Oracle: the identical batch
    * join+aggregate SQL (bounded stream ⇒ batch answer). */
  def qStreamEnrich(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_enrich"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val dim = graft.core.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val q = withStateStore(s) {
      eventsStream(s, dir)
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name).orderBy(col("c_mktsegment"))
  }

  private val qStreamEnrichSql =
    """SELECT c_mktsegment, count(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------- q_stream_outer_join
  /** LEFT OUTER stream-stream interval join — the watermark-driven
    * null-emission semantic the inner join never exercises: a purchase
    * with no click within 6 hours emits (once, with nulls) only after the
    * global watermark proves no matching click can still arrive; a
    * purchase whose match window is still open when the stream ends stays
    * in state and is NEVER emitted. The oracle replays exactly that rule
    * in batch SQL: matched pairs ∪ unmatched purchases whose window
    * closed before the final watermark, where the final watermark is
    * min(max purchase ts, max click ts) − the 2-day delay (Spark's
    * multi-watermark min policy). Unlike the inner-join entry, the
    * watermark here is deliberately NARROWER than the data span — the
    * eviction path is the thing under test. */
  def qStreamOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_ojoin"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val joined = intervalJoin(
      eventsStream(s, dir).filter(col("event_type") === "purchase"),
      eventsStream(s, dir).filter(col("event_type") === "click"),
      within = "6 hours", watermark = "2 days", joinType = "left_outer")
    val q = withStreamShuffle(s) {
      joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name).orderBy(col("user_id"), col("l_ts"),
      coalesce(col("r_ts"), lit("1970-01-01 00:00:00").cast("timestamp")))
  }

  private val qStreamOuterJoinSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM e WHERE event_type = 'click'),
      |wm AS (
      |  SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM c))
      |         - INTERVAL 2 DAY AS w),
      |matched AS (
      |  SELECT l.user_id, l.event_type AS l_event, r.event_type AS r_event,
      |    l.ts AS l_ts, r.ts AS r_ts
      |  FROM p l JOIN c r ON l.user_id = r.user_id
      |    AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR),
      |unmatched AS (
      |  SELECT l.user_id, l.event_type AS l_event,
      |    CAST(NULL AS VARCHAR) AS r_event,
      |    l.ts AS l_ts, CAST(NULL AS TIMESTAMP) AS r_ts
      |  FROM p l
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM c r WHERE r.user_id = l.user_id
      |        AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR)
      |    AND l.ts + INTERVAL 6 HOUR < (SELECT w FROM wm))
      |SELECT * FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
      |ORDER BY user_id, l_ts,
      |  coalesce(r_ts, TIMESTAMP '1970-01-01 00:00:00')""".stripMargin

  // ------------------------------------------------- q_stream_topk
  /** The native bounded-heap `topk` aggregate under the STREAMING
    * runtime: top-3 events by value per event type, maintained
    * incrementally in Complete mode — the state per group is ≤ k
    * (score, id) scalars, the exact property that makes a custom
    * TypedImperativeAggregate viable as streaming state where the
    * row_number-window formulation cannot run on a stream at all
    * (ranking needs the whole partition; the heap needs k entries).
    * Exercises the aggregate's serialize/merge path across micro-batches
    * — a codepath no batch query reaches. Oracle: the batch row_number
    * equivalent (bounded stream ⇒ batch answer). */
  def qStreamTopk(s: SparkSession, dir: String): DataFrame = {
    graft.core.Sessions.tune(s) // topk must be registered on this session
    val name = "graft_stream_topk"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val q = withStateStore(s) {
      eventsStream(s, dir)
        .groupBy(col("event_type"))
        .agg(expr("topk(cast(cast(value as decimal(18,2)) as double), " +
          "event_id, 3)").as("top"))
        .writeStream
        .outputMode(OutputMode.Complete())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name)
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("event_id"),
        col("col.score").as("value"))
      .orderBy(col("event_type"), col("rank"))
  }

  private val qStreamTopkSql =
    """SELECT event_type, rank, event_id,
      |  CAST(v AS DOUBLE) AS value
      |FROM (
      |  SELECT event_type, event_id,
      |    CAST(value AS DECIMAL(18,2)) AS v,
      |    CAST(row_number() OVER (PARTITION BY event_type
      |      ORDER BY CAST(value AS DECIMAL(18,2)) DESC, event_id) AS INT)
      |      AS rank
      |  FROM events)
      |WHERE rank <= 3
      |ORDER BY event_type, rank""".stripMargin

  // --------------------------------------------------- q_stream_kmv
  /** Approximate DISTINCT per tumbling hour in a LIVE stream — the
    * operation Structured Streaming refuses outright (`COUNT(DISTINCT)`
    * raises "Distinct aggregations are not supported on streaming
    * DataFrames": exact per-window distinct state is unbounded in the
    * key universe). The mergeable [[graft.expressions.KmvAgg]] sketch
    * is the drop-in: its bounded ≤ k-long buffer IS the streaming
    * state per window, partial-merged across micro-batches by the
    * state store exactly as map-side combine merges it in batch — so
    * the streaming answer over a bounded input equals the batch
    * estimate bit-for-bit and rides the SAME DuckDB replay as
    * q_window_kmv (60-bit domain, deterministic estimator). APPEND mode
    * + watermark: a window's ≤ k-long sketch emits once when the
    * watermark passes its end and is EVICTED — bounded state per window
    * AND a bounded number of live windows at any stream length (r10
    * VERDICT item 1; the tail windows close via [[flushedEventsStream]]'s
    * sentinel, exactly as qStreamTumbling). Memory sink is the
    * bounded-gate harness; a production deployment appends closed
    * windows' sketches through [[foreachBatchSink]] and merges the
    * stored sketches for cross-window reports (the q_active_users_kmv
    * serving asset, fed by the stream). */
  def qStreamKmv(s: SparkSession, dir: String): DataFrame = {
    graft.core.Sessions.tune(s) // kmv must be registered on this session
    val name = "graft_stream_kmv"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val (ev, flushTs) = flushedEventsStream(s, dir)
    val q = withStreamShuffle(s) {
      // the sentinel needs no pre-agg filter: its hash lands in its OWN
      // far-future window, which the watermark never closes (and the
      // read-back filters defensively besides)
      ev
        .withWatermark("ts", "2 hours")
        .select(col("ts"),
          expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15)," +
            " 16, 10) as bigint)").as("hv"))
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(expr("kmv(hv, 64)").as("sk"))
        .writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name)
      .filter(col("w.start") < lit(flushTs)) // defensive: no sentinel window
      .select(col("w.start").as("window_start"),
        when(col("sk.n_kept") < 64, col("sk.n_kept").cast("double"))
          .otherwise(lit(63.0 * 1152921504606846976.0) / col("sk.kth"))
          .as("n_est"))
      .orderBy(col("window_start"))
  }

  /** The per-window KMV replay of q_window_kmv, estimate column only
    * (streaming cannot produce the exact side — that is the point). */
  private val qStreamKmvSql =
    """WITH h AS (
      |  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |      AS hv
      |  FROM events),
      |r AS (
      |  SELECT w, hv,
      |    row_number() OVER (PARTITION BY w ORDER BY hv) AS rn,
      |    count(*) OVER (PARTITION BY w) AS nh
      |  FROM h),
      |sk AS (
      |  SELECT w, max(CASE WHEN rn = 64 THEN hv END) AS kth, max(nh) AS nh
      |  FROM r GROUP BY w)
      |SELECT w AS window_start,
      |  CASE WHEN nh < 64 THEN CAST(nh AS DOUBLE)
      |       ELSE 63.0 * 1152921504606846976.0 / kth END AS n_est
      |FROM sk ORDER BY window_start""".stripMargin

  // --------------------------------------------- q_stream_full_outer
  /** FULL OUTER stream-stream interval join — both null-emission paths at
    * once: a purchase with no click within 6 hours emits with right-nulls
    * once the watermark passes its window end (the [[qStreamOuterJoin]]
    * rule), and a click never claimed by any purchase emits with
    * left-nulls once the watermark passes the click's own timestamp (a
    * left matching it would need l_ts ≤ r_ts, and a new left below the
    * watermark would be dropped as late — so wm > r_ts proves
    * unmatchable; StreamsSpec pins the boundary empirically). The oracle
    * replays both rules in batch SQL against the final watermark
    * min(max purchase ts, max click ts) − 2 days. Rows whose proof
    * window is still open when the bounded stream ends stay in state
    * and are never emitted — both sides. */
  def qStreamFullOuter(s: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_fojoin"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val joined = intervalJoin(
      eventsStream(s, dir).filter(col("event_type") === "purchase"),
      eventsStream(s, dir).filter(col("event_type") === "click"),
      within = "6 hours", watermark = "2 days", joinType = "full_outer")
    val q = withStreamShuffle(s) {
      joined.writeStream
        .outputMode(OutputMode.Append())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name).orderBy(col("user_id"),
      coalesce(col("l_ts"), lit("1970-01-01 00:00:00").cast("timestamp")),
      coalesce(col("r_ts"), lit("1970-01-01 00:00:00").cast("timestamp")))
  }

  private val qStreamFullOuterSql =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
      |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM e WHERE event_type = 'click'),
      |wm AS (
      |  SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM c))
      |         - INTERVAL 2 DAY AS w),
      |matched AS (
      |  SELECT l.user_id, l.event_type AS l_event, r.event_type AS r_event,
      |    l.ts AS l_ts, r.ts AS r_ts
      |  FROM p l JOIN c r ON l.user_id = r.user_id
      |    AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR),
      |unmatched_l AS (
      |  SELECT l.user_id, l.event_type AS l_event,
      |    CAST(NULL AS VARCHAR) AS r_event,
      |    l.ts AS l_ts, CAST(NULL AS TIMESTAMP) AS r_ts
      |  FROM p l
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM c r WHERE r.user_id = l.user_id
      |        AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR)
      |    AND l.ts + INTERVAL 6 HOUR < (SELECT w FROM wm)),
      |unmatched_r AS (
      |  SELECT r.user_id, CAST(NULL AS VARCHAR) AS l_event,
      |    r.event_type AS r_event,
      |    CAST(NULL AS TIMESTAMP) AS l_ts, r.ts AS r_ts
      |  FROM c r
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM p l WHERE l.user_id = r.user_id
      |        AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOUR)
      |    AND r.ts < (SELECT w FROM wm))
      |SELECT * FROM (SELECT * FROM matched
      |  UNION ALL SELECT * FROM unmatched_l
      |  UNION ALL SELECT * FROM unmatched_r)
      |ORDER BY user_id,
      |  coalesce(l_ts, TIMESTAMP '1970-01-01 00:00:00'),
      |  coalesce(r_ts, TIMESTAMP '1970-01-01 00:00:00')""".stripMargin

  // ------------------------------------------------------------ q_stream_cdc
  final case class CdcEvent(user_id: Long, ts_us: Long, event_id: Long,
                            op: String, cents: Long)
  final case class CdcState(tsUs: Long, eventId: Long, op: String,
                            cents: Long, nOps: Long)

  /** Streaming CDC upsert maintenance — the batch changelog compaction
    * ([[graft.queries.TimeSeries]] q_cdc_apply: signup=I, error=D
    * tombstone, else U, last-writer-wins by (ts, event_id)) run
    * CONTINUOUSLY: per key, mapGroupsWithState holds only the current
    * winner plus an op counter (~40 bytes/key — state bounded by live
    * keys, not stream length) and emits the updated serving row every
    * micro-batch that touches the key. This is the Delta/Hudi-MERGE
    * serving-table shape without a table format. Tombstoned keys stay IN
    * state (a later upsert must outrank the delete's sequence) and drop
    * at read-out — exactly the batch rank-then-filter semantics.
    *
    * Gate: the SAME oracle as q_cdc_apply (the q_topk_native precedent:
    * two operators proven equal through the gate). The final per-key
    * emission is selected batching-independently as the max-n_ops row
    * (n_ops strictly increases per key across emissions). */
  def qStreamCdc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val name = "graft_stream_cdc"
    s.catalog.dropTempView(name)
    val ck = scratch()
    val src = eventsStream(s, dir).select(
        col("user_id"),
        expr("unix_micros(ts)").as("ts_us"),
        col("event_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[CdcEvent]
    val q = withStreamShuffle(s) {
      src.groupByKey(_.user_id)
        .mapGroupsWithState[CdcState, (Long, String, Long, Long, Long)](
          GroupStateTimeout.NoTimeout) {
          (user: Long, rows: Iterator[CdcEvent], state: GroupState[CdcState]) =>
            var st = state.getOption
              .getOrElse(CdcState(Long.MinValue, Long.MinValue, "", 0L, 0L))
            rows.foreach { r =>
              val n = st.nOps + 1
              st =
                if (r.ts_us > st.tsUs ||
                    (r.ts_us == st.tsUs && r.event_id > st.eventId))
                  CdcState(r.ts_us, r.event_id, r.op, r.cents, n)
                else st.copy(nOps = n)
            }
            state.update(st)
            (user, st.op, st.cents, st.tsUs, st.nOps)
        }
        .toDF("user_id", "last_op", "cents", "ts_us", "n_ops")
        .writeStream
        .outputMode(OutputMode.Update())
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    deleteRecursively(ck)
    s.table(name).groupBy(col("user_id"))
      .agg(max(struct(col("n_ops"), col("ts_us"), col("last_op"),
        col("cents"))).as("m"))
      .select(col("user_id"), col("m.last_op").as("last_op"),
        (col("m.cents").cast("double") / 100.0d).as("last_value"),
        timestamp_micros(col("m.ts_us")).as("last_ts"),
        col("m.n_ops").as("n_ops"))
      .filter(col("last_op") =!= "D")
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_cdc"            -> (qStreamCdc _),
    "q_stream_kmv"            -> (qStreamKmv _),
    "q_stream_topk"           -> (qStreamTopk _),
    "q_stream_full_outer"     -> (qStreamFullOuter _),
    "q_stream_outer_join"     -> (qStreamOuterJoin _),
    "q_stream_tumbling"       -> (qStreamTumbling _),
    "q_stream_dedup"          -> (qStreamDedup _),
    "q_stream_sessions"       -> (qStreamSessions _),
    "q_stream_interval_join"  -> (qStreamIntervalJoin _),
    "q_stream_running_counts" -> (qStreamRunningCounts _),
    "q_stream_enrich"         -> (qStreamEnrich _))

  val oracle: Map[String, String] = Map(
    // q_stream_cdc must reproduce the batch compaction EXACTLY — one
    // oracle, two operators (the q_topk_native precedent)
    "q_stream_cdc"            -> graft.queries.TimeSeries.oracle("q_cdc_apply"),
    "q_stream_kmv"            -> qStreamKmvSql,
    "q_stream_topk"           -> qStreamTopkSql,
    "q_stream_full_outer"     -> qStreamFullOuterSql,
    "q_stream_outer_join"     -> qStreamOuterJoinSql,
    "q_stream_tumbling"       -> qStreamTumblingSql,
    "q_stream_dedup"          -> qStreamDedupSql,
    "q_stream_sessions"       -> qStreamSessionsSql,
    "q_stream_interval_join"  -> qStreamIntervalJoinSql,
    "q_stream_running_counts" -> qStreamRunningCountsSql,
    "q_stream_enrich"         -> qStreamEnrichSql)
}
