package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

/** Driver-registered streaming queries: each runs a genuine Structured
  * Streaming query (micro-batch engine, streaming state) over the
  * events parquet via [[EventsStreaming.readEventsStream]], drains it
  * through the memory sink, and returns the result for the oracle gate.
  * Because the source is finite and processed in one batch, the
  * streaming results are deterministic and equal to their batch duals —
  * which is exactly what the DuckDB oracles express.
  *
  * Scale notes: the hourly aggregate shuffles once on the window
  * bucket; sessionization shuffles once on user_id with per-user state
  * (the same shapes as q23/q24's batch plans, but with streaming state
  * stores). Complete output mode is used for the windowed aggregate so
  * the finite-source run emits every window; an unbounded production
  * run would switch to Append + the watermarked
  * [[EventsStreaming.windowedAgg]].
  */
object StreamingQueries {

  // --------------------------------------------------------------------
  // q45 — streaming tumbling-window aggregate (streaming dual of q23).
  def q45StreamHourly(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val events = EventsStreaming.readEventsStream(ss, dir)
    val agg = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(24, 6))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    EventsStreaming.runToMemory(agg, "q45_mem", OutputMode.Complete)
      .orderBy(col("window_start"), col("event_type"))
  }

  val q45Oracle: String =
    """SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
      |  event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin

  // --------------------------------------------------------------------
  // q151 — streaming SLIDING (hopping) windows: q132's overlapping
  // 1-hour/30-minute aggregate run as a stream — each event lands in
  // exactly two open windows, maintained incrementally in the window
  // state store. Complete mode (the q45 pattern) emits the final
  // window set once the finite fixture drains; the oracle IS q132's —
  // batch/stream parity pinned by the shared SQL text.
  // Scale notes (100 TB/day): per-window state is one (window,
  // event_type) aggregate row — 2x the tumbling-window state, bounded
  // by watermark eviction in the production append-mode form.
  def q151StreamHopping(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val events = EventsStreaming.readEventsStream(ss, dir)
    val agg = events
      .groupBy(
        window(col("ts"), "1 hour", "30 minutes")("start")
          .cast("long").as("win_start_sec"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(24, 6))).cast("double").as("sum_value"))
    EventsStreaming.runToMemory(agg, "q151_mem", OutputMode.Complete)
      .orderBy(col("win_start_sec"), col("event_type"))
  }

  /** Batch/stream parity: the oracle is q132's, verbatim. */
  val q151Oracle: String = graft.queries.EventsQueries.q132Oracle

  // --------------------------------------------------------------------
  // q146 — NATIVE session windows: q46's sessionization through the
  // built-in `session_window` aggregation instead of hand-rolled
  // flatMapGroupsWithState — Spark merges overlapping [t, t+gap)
  // intervals in the state store itself. Event times are truncated to
  // whole seconds BEFORE windowing so the merge boundary is
  // integer-exact in both engines — and that boundary MERGES touching
  // windows: an event exactly gap seconds after the previous falls on
  // the prior window's half-open end and Spark still coalesces the two
  // (observed on sf0.1 user 511, gap = exactly 1800 s), so the break
  // condition is a STRICT > — the same break as q46's custom state.
  // The window end is last-event + gap by definition. Session windows only
  // support APPEND mode, which emits a session when the watermark
  // passes its end — so a finite stream would hold back every user's
  // LAST session forever. The fixture is therefore staged as two
  // micro-batches: the real events, then one far-future flush event
  // per user whose only job is to advance the watermark past every
  // real session (the flush sessions themselves are never emitted —
  // exactly how production streams behave between a session's close
  // and its emission).
  // Scale notes (100 TB/day): state is merged-interval-per-(user,
  // session) — strictly smaller than q46's event-buffering custom
  // state, and eviction follows the watermark. This is the production
  // sessionizer when no custom per-session payload is needed.
  def q146StreamSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val stage = s"${sys.props("java.io.tmpdir")}/graft_q146_" +
      s"${ss.sparkContext.applicationId}_${math.abs(dir.hashCode)}"
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(ss.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    // stage through the batch loader so ts is normalized TIMESTAMP no
    // matter how the generator encoded it; both staged batches then
    // carry the schema readEventsStream infers back from the files
    val raw = graft.sources.Tables.events(ss, dir)
    raw.coalesce(1).write.parquet(s"$stage/b1.parquet")
    // flush batch: one synthetic event per user, 30 days past the max
    // raw event time — its only job is to advance the watermark
    val maxSec = raw.agg(max(col("ts").cast("long"))).head().getLong(0)
    raw.select(col("user_id")).distinct()
      .select((-col("user_id") - 1).as("event_id"),
        timestamp_seconds(lit(maxSec + 30L * 86400)).as("ts"), col("user_id"),
        lit("flush").as("event_type"), lit(0.0).as("value"),
        lit(null).cast("string").as("props"))
      .coalesce(1).write.parquet(s"$stage/b2.parquet")
    // the file source orders batches by modification time — push the
    // flush files decisively after the events files, through the SAME
    // Hadoop FS handle the rest of this staging block uses (a
    // java.io.File mtime poke would silently no-op on any non-local FS)
    val flushMtime = System.currentTimeMillis() + 600000L
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$stage/b2.parquet"))
      .foreach(s => fs.setTimes(s.getPath, flushMtime, -1))
    val events = EventsStreaming.readEventsStream(ss, s"$stage/*.parquet",
      glob = "*.parquet", options = Map("maxFilesPerTrigger" -> "1"))
    // no flush filter needed: flush sessions END 1800s after the final
    // watermark, so append mode never emits them — and filtering before
    // the watermark node would stop them advancing it
    val agg = events
      .select(col("user_id"),
        timestamp_seconds(col("ts").cast("long")).as("tsec"))
      .withWatermark("tsec", "0 seconds")
      .groupBy(col("user_id"), session_window(col("tsec"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").cast("long").as("session_start_sec"),
        col("session_window.end").cast("long").as("session_end_sec"),
        col("n_events"))
    EventsStreaming.runToMemory(agg, "q146_mem")
      .orderBy(col("user_id"), col("session_start_sec"))
  }

  val q146Oracle: String =
    """WITH e AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
      |  FROM events),
      |lagged AS (
      |  SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY sec) AS prev
      |  FROM e),
      |s AS (
      |  SELECT *,
      |    CAST(SUM(CASE WHEN prev IS NULL OR sec - prev > 1800
      |      THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY sec
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS sid
      |  FROM lagged)
      |SELECT user_id, MIN(sec) AS session_start_sec,
      |  MAX(sec) + 1800 AS session_end_sec, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_sec""".stripMargin

  // --------------------------------------------------------------------
  // q46 — streaming stateful sessionization via flatMapGroupsWithState
  // (streaming dual of q24, minus the value sum the streaming state
  // does not carry). Session ids are per-user counters, so the result
  // is deterministic regardless of partitioning.
  def q46StreamSessions(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val events = EventsStreaming.readEventsStream(ss, dir)
    val sessions = EventsStreaming.sessionize(ss, events)
    EventsStreaming.runToMemory(sessions.toDF(), "q46_mem")
      .orderBy(col("user_id"), col("session_id"))
  }

  val q46Oracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
      |    ts
      |  FROM events),
      |lagged AS (
      |  SELECT *, lag(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      |  FROM flagged),
      |sessions AS (
      |  SELECT *,
      |    CAST(SUM(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM lagged)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(sec) AS session_start_sec, MAX(sec) AS session_end_sec
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // --------------------------------------------------------------------
  // q72 — streaming exact dedup: an at-least-once source (simulated by
  // unioning the stream with itself, so every event arrives twice)
  // reduced to exactly-once output via stateful dropDuplicates on the
  // event key. The streaming analogue of q31's batch dedup — the state
  // store holds one entry per key, partitioned by the key shuffle. A
  // production run bounds that state with dropDuplicatesWithinWatermark
  // — q84 below runs exactly that form; this query keeps the unbounded
  // one so the exact/bounded pair is covered side by side.
  def q72StreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val once = EventsStreaming.readEventsStream(ss, dir)
    val atLeastOnce = once.union(EventsStreaming.readEventsStream(ss, dir))
    val deduped = atLeastOnce
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .dropDuplicates("event_id")
    EventsStreaming.runToMemory(deduped, "q72_mem")
      .orderBy(col("event_id"))
  }

  val q72Oracle: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
      |FROM events ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q84 — BOUNDED-state streaming dedup: q72's semantics through
  // dropDuplicatesWithinWatermark, the production form q72's scaladoc
  // names. State per key is retained only until the watermark passes
  // the key's latest event time plus the 30-minute delay — at
  // 100 TB/day the unbounded form accretes one state row per event id
  // forever and is not runnable, while this form's state is bounded by
  // the id arrival rate within one watermark horizon. The
  // at-least-once duplicate guarantee weakens correspondingly: a
  // duplicate arriving AFTER its key's state was evicted is re-emitted
  // (WatermarkDedupSpec pins both behaviors across real micro-batch
  // boundaries). On the finite fixture everything arrives in one batch
  // with watermark 0, so no state is evicted mid-run and the result
  // equals q72's — which is what the shared oracle expresses.
  def q84StreamDedupWatermark(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val once = EventsStreaming.readEventsStream(ss, dir)
    val atLeastOnce = once.union(EventsStreaming.readEventsStream(ss, dir))
    val deduped = atLeastOnce
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
    EventsStreaming.runToMemory(deduped, "q84_mem")
      .orderBy(col("event_id"))
  }

  val q84Oracle: String = q72Oracle

  // --------------------------------------------------------------------
  // q244 — checkpoint RECOVERY across a query restart: the streaming
  // production property no single-run query can pin. A stateful
  // per-type aggregate runs over half the corpus and stops; the other
  // half arrives; a NEW query starts against the SAME checkpoint. The
  // restart must recover BOTH sides of the checkpoint contract: the
  // source offsets (half A is never re-read — re-processing would
  // double-count it into the recovered aggregate state) and the state
  // store (half A's counts survive the process boundary — losing them
  // leaves half-B-only totals). Either corruption changes the final
  // totals, so the DuckDB oracle (the whole-corpus batch aggregate)
  // is a complete gate over restart semantics; StreamRestartSpec
  // additionally pins that run 2's input-row count is EXACTLY half B.
  // Complete-mode output goes through foreachBatch overwriting one
  // parquet snapshot — the idempotent "latest state" sink a
  // dashboard-style consumer reads.
  // Scale notes (100 TB/day): restart-from-checkpoint is how every
  // production stream deploys (upgrade, rebalance, crash); state
  // lives in the RocksDB-backed store keyed by group, offsets in the
  // checkpoint log — both scale with keys and files, not history.
  def q244StreamRestart(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val outDir = graft.sources.ShardPaths.resolve(ss, "q244", dir)
    val ckptDir = graft.sources.ShardPaths.resolveCheckpoint(ss, "q244", dir)
    val stage = graft.sources.ShardPaths.resolve(ss, "q244_stage", dir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(ss.sessionState.newHadoopConf())
    Seq(outDir, ckptDir, stage).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val raw = graft.sources.Tables.events(ss, dir)
    raw.filter(col("event_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$stage/a1.parquet")
    q244Run(ss, stage, ckptDir, outDir)
    raw.filter(col("event_id") % 2 =!= 0)
      .coalesce(1).write.parquet(s"$stage/a2.parquet")
    q244Run(ss, stage, ckptDir, outDir)
    spark.read.parquet(outDir)
      .select(col("event_type"), col("n_events"),
        col("dec_sum").cast("double").as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** One run of q244's restartable aggregate: start against the
    * checkpoint, drain, stop. Returns the run's total input rows so
    * StreamRestartSpec can pin offset recovery (run 2 == |half B|).
    */
  private[streaming] def q244Run(ss: SparkSession, stage: String,
      ckptDir: String, outDir: String): Long = {
    val agg = EventsStreaming
      .readEventsStream(ss, s"$stage/*.parquet", glob = "*.parquet")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(24, 6))).as("dec_sum"))
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    val rows = q.recentProgress.map(_.numInputRows).sum
    q.stop()
    rows
  }

  val q244Oracle: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q250 — the RocksDB STATE STORE provider: the production state
  // backend. Every other stateful query in the registry runs on the
  // default HDFS-backed provider, which keeps the ENTIRE state map
  // on-heap per partition — fine for bounded keys (event types,
  // session windows inside a watermark), fatal for unbounded ones. A
  // per-USER aggregate is exactly that case: state cardinality grows
  // with the user population, so the production deployment points the
  // state store at RocksDB (native memory + local SSD, point lookups
  // instead of a resident hash map) with CHANGELOG checkpointing —
  // per batch it uploads only the delta file, not a full state
  // snapshot (the StageBoundary incremental-publish idea applied to
  // operator state). Results are backend-invariant — the DuckDB
  // whole-corpus oracle proves the aggregate; RocksDbStateSpec pins
  // the mechanism (rocksdb* metrics in the operator's progress, a
  // .changelog file in the checkpoint, per-user state rows) and
  // backend-equality against the default provider.
  // Scale notes (100 TB/day): state backend choice is THE streaming
  // memory-scale lever — a 1e9-key aggregate is ~100 GB of state per
  // executor-set on-heap (OOM) vs an SSD-resident RocksDB per
  // partition; changelog checkpointing turns per-batch state upload
  // from O(state) to O(delta).
  def q250RocksdbState(spark: SparkSession, dir: String): DataFrame = {
    val ss = rocksSession(spark)
    val outDir = graft.sources.ShardPaths.resolve(ss, "q250", dir)
    val ckptDir = graft.sources.ShardPaths.resolveCheckpoint(ss, "q250", dir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(ss.sessionState.newHadoopConf())
    Seq(outDir, ckptDir).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    q250Run(ss, dir, ckptDir, outDir)
    spark.read.parquet(outDir)
      .select(col("user_id"), col("n_events"),
        col("dec_sum").cast("double").as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** [[EventsStreaming.streamSession]] plus the RocksDB provider and
    * changelog-checkpointing confs. Exposed for RocksDbStateSpec. */
  private[streaming] def rocksSession(spark: SparkSession): SparkSession = {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    ss
  }

  /** One run of q250's per-user aggregate on the caller's session;
    * returns the final progress so RocksDbStateSpec can inspect the
    * state operator's backend metrics. */
  private[streaming] def q250Run(ss: SparkSession, dir: String,
      ckptDir: String, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQueryProgress = {
    val agg = EventsStreaming.readEventsStream(ss, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(24, 6))).as("dec_sum"))
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    val prog = q.recentProgress.last
    q.stop()
    prog
  }

  val q250Oracle: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------
  // q253 — Trigger.AvailableNow: the SELF-TERMINATING rate-limited
  // drain, i.e. "batch job over a streaming source". Every other
  // streaming query here drains with processAllAvailable() — a test
  // harness call; a production incremental job (the nightly load)
  // instead starts with AvailableNow, which snapshots the available
  // offsets at start, processes them in MULTIPLE rate-limited
  // micro-batches (maxFilesPerTrigger=1 → one batch per staged file,
  // so state/checkpoint pacing matches a live stream), and then
  // TERMINATES on its own — awaitTermination() returns with no
  // stop(). Combined with the checkpoint, successive runs are
  // incremental: run 2 sees only the files staged after run 1
  // (AvailableNowSpec pins >1 batch per run, self-termination, and
  // the run-2 delta). The corpus lands per event-type with count,
  // value sum, and high-water event id — the shape of an
  // incremental ingest ledger.
  // Scale notes (100 TB/day): AvailableNow is THE scheduling
  // primitive for incremental pipelines — cron-started, drains
  // exactly the backlog under the same rate limits as a live run
  // (bounded batch state, no OOM on a day's backlog), exits, and the
  // checkpoint carries exactly-once across runs. processAllAvailable
  // blocks a driver forever on a source that keeps appending;
  // AvailableNow's start-time snapshot is what makes termination
  // well-defined.
  def q253StreamAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val outDir = graft.sources.ShardPaths.resolve(ss, "q253", dir)
    val ckptDir = graft.sources.ShardPaths.resolveCheckpoint(ss, "q253", dir)
    val stage = graft.sources.ShardPaths.resolve(ss, "q253_stage", dir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(ss.sessionState.newHadoopConf())
    Seq(outDir, ckptDir, stage).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val raw = graft.sources.Tables.events(ss, dir)
    (0 until 4).foreach { i =>
      raw.filter(col("event_id") % 4 === i)
        .coalesce(1).write.parquet(s"$stage/s$i.parquet")
    }
    q253Run(ss, stage, ckptDir, outDir)
    spark.read.parquet(outDir)
      .select(col("event_type"), col("n_events"),
        col("dec_sum").cast("double").as("sum_value"), col("last_id"))
      .orderBy(col("event_type"))
  }

  /** One AvailableNow run: drains whatever is staged in ≥1 rate-limited
    * micro-batches and terminates by itself. Returns (batches, rows)
    * so AvailableNowSpec can pin the pacing and the run-2 delta. */
  private[streaming] def q253Run(ss: SparkSession, stage: String,
      ckptDir: String, outDir: String): (Int, Long) = {
    val agg = EventsStreaming
      .readEventsStream(ss, s"$stage/*.parquet", glob = "*.parquet",
        options = Map("maxFilesPerTrigger" -> "1"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(24, 6))).as("dec_sum"),
        max(col("event_id")).as("last_id"))
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(outDir)
      }
      .start()
    // the mechanism: NO stop() — the trigger ends the query itself
    q.awaitTermination()
    (q.recentProgress.length, q.recentProgress.map(_.numInputRows).sum)
  }

  val q253Oracle: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value,
      |  MAX(event_id) AS last_id
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q256 — UPDATE-mode incremental PUBLISH to a partitioned serving
  // table: the composed production sink none of the earlier sink
  // patterns covers. q80 appends idempotently; q244/q250/q253
  // overwrite a whole complete-mode snapshot — fine for small
  // outputs, O(result) per batch at scale. The incremental form:
  // UPDATE output mode hands foreachBatch ONLY the groups whose
  // aggregate changed in that micro-batch, and the batch writes them
  // with partition-scoped DYNAMIC overwrite — so a micro-batch that
  // touches 2 of 10 000 day-partitions rewrites exactly those 2, and
  // an ingest of new days never rewrites (or even reads) history
  // (StreamPublishSpec pins: run 2 reads only the delta, the
  // pre-split days' FILES are byte-identical after run 2, and the
  // final table equals the whole-corpus aggregate). The day grain
  // equals the partition grain ON PURPOSE: dynamic overwrite replaces
  // whole partitions, so a partition must be exactly one update
  // group — a (day, type) grain under day-partitioning would drop a
  // day's un-updated types on publish (the classic trap, documented
  // here instead of discovered in production).
  // Scale notes (100 TB/day): this is the streaming-upsert-to-
  // parquet pattern for serving tables without a table format —
  // per-batch write cost is O(changed partitions); with a
  // row-level-capable format (Iceberg/Delta) the same update-mode
  // stream feeds MERGE instead, at row grain.
  val PublishSplitDay = 19740L

  def q256StreamIncrementalPublish(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val outDir = graft.sources.ShardPaths.resolve(ss, "q256", dir)
    val ckptDir = graft.sources.ShardPaths.resolveCheckpoint(ss, "q256", dir)
    val stage = graft.sources.ShardPaths.resolve(ss, "q256_stage", dir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(ss.sessionState.newHadoopConf())
    Seq(outDir, ckptDir, stage).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val raw = graft.sources.Tables.events(ss, dir)
      .withColumn("day", expr("CAST(ts AS LONG) DIV 86400"))
    raw.filter(col("day") < PublishSplitDay).drop("day")
      .coalesce(1).write.parquet(s"$stage/a1.parquet")
    q256Run(ss, stage, ckptDir, outDir)
    raw.filter(col("day") >= PublishSplitDay).drop("day")
      .coalesce(1).write.parquet(s"$stage/a2.parquet")
    q256Run(ss, stage, ckptDir, outDir)
    spark.read.parquet(outDir)
      .select(col("day").cast("bigint").as("day"), col("n_events"),
        col("dec_sum").cast("double").as("sum_value"))
      .orderBy(col("day"))
  }

  /** One update-mode publish run against the checkpoint: drains
    * whatever is newly staged, rewrites ONLY the day partitions whose
    * aggregate changed. Returns the run's input-row count for
    * StreamPublishSpec's delta pin. */
  private[streaming] def q256Run(ss: SparkSession, stage: String,
      ckptDir: String, outDir: String): Long = {
    val agg = EventsStreaming
      .readEventsStream(ss, s"$stage/*.parquet", glob = "*.parquet")
      .withColumn("day", expr("CAST(ts AS LONG) DIV 86400"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(24, 6))).as("dec_sum"))
    val q = agg.writeStream.outputMode("update")
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        // update mode: b holds only the day groups this batch changed;
        // dynamic overwrite replaces exactly those day partitions
        b.write.mode("overwrite").partitionBy("day").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    val rows = q.recentProgress.map(_.numInputRows).sum
    q.stop()
    rows
  }

  val q256Oracle: String =
    """SELECT CAST(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
      |    AS BIGINT) AS day,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // --------------------------------------------------------------------
  // q73 — watermarked stream-stream join: each event joined to the same
  // user's follow-up events within 10 minutes (the "action → reaction"
  // correlation pattern). Both sides carry a 30-minute watermark and
  // the join condition bounds event time on both ends, which is what
  // lets Spark evict join state — the buffered side holds only the
  // watermark horizon, not the stream's history. Finite fixture → the
  // result equals the batch self-join, which is the oracle.
  def q73StreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val a = EventsStreaming.readEventsStream(ss, dir)
      .select(col("event_id").as("event_a"), col("user_id"), col("ts").as("ts_a"))
      .withWatermark("ts_a", "30 minutes")
    val b = EventsStreaming.readEventsStream(ss, dir)
      .select(col("event_id").as("event_b"), col("user_id").as("user_b"),
        col("ts").as("ts_b"))
      .withWatermark("ts_b", "30 minutes")
    // two-level condition: the RAW-timestamp range (slightly widened)
    // is what Spark's watermark analysis uses to bound join state; the
    // floor-second refinement pins the exact semantics the oracle
    // expresses (micros-precision ts vs the oracle's whole seconds)
    val joined = a.join(b,
      col("user_id") === col("user_b") &&
        col("ts_b") >= col("ts_a") - expr("INTERVAL 1 SECOND") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 11 MINUTES") &&
        col("ts_b").cast("long") > col("ts_a").cast("long") &&
        col("ts_b").cast("long") <= col("ts_a").cast("long") + 600)
      .select(col("user_id"), col("event_a"), col("event_b"),
        (col("ts_b").cast("long") - col("ts_a").cast("long")).as("gap_sec"))
    EventsStreaming.runToMemory(joined, "q73_mem")
      .orderBy(col("event_a"), col("event_b"))
  }

  val q73Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
      |  FROM events)
      |SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
      |  b.sec - a.sec AS gap_sec
      |FROM e a JOIN e b
      |  ON a.user_id = b.user_id AND b.sec > a.sec AND b.sec <= a.sec + 600
      |ORDER BY event_a, event_b""".stripMargin

  // --------------------------------------------------------------------
  // q167 — watermarked stream-stream LEFT OUTER join: q73's
  // action→reaction correlation, but events with NO follow-up within 10
  // minutes must also emit (with a null reaction) — the "un-actioned
  // event" report a real-time alerting pipeline runs. Outer emission is
  // watermark-gated: a left row's null result is released only once the
  // watermark proves no future right row can match it (raw-bound
  // analysis: ts_a + 11 min < watermark), which is exactly the state
  // eviction point — so join state stays bounded by the watermark
  // horizon AND the outer semantics are deterministic. Rows younger
  // than (max ts − 30 min − 11 min) are still held in state when the
  // finite source drains and emit NOTHING — the oracle expresses that
  // cutoff in micros-precision epoch arithmetic, making the
  // held-back set hash-exact rather than fixture-tuned.
  // The no-data micro-batch that follows the last data batch (enabled
  // by default) is what flushes the evictable outer rows; StreamingSpec
  // pins all three row classes (matched / null-emitted / held-back).
  // Scale notes (100 TB/day): identical state shape to q73 — both
  // sides shuffle on user_id, state per key bounded by the 41-minute
  // horizon; the outer flush adds no state, only an eviction-time
  // emit. Watermark delay tunes the latency/completeness trade.
  def q167StreamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val a = EventsStreaming.readEventsStream(ss, dir)
      .select(col("event_id").as("event_a"), col("user_id"), col("ts").as("ts_a"))
      .withWatermark("ts_a", "30 minutes")
    val b = EventsStreaming.readEventsStream(ss, dir)
      .select(col("event_id").as("event_b"), col("user_id").as("user_b"),
        col("ts").as("ts_b"))
      .withWatermark("ts_b", "30 minutes")
    val joined = a.join(b,
      col("user_id") === col("user_b") &&
        col("ts_b") >= col("ts_a") - expr("INTERVAL 1 SECOND") &&
        col("ts_b") <= col("ts_a") + expr("INTERVAL 11 MINUTES") &&
        col("ts_b").cast("long") > col("ts_a").cast("long") &&
        col("ts_b").cast("long") <= col("ts_a").cast("long") + 600,
      "leftOuter")
      .select(col("user_id"), col("event_a"), col("event_b"),
        (col("ts_b").cast("long") - col("ts_a").cast("long")).as("gap_sec"))
    EventsStreaming.runToMemory(joined, "q167_mem")
      .orderBy(col("event_a"), col("event_b"))
  }

  val q167Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |wm AS (SELECT max(us) - 1800000000 AS w FROM e),
      |matched AS (
      |  SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
      |    b.sec - a.sec AS gap_sec
      |  FROM e a JOIN e b
      |    ON a.user_id = b.user_id AND b.sec > a.sec AND b.sec <= a.sec + 600),
      |unmatched AS (
      |  SELECT a.user_id, a.event_id AS event_a,
      |    CAST(NULL AS BIGINT) AS event_b, CAST(NULL AS BIGINT) AS gap_sec
      |  FROM e a
      |  WHERE NOT EXISTS (
      |      SELECT 1 FROM e b
      |      WHERE b.user_id = a.user_id
      |        AND b.sec > a.sec AND b.sec <= a.sec + 600)
      |    AND a.us + 660000000 < (SELECT w FROM wm))
      |SELECT * FROM matched
      |UNION ALL
      |SELECT * FROM unmatched
      |ORDER BY event_a, event_b""".stripMargin

  // --------------------------------------------------------------------
  // q80 — streaming ingestion into partitioned parquet shards via
  // foreachBatch: the streaming dual of q78's batch shard writer, and
  // the file-SINK coverage the other streaming queries (memory sink)
  // don't exercise. Each micro-batch appends into one parquet
  // directory per shard (event_id % 16); after the finite source
  // drains, the oracle-checked result is the per-shard manifest
  // computed from the READ-BACK files, so the gate covers the sink
  // path end-to-end. The manifest is integer-only (count, id bounds,
  // commutative bit_xor content hash), so append order and micro-batch
  // boundaries cannot drift it.
  // Scale notes: each micro-batch OVERWRITES its own batchId-scoped
  // subdirectory (batch=<id>/shard=<k>/...), which makes retries
  // idempotent — a blind mode("append") into a shared directory is
  // only at-least-once: a batch retried after a mid-write failure
  // appends duplicate rows the checkpoint cannot undo. With
  // batch-scoped paths the checkpoint + rerun story is exactly-once.
  // No streaming state — the only shuffle is the per-batch write
  // repartition on the shard key. Output roots resolve through
  // ShardPaths (Hadoop FS API, per-query namespace — cluster-safe
  // default, no collision with q78 under the graft.shards.dir
  // override).
  val SinkShards = 16

  /** Start the shard-sink stream for `events`. Shared by q80 and the
    * multi-batch StreamingSpec run.
    */
  private[graft] def shardSinkStart(events: DataFrame, outDir: String,
      ckptDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.withColumn("shard", (col("event_id") % SinkShards).cast("int"))
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        batch.repartition(SinkShards, col("shard"))
          .write.mode("overwrite").partitionBy("shard")
          .parquet(new org.apache.hadoop.fs.Path(outDir, s"batch=$batchId").toString)
        ()
      }
      .start()

  /** Per-shard manifest of the read-back shard files (partition
    * discovery surfaces batch/shard; the manifest aggregates across
    * batches, so micro-batch boundaries cannot drift it).
    */
  private[graft] def shardManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"),
        expr("bit_xor(CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 12), 16, 10) AS BIGINT))")
          .as("content_hash"))
      .orderBy(col("shard"))

  def q80StreamShardSink(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val outDir = graft.sources.ShardPaths.resolve(ss, "q80", dir)
    val ckptDir = graft.sources.ShardPaths.resolveCheckpoint(ss, "q80", dir)
    // deterministic rerun: a kept checkpoint over a finite source would
    // skip the already-seen file and leave a stale outDir answering the
    // manifest — reset both before starting
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(ss.sessionState.newHadoopConf())
    Seq(outDir, ckptDir).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val q = shardSinkStart(EventsStreaming.readEventsStream(ss, dir), outDir, ckptDir)
    q.processAllAvailable()
    q.stop()
    shardManifest(spark, outDir)
  }

  val q80Oracle: String =
    s"""SELECT CAST(event_id % $SinkShards AS INTEGER) AS shard,
       |  COUNT(*) AS n_events,
       |  MIN(event_id) AS min_event, MAX(event_id) AS max_event,
       |  bit_xor(CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 12) AS BIGINT)) AS content_hash
       |FROM events GROUP BY 1 ORDER BY shard""".stripMargin

  // --------------------------------------------------------------------
  // q88 — STREAMING curation gate: the row-local slice of q82's
  // curation pipeline (quality composite ≥ threshold → PII scrub →
  // source-mixture filter) applied to a document STREAM via the very
  // same `Curation.rowLocalGate` function the batch pipeline uses —
  // batch/stream parity by construction, pinned by the shared oracle.
  // This is the shape of a streaming ingest front-door at 100 TB/day:
  // everything row-local runs on documents as they land (zero shuffle,
  // zero streaming state, plain projections/filters per micro-batch);
  // the stages that need cross-doc context (repetition, contamination,
  // dedup) run in the batch pipeline behind it.
  val documentsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))

  private[graft] def readDocumentsStream(spark: SparkSession, dir: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .options(options)
      .parquet(dir)

  // --------------------------------------------------------------------
  // q193 — STREAMING DSIR gate: q189's contrastive importance
  // weighting applied at INGEST. The two unigram LMs are published
  // from the reference corpus as a ONE-ROW static model frame (token→
  // count maps + corpus constants — LMs change on the corpus release
  // cadence, not per arriving row; vocabulary-bounded, so the maps
  // broadcast), and each streamed document scores ROW-LOCALLY: fold
  // over its token array accumulating q189's exact per-token contract
  // (term rounded once to 6 decimals, accumulated through exact
  // DECIMAL — so the doc weight is identical to the batch per_doc.w6
  // by construction, and the gate's w6 ≥ 0 compare sits on an exact
  // decimal; a membership flip needs a per-token ln() ulp straddle
  // AND the whole-doc sum within 1e-6 of the boundary — compounded).
  // STATELESS: the model joins through the 1-row opaque key, no
  // watermark, no state store — the ingest-gate discipline of
  // q88/q181 extended from row-local predicates to model-based
  // scoring. Emitted columns are integers/strings only.
  // Scale notes (100 TB/day): the model row is vocabulary-bounded
  // (production 100k-entry maps ≈ MBs — still one broadcast row); the
  // stream side never shuffles; per-row cost is |tokens| map probes.
  /** The ONE-ROW DSIR model frame (token→count maps + corpus
    * constants, with the opaque join key) — shared by q193's gate and
    * q194's admission stack.
    */
  private def dsirModel(ss: SparkSession, dir: String): DataFrame = {
    val tgt = graft.operators.TextAnalysis.DsirTargetLang
    val g = graft.sources.Tables.documents(ss, dir)
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
    val cr = g.groupBy(col("tok")).agg(count(lit(1)).as("cr"))
    val ct = g.filter(col("lang") === tgt)
      .groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    cr.join(ct, Seq("tok"), "left_outer")
      .agg(
        map_from_entries(collect_list(struct(col("tok"), col("cr"))))
          .as("crm"),
        map_from_entries(collect_list(struct(col("tok"),
          coalesce(col("ct"), lit(0L))))).as("ctm"),
        sum(col("cr")).as("n_r"),
        coalesce(sum(col("ct")), lit(0L)).as("n_t"),
        count(lit(1)).as("vsz"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_r")))
  }

  /** Row-local DSIR weight: fold the token array through q189's exact
    * per-token contract (term rounded once to 6 decimals, accumulated
    * through exact DECIMAL) against the model columns in scope.
    */
  private def dsirW6Fold(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val zero = lit(BigDecimal(0)).cast(DecimalType(28, 6))
    aggregate(toks, zero, (acc, t) =>
      // re-cast: decimal + decimal widens to (29,6) and the fold
      // accumulator must keep its declared type; magnitudes are
      // |term| ≤ ~60 so the narrow cast is always exact
      (acc + round(
        log(coalesce(element_at(col("ctm"), t), lit(0L)) + lit(1L)) -
          log(col("n_t") + col("vsz")) -
          log(coalesce(element_at(col("crm"), t), lit(0L)) + lit(1L)) +
          log(col("n_r") + col("vsz")), 6).cast(DecimalType(28, 6)))
        .cast(DecimalType(28, 6)))
  }

  def q193StreamDsirGate(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val scored = readDocumentsStream(ss, dir)
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_chars")))
      .join(dsirModel(ss, dir), Seq("_k"))
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .withColumn("w6", dsirW6Fold(col("toks")))
    val kept = scored.filter(col("w6") >= 0)
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_toks"))
    EventsStreaming.runToMemory(kept, "q193_mem")
      .orderBy(col("doc_id"))
  }

  /** The batch dual: q189's per_doc chain gated at w6 >= 0. */
  val q193Oracle: String =
    s"""WITH ${graft.operators.TextAnalysis.DsirPerDocCtes}
       |SELECT doc_id, lang, n_toks FROM per_doc
       |WHERE w6 >= 0 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q194 — the COMPLETE streaming ADMISSION STACK: every stateless
  // ingest gate this engine ships, chained in ONE pass over the
  // arriving stream — (1) row-local quality score ≥ min, PII scrub,
  // deterministic mixture downsampling (q88's rowLocalGate semantics,
  // column-preserving so the later gates' quasi-identifiers ride
  // through); (2) k-anonymity cohort gate (q181's broadcast cohort
  // probe); (3) DSIR two-LM importance gate (q193's model fold) — run
  // on the SCRUBBED text, i.e. the text that would actually be
  // trained on (scrub placeholders are OOV to the raw-corpus LMs and
  // take the add-1 OOV term — identical in both engines). Only the
  // stateful stages (dedup, repetition, contamination) are excluded:
  // they need shuffles or state and live in q153/q82.
  // STATELESS throughout: two broadcast probes + row-local
  // projections/filters — no watermark, no state store; per-row cost
  // is two hash probes + |tokens| map lookups. This is the front door
  // a 100 TB/day ingest runs before anything shuffles.
  def q194StreamAdmissionStack(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation.{AnonK, EmailRe, IdRe, QualityMin}
    val ss = EventsStreaming.streamSession(spark)
    // stage 1 — rowLocalGate's exact stages, keeping lang/n_chars
    val gated = readDocumentsStream(ss, dir)
      .filter(graft.operators.Curation.qualityScoreCol >= QualityMin)
      .withColumn("text",
        regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          IdRe, "<ID>"))
      .filter(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("text"))), 1, 4) <
        when(col("source") === "src0", "8000")
          .when(col("source") === "src1", "4000").otherwise("2000"))
    // stage 2 — k-anonymity cohorts from the reference corpus
    val cohorts = graft.sources.Tables.documents(ss, dir)
      .select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("cohort_n"))
      .filter(col("cohort_n") >= AnonK)
      .drop("cohort_n")
    val anon = gated.withColumn("len_bucket", expr("n_chars div 100"))
      .join(broadcast(cohorts), Seq("lang", "source", "len_bucket"))
    // stage 3 — DSIR gate on the scrubbed text
    val admitted = anon
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_chars")))
      .join(dsirModel(ss, dir), Seq("_k"))
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .withColumn("w6", dsirW6Fold(col("toks")))
      .filter(col("w6") >= 0)
      .select(col("doc_id"), col("lang"), col("source"),
        size(col("toks")).cast("long").as("n_toks"))
    EventsStreaming.runToMemory(admitted, "q194_mem")
      .orderBy(col("doc_id"))
  }

  val q194Oracle: String = {
    import graft.operators.Curation.{AnonK, EmailRe, IdRe, QualityMin}
    s"""WITH gated AS (
       |  SELECT doc_id, lang, source, n_chars, text FROM (
       |    SELECT doc_id, lang, source, n_chars,
       |      regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
       |        '$IdRe', '<ID>', 'g') AS text
       |    FROM (
       |      SELECT doc_id, lang, source, n_chars, text,
       |        len(string_split(text, ' ')) AS n_tokens,
       |        len(list_distinct(string_split(text, ' '))) AS n_uniq,
       |        len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g'))
       |          AS punct
       |      FROM documents)
       |    WHERE round(0.4 * least(1.0, n_tokens / 100.0)
       |        + 0.4 * (CAST(n_uniq AS DOUBLE) / n_tokens)
       |        + 0.2 * (1.0 - CAST(punct AS DOUBLE) / n_chars), 6)
       |      >= $QualityMin)
       |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 4) <
       |    CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '4000'
       |      ELSE '2000' END),
       |cohorts AS (
       |  SELECT lang, source, n_chars // 100 AS len_bucket,
       |    count(*) AS cohort_n
       |  FROM documents GROUP BY 1, 2, 3),
       |anon AS (
       |  SELECT g.* FROM gated g
       |  JOIN cohorts c ON g.lang = c.lang AND g.source = c.source
       |    AND g.n_chars // 100 = c.len_bucket AND c.cohort_n >= $AnonK),
       |${graft.operators.TextAnalysis.DsirModelCtes},
       |sg AS (
       |  SELECT doc_id, lang, source, tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (
       |    SELECT doc_id, lang, source,
       |      unnest(string_split(lower(trim(text)), ' ')) AS tok
       |    FROM anon)
       |  GROUP BY 1, 2, 3, 4),
       |sterms AS (
       |  SELECT sg.doc_id, sg.lang, sg.source, sg.c,
       |    CAST(round(
       |      ln(COALESCE(ct.ct, 0) + 1) - ln(n_t + vsz) -
       |      ln(COALESCE(cr.cr, 0) + 1) + ln(n_r + vsz), 6)
       |      AS DECIMAL(28,6)) AS term
       |  FROM sg LEFT JOIN cr USING (tok) LEFT JOIN ct USING (tok),
       |    rconst, tconst),
       |sw AS (
       |  SELECT doc_id, lang, source, sum(term * c) AS w6,
       |    CAST(sum(c) AS BIGINT) AS n_toks
       |  FROM sterms GROUP BY 1, 2, 3)
       |SELECT doc_id, lang, source, n_toks FROM sw
       |WHERE w6 >= 0 ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------
  // q181 — STREAMING privacy gate: q168's k-anonymity suppression
  // applied at INGEST. The cohort statistics are published from the
  // reference corpus as a static frame (the same split a production
  // gate uses — cohort sizes change on the corpus release cadence, not
  // per arriving row), and each streamed document passes iff its
  // quasi-identifier tuple joins a cohort of size >= K. The
  // stream-static inner equi-join is STATELESS — no watermark, no
  // state store — which is exactly why the gate belongs at ingest:
  // per-row cost is one broadcast-hash probe.
  // Scale notes (100 TB/day): the static side is cohort-cardinality
  // (bounded by the quasi-id space) and broadcasts; the stream side
  // never shuffles. Oracle = q168's batch semantics, since each doc
  // arrives exactly once.
  def q181StreamPrivacyGate(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val cohorts = graft.sources.Tables.documents(ss, dir)
      .select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("cohort_n"))
      .filter(col("cohort_n") >= graft.operators.Curation.AnonK)
    val arriving = readDocumentsStream(ss, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
    val gated = arriving.join(broadcast(cohorts),
      Seq("lang", "source", "len_bucket"))
    EventsStreaming.runToMemory(gated, "q181_mem")
      .select(col("doc_id"), col("lang"), col("source"), col("len_bucket"),
        col("cohort_n"))
      .orderBy(col("doc_id"))
  }

  /** Batch/stream parity: q168's oracle, verbatim. */
  val q181Oracle: String = graft.operators.Curation.q168Oracle

  // --------------------------------------------------------------------
  // q203 — STREAMING SEMANTIC WATCHLIST: the embedding-space sibling of
  // the n-gram contamination gate (q67) run at INGEST — every arriving
  // document is compared against a bounded watchlist of benchmark
  // vectors (the doc_id % 97 slice, q67's benchmark convention) and
  // every (doc, watchlist) pair inside the semantic neighbourhood
  // (exact cosine >= 0.3) is flagged for review. Two stream-static
  // joins, both STATELESS: the doc→vector lookup is an equi-join on
  // the aligned id, and the watchlist comparison is a bounded fan-out
  // join through the 1-row opaque key (|watchlist| rows per arriving
  // doc — benchmark sets are bounded by construction, the q181 cohort
  // argument). All scoring is the integer-scaled exact dot product
  // (DotProductLong) with one rounded division.
  // Scale notes (100 TB/day): the watchlist broadcasts (bounded); the
  // vector lookup is the only shuffle-shaped piece and in production
  // rides the aligned storage key; per-row cost is |watchlist| codegen
  // dot products. Nothing here windows, watermarks, or keeps state.
  private val WatchTau = 0.3

  def q203StreamSemanticWatchlist(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.DotProductLong.dot_product_long(a, b)
    val sv = transform(col("embedding"),
      x => round(x.cast("double") * 1000000).cast("bigint"))
    val vecs = graft.sources.Tables.embeddings(ss, dir)
      .select(col("vec_id"), sv.as("sv"))
      .withColumn("nrm", dot(col("sv"), col("sv")))
    val watch = vecs.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("bench_id"), col("sv").as("wsv"),
        col("nrm").as("wnrm"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("bench_id")))
    val flagged = readDocumentsStream(ss, dir)
      .select(col("doc_id"))
      .join(vecs.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("doc_id")))
      .join(broadcast(watch), Seq("_k"))
      .filter(col("doc_id") =!= col("bench_id"))
      .withColumn("cos", round(
        dot(col("sv"), col("wsv")).cast("double") /
          sqrt(col("nrm").cast("double")) / sqrt(col("wnrm").cast("double")), 6))
      .filter(col("cos") >= WatchTau)
      .select(col("doc_id"), col("bench_id"), col("cos"))
    EventsStreaming.runToMemory(flagged, "q203_mem")
      .orderBy(col("doc_id"), col("bench_id"))
  }

  val q203Oracle: String =
    s"""WITH sv AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS s
       |  FROM embeddings),
       |b AS (
       |  SELECT vec_id, s,
       |    CAST(list_sum(list_transform(generate_series(1, len(s)), i -> s[i] * s[i])) AS BIGINT) AS nrm
       |  FROM sv),
       |w AS (SELECT vec_id AS bench_id, s AS ws, nrm AS wnrm FROM b WHERE vec_id % 97 = 0),
       |c AS (
       |  -- the documents join encodes the stream-side contract: only
       |  -- vectors whose doc arrives on the documents stream are
       |  -- scored (doc_id = vec_id is the fixture alignment, but a
       |  -- dangling embeddings row must NOT produce a flag)
       |  SELECT d.vec_id AS doc_id, w.bench_id,
       |    round(CAST(list_sum(list_transform(generate_series(1, len(d.s)),
       |      i -> d.s[i] * w.ws[i])) AS BIGINT)
       |      / sqrt(CAST(d.nrm AS DOUBLE)) / sqrt(CAST(w.wnrm AS DOUBLE)), 6) AS cos
       |  FROM b d
       |  JOIN documents doc ON d.vec_id = doc.doc_id
       |  CROSS JOIN w
       |  WHERE d.vec_id <> w.bench_id)
       |SELECT doc_id, bench_id, cos FROM c
       |WHERE cos >= $WatchTau
       |ORDER BY doc_id, bench_id""".stripMargin

  // --------------------------------------------------------------------
  // q183 — STREAMING rate-anomaly monitor: q176's integer 3σ contract
  // evaluated over a streaming hourly count. The stream maintains the
  // per-(type, hour) counts (q45's windowed-agg machinery, Complete
  // mode on the finite fixture); the per-type baseline statistics are
  // static (they change on the monitoring recalibration cadence, not
  // per event) and the σ test joins them against the MATERIALIZED
  // window counts downstream of the sink — where an alerting consumer
  // reads. The flag is the same all-integer rearrangement as q176, so
  // batch and stream agree bit-for-bit and the oracle is q176's
  // verbatim.
  // Scale notes (100 TB/day): streaming state = one count per open
  // (type, hour) window — watermark-bounded in the production append
  // form; the baseline join is group-cardinality and broadcasts.
  def q183StreamRateMonitor(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val hourly = EventsStreaming.readEventsStream(ss, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("hour_start_sec"),
        col("event_type"), col("cnt"))
    val counts = EventsStreaming.runToMemory(hourly, "q183_mem",
      OutputMode.Complete)
    // the baseline comes from the BATCH table (the published reference
    // statistics a monitor recalibrates against), not from the memory
    // sink — which also avoids the MemoryPlan self-join, whose leaves
    // fail analyzer reference deduplication
    val stats = graft.sources.Tables.events(ss, dir)
      .select(col("event_type"), expr("CAST(ts AS LONG) div 3600").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("bcnt"))
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n_hours"), sum(col("bcnt")).as("s1"),
        sum(col("bcnt") * col("bcnt")).as("s2"))
    counts.join(broadcast(stats), Seq("event_type"))
      .filter(
        (col("n_hours") * col("cnt") - col("s1")) *
          (col("n_hours") * col("cnt") - col("s1")) >
          lit(9L) * (col("n_hours") * col("s2") - col("s1") * col("s1")))
      .select(col("event_type"), col("hour_start_sec"), col("cnt"),
        col("n_hours"))
      .orderBy(col("event_type"), col("hour_start_sec"))
  }

  /** Batch/stream parity: q176's oracle, verbatim. */
  val q183Oracle: String = graft.queries.EventsQueries.q176Oracle

  def q88StreamCurationGate(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val gated = graft.operators.Curation.rowLocalGate(readDocumentsStream(ss, dir))
    EventsStreaming.runToMemory(gated, "q88_mem")
      .orderBy(col("doc_id"))
  }

  /** The row-local gate (quality ≥ min → scrub → mixture) as DuckDB
    * CTEs ending in `gated(doc_id, source, text)` — shared by q88's
    * direct oracle and q153's manifest oracle so the gate semantics
    * are written exactly once on the oracle side too.
    */
  private[graft] val gateCtes: String = {
    import graft.operators.Curation.{QualityMin, EmailRe, IdRe}
    s"""qual AS (
       |  SELECT doc_id, source, text FROM (
       |    SELECT doc_id, source, text,
       |      len(string_split(text, ' ')) AS n_tokens,
       |      len(list_distinct(string_split(text, ' '))) AS n_uniq,
       |      len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct,
       |      n_chars
       |    FROM documents)
       |  WHERE round(0.4 * least(1.0, n_tokens / 100.0)
       |      + 0.4 * (CAST(n_uniq AS DOUBLE) / n_tokens)
       |      + 0.2 * (1.0 - CAST(punct AS DOUBLE) / n_chars), 6) >= $QualityMin),
       |scrubbed AS (
       |  SELECT doc_id, source,
       |    regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
       |      '$IdRe', '<ID>', 'g') AS text
       |  FROM qual),
       |gated AS (
       |  SELECT doc_id, source, text FROM scrubbed
       |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 4) <
       |    CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '4000'
       |      ELSE '2000' END)""".stripMargin
  }

  val q88Oracle: String =
    s"""WITH $gateCtes
       |SELECT doc_id, source, text FROM gated
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q91 — STREAM-STATIC enrichment join: the third streaming join mode
  // (q73 covers stream-stream, q88 covers stateless transforms) — the
  // fact stream enriched against the star schema's dimension chain
  // (customer ⋈ nation) as events land. The static side is a plain
  // batch plan re-resolved per micro-batch, so dimension updates between
  // batches are picked up automatically, and Spark broadcasts it per
  // batch when small (the dims-broadcast/facts-stream discipline the
  // warehouse tier enforces, now in its streaming form). Stateless: no
  // watermark, no state store — the join needs no buffering because
  // the static side is complete by definition.
  def q91StreamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val events = EventsStreaming.readEventsStream(ss, dir)
    val dims = graft.sources.Tables.customer(ss, dir)
      .join(graft.sources.Tables.nation(ss, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_name"))
    val enriched = events.join(dims, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("sec"),
        col("c_mktsegment").as("mktsegment"), col("n_name").as("nation"))
    EventsStreaming.runToMemory(enriched, "q91_mem")
      .orderBy(col("event_id"))
  }

  val q91Oracle: String =
    """SELECT event_id, user_id, event_type,
      |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
      |  c_mktsegment AS mktsegment, n_name AS nation
      |FROM events
      |JOIN customer ON user_id = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q103 — streaming dedup against a STATIC corpus index: the ingest
  // front-door's dedup stage. New documents stream in (the doc_id%3=0
  // delta, as q85) and are anti-joined per micro-batch against the
  // accepted corpus's min-shingle-fingerprint index (q40's candidate
  // key — near-dups collide on it where exact md5 never would) — a
  // stream-static LEFT ANTI join, stateless on the stream side because
  // the static side is complete by definition (contrast q72/q84,
  // which need state to dedup the stream against ITSELF). Fingerprint
  // matching is the aggressive drop-on-candidate policy; a verify-
  // then-drop pipeline routes matches through q85's exact-Jaccard
  // batch path instead. At 100 TB the index is a stored table
  // re-resolved per batch (picks up the corpus as it grows) and only
  // 32-byte fingerprints travel.
  private def shingleFingerprint: org.apache.spark.sql.Column =
    graft.functions.MinShingleMd5.min_shingle_md5(
      split(lower(trim(col("text"))), " "), 3)

  def q103StreamDedupStatic(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val index = graft.sources.Tables.documents(ss, dir)
      .filter(col("doc_id") % 3 =!= 0)
      .select(shingleFingerprint.as("fp")).distinct()
    val kept = readDocumentsStream(ss, dir)
      .filter(col("doc_id") % 3 === 0)
      .withColumn("fp", shingleFingerprint)
      .join(index, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    EventsStreaming.runToMemory(kept, "q103_mem")
      .orderBy(col("doc_id"))
  }

  val q103Oracle: String =
    """WITH pre AS (
      |  SELECT doc_id, lower(trim(text)) AS norm,
      |    string_split(lower(trim(text)), ' ') AS toks
      |  FROM documents),
      |fp AS (
      |  SELECT doc_id,
      |    list_aggregate(list_transform(
      |      CASE WHEN len(toks) >= 3
      |        THEN list_transform(generate_series(1, len(toks) - 2),
      |               i -> array_to_string(toks[i:i+2], ' '))
      |        ELSE [norm] END,
      |      s -> md5(s)), 'min') AS f
      |  FROM pre)
      |SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id % 3 = 0
      |  AND doc_id NOT IN (
      |    SELECT a.doc_id FROM fp a
      |    WHERE a.doc_id % 3 = 0
      |      AND a.f IN (SELECT f FROM fp WHERE doc_id % 3 <> 0))
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q122 — per-user running totals on the transformWithState v2
  // arbitrary-state API (Spark 4.x, RocksDB-backed typed ValueState) —
  // the modern replacement for flatMapGroupsWithState (q46's API), and
  // the state-evolution story: named state variables with their own
  // encoders and TTL instead of one opaque state blob. Each micro-batch
  // emits the updated cumulative row per active user; on the finite
  // single-batch fixture that is exactly the batch per-user aggregate,
  // which the oracle expresses. StreamStateV2Spec drives the same
  // processor across REAL micro-batch boundaries and checks the last
  // emission per user still equals the batch totals.
  // Scale notes (100 TB): state is one small fixed-width row per user
  // partitioned by the key shuffle; RocksDB spills it off-heap — this
  // is the API for state that outgrows the HDFS-backed store. The
  // decimal accumulation keeps the sum exact in any arrival order.
  def q122StreamUserTotals(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.stateV2Session(spark)
    val events = EventsStreaming.readEventsStream(ss, dir)
    val totals = EventsStreaming.userTotals(ss, events).toDF()
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"),
        col("first_sec"), col("last_sec"))
    EventsStreaming.runToMemory(totals, "q122_mem")
      .orderBy(col("user_id"))
  }

  val q122Oracle: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value,
      |  MIN(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS first_sec,
      |  MAX(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS last_sec
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------
  // q153 — END-TO-END streaming curation pipeline: the production
  // ingest chain q88/q84/q80 each proved one stage of, composed as ONE
  // streaming query — gate → bounded-state dedup → exactly-once shard
  // sink — and oracle-checked through the read-back manifest, the same
  // end-to-end gate q82 gives the batch pipeline.
  //   stage 1  rowLocalGate (q88's function, THE one the batch pipeline
  //            uses): quality ≥ min → PII scrub → mixture filter. Zero
  //            state, zero shuffle — pure scan-side work per batch.
  //   stage 2  dropDuplicatesWithinWatermark on doc_id (q84's bounded
  //            form): the source is staged at-least-once (every doc
  //            arrives twice — second copy in a later micro-batch, so
  //            dedup state genuinely crosses a batch boundary), and
  //            state per key lives one watermark horizon. Event time is
  //            a deterministic per-doc ingest timestamp; duplicates of
  //            a key are identical rows, so which arrival survives is
  //            immaterial — the emitted set is deterministic.
  //   stage 3  foreachBatch shard sink (q80's form): each micro-batch
  //            OVERWRITES its own batch=<id> subdirectory — idempotent
  //            on retry, exactly-once end to end.
  // The oracle replays the gate (shared gateCtes text) and aggregates
  // the same integer-only manifest; micro-batch boundaries cannot
  // drift it because the manifest is commutative across batches.
  // Scale notes (100 TB/day): this IS the ingest front-door — row-local
  // work scan-side, the only state one id per watermark horizon, the
  // only shuffle the per-batch write repartition. Everything cross-doc
  // (repetition, contamination, near-dup) stays in the batch pipeline
  // (q82) behind this door; q103 covers the stream-vs-stored-corpus
  // dedup stage of that handoff.
  val DocSinkShards = 16

  /** Deterministic per-doc ingest event time: fixture docs carry no
    * timestamp, and the watermark needs one. Seconds offset by
    * doc_id % 600 keeps it integer-exact AND bounds the spread to 10
    * minutes — strictly inside the 30-minute watermark delay at ANY
    * scale factor, so the duplicate arrivals in the second micro-batch
    * are always still covered by dedup state (an unbounded doc_id
    * offset would out-range the horizon on a large fixture and
    * re-emit evicted keys; q84's spec is where eviction itself is
    * exercised deliberately).
    */
  private def docIngestTs: org.apache.spark.sql.Column =
    timestamp_seconds(lit(1700000000L) + col("doc_id") % 600)

  /** Start the gate→dedup→shard-sink stream over `docs`. Shared by
    * q153 and the batch-parity StreamingSpec case.
    */
  private[graft] def curationSinkStart(docs: DataFrame, outDir: String,
      ckptDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    graft.operators.Curation.rowLocalGate(docs)
      .withColumn("ingest_ts", docIngestTs)
      .withWatermark("ingest_ts", "30 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
      .withColumn("shard", (col("doc_id") % DocSinkShards).cast("int"))
      .writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        batch.drop("ingest_ts")
          .repartition(DocSinkShards, col("shard"))
          .write.mode("overwrite").partitionBy("shard")
          .parquet(new org.apache.hadoop.fs.Path(outDir, s"batch=$batchId").toString)
        ()
      }
      .start()

  /** Per-shard manifest of the read-back curated shards: integer-only
    * (count, id bounds, commutative bit_xor over doc_id:text), so the
    * content hash pins the SCRUBBED text the gate emitted, across any
    * batch split.
    */
  private[graft] def curationManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 12), 16, 10) AS BIGINT))")
          .as("content_hash"))
      .orderBy(col("shard"))

  def q153StreamCurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val outDir = graft.sources.ShardPaths.resolve(ss, "q153", dir)
    val ckptDir = graft.sources.ShardPaths.resolveCheckpoint(ss, "q153", dir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(ss.sessionState.newHadoopConf())
    Seq(outDir, ckptDir).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    // at-least-once staging: copy the documents file twice into a
    // staging dir and feed it with maxFilesPerTrigger=1, so the
    // duplicate arrivals land in a LATER micro-batch than the originals
    // — the dedup state provably survives a real batch boundary (the
    // union-with-self form would put both copies in one batch).
    val stage = graft.sources.ShardPaths.resolve(ss, "q153_stage", dir)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    val raw = ss.read.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    raw.coalesce(1).write.parquet(s"$stage/a1.parquet")
    raw.coalesce(1).write.parquet(s"$stage/a2.parquet")
    val docs = ss.readStream.schema(documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$stage/*.parquet")
    val q = curationSinkStart(docs, outDir, ckptDir)
    q.processAllAvailable()
    q.stop()
    curationManifest(spark, outDir)
  }

  val q153Oracle: String =
    s"""WITH $gateCtes
       |SELECT CAST(doc_id % $DocSinkShards AS INTEGER) AS shard,
       |  COUNT(*) AS n_docs,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
       |  bit_xor(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 12) AS BIGINT)) AS content_hash
       |FROM gated GROUP BY 1 ORDER BY shard""".stripMargin

  // --------------------------------------------------------------------
  // q163 — streaming dedup with index WRITE-BACK: q103 dedups a stream
  // against a static fingerprint index; production ingest also APPENDS
  // the survivors' fingerprints so later batches (and later runs) dedup
  // against everything already admitted — the feedback loop that makes
  // the index an accumulating corpus memory. Each micro-batch:
  // (1) canonicalizes within-batch duplicates (min doc_id per md5
  // fingerprint — deterministic, unlike dropDuplicates' arbitrary
  // row), (2) anti-joins the CURRENT index — the static base PLUS
  // every prior batch's appends, (3) OVERWRITES its own batch=<id>
  // subdir in both the survivor sink and the index — idempotent on
  // retry, so the loop is exactly-once end to end. The corpus is
  // staged twice (q153's trick): the second arrival of every doc must
  // be annihilated by the fingerprints batch 1 appended, which is the
  // property a static index cannot give.
  // Scale notes (100 TB/day): the index read is a parquet scan pruned
  // to the fp column; the anti join shuffles on fp (both sides corpus-
  // scale, never broadcast); appends are partition-dir writes. At
  // production scale the index compacts on a schedule (q89's operator)
  // and the join becomes the q85 asymmetric form.
  def q163StreamIndexUpdate(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val outDir = graft.sources.ShardPaths.resolve(ss, "q163", dir)
    val idxDir = graft.sources.ShardPaths.resolve(ss, "q163_index", dir)
    val ckptDir = graft.sources.ShardPaths.resolveCheckpoint(ss, "q163", dir)
    val stage = graft.sources.ShardPaths.resolve(ss, "q163_stage", dir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(ss.sessionState.newHadoopConf())
    Seq(outDir, idxDir, ckptDir, stage).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
    val raw = ss.read.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    // static base: the corpus third already admitted before this run
    raw.filter(col("doc_id") % 3 === 0).select(md5(col("text")).as("fp"))
      .distinct().write.parquet(s"$idxDir/batch=-1")
    raw.coalesce(1).write.parquet(s"$stage/a1.parquet")
    raw.coalesce(1).write.parquet(s"$stage/a2.parquet")
    val docs = ss.readStream.schema(documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$stage/*.parquet")
    val q = docs.writeStream
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val idx = batch.sparkSession.read.parquet(idxDir).select(col("fp"))
        val fresh = batch.withColumn("fp", md5(col("text")))
          .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
          .join(idx, Seq("fp"), "left_anti")
        fresh.select(col("doc_id"), col("fp")).write.mode("overwrite")
          .parquet(new org.apache.hadoop.fs.Path(outDir, s"batch=$batchId").toString)
        fresh.select(col("fp")).write.mode("overwrite")
          .parquet(new org.apache.hadoop.fs.Path(idxDir, s"batch=$batchId").toString)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir).select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  val q163Oracle: String =
    """WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |canon AS (SELECT fp, MIN(doc_id) AS doc_id FROM fp GROUP BY fp)
      |SELECT doc_id, fp FROM canon
      |WHERE fp NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 3 = 0)
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q225 — STREAMING RAG chunk ingestion: q222's chunker applied at
  // the document stream's edge — the ingestion path a live retrieval
  // stack runs (new documents arrive, chunks + content hashes flow to
  // the vector-store writer). The transform is THE SAME row-local
  // function the batch query runs (TextAnalysis.chunked — the
  // rowLocalGate parity discipline), so the oracle is q222's
  // VERBATIM: stream output must equal the batch chunk table.
  // Scale notes (100 TB/day ingest): chunking is stateless and
  // row-local — no watermark, no state store; it parallelizes with
  // source partitions and backpressure is the only coupling.
  def q225StreamRagChunks(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val chunks = graft.operators.TextAnalysis.chunked(
      readDocumentsStream(ss, dir))
    EventsStreaming.runToMemory(chunks, "q225_mem")
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Stream-equals-batch: q222's oracle verbatim. */
  val q225Oracle: String = graft.operators.TextAnalysis.q222Oracle

  // --------------------------------------------------------------------
  // q262 — MULTIPLE-WATERMARK union: two feeds with DIFFERENT lateness
  // SLAs (a 10-minute clickstream, a 30-minute billing feed) unioned
  // into one windowed aggregate. Every earlier watermarked query
  // carries exactly one event-time column; here each branch declares
  // its OWN watermark and the engine must combine them — the default
  // `multipleWatermarkPolicy = min` advances the GLOBAL watermark only
  // as fast as the laggiest feed, which is the only safe choice for an
  // append-mode aggregate over the union (a `max` policy would close
  // windows the slow feed can still legally write into, silently
  // dropping its stragglers — UnionWatermarkSpec pins exactly that
  // divergence, plus the two EventTimeWatermark plan nodes and the
  // min-combined watermark value in the query progress). In append
  // mode the emitted set IS the watermark decision: only windows whose
  // end the combined watermark passed are in the output, so the oracle
  // replays the policy arithmetic (least of the two per-feed
  // max-event-times minus their delays, ms-truncated) — a hash match
  // gates the policy itself, not just the aggregate.
  // Scale notes (100 TB/day): multi-source union is the production
  // shape (every pipeline fans in feeds with different SLAs); the min
  // policy means one stalled feed holds back ALL window emission —
  // the monitoring story q183 pins — and per-feed delays belong on
  // the branches, not a global worst-case watermark over the fastest
  // feed.
  def q262StreamUnionWatermarks(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    def feed(parity: Int, delay: String, name: String): DataFrame =
      EventsStreaming.readEventsStream(ss, dir)
        .filter(col("event_id") % 2 === parity)
        .withWatermark("ts", delay)
        .select(col("ts"), lit(name).as("feed"),
          col("value").cast(DecimalType(24, 6)).as("dvalue"))
    val u = feed(1, "10 minutes", "click")
      .unionByName(feed(0, "30 minutes", "billing"))
    val agg = u
      .groupBy(window(col("ts"), "1 hour"), col("feed"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dvalue")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("feed"),
        col("n_events"), col("sum_value"))
    EventsStreaming.runToMemory(agg, "q262_mem", OutputMode.Append)
      .orderBy(col("window_start"), col("feed"))
  }

  /** The min-policy arithmetic replayed in SQL: global watermark =
    * least over feeds of (ms-truncated max event time - feed delay);
    * append mode emits exactly the windows whose END it passed.
    */
  val q262Oracle: String =
    """WITH wm AS (
      |  SELECT LEAST(
      |    (SELECT date_trunc('milliseconds', MAX(CAST(ts AS TIMESTAMP)))
      |       - INTERVAL 10 MINUTE FROM events WHERE event_id % 2 = 1),
      |    (SELECT date_trunc('milliseconds', MAX(CAST(ts AS TIMESTAMP)))
      |       - INTERVAL 30 MINUTE FROM events WHERE event_id % 2 = 0)) AS w),
      |agg AS (
      |  SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
      |      AS window_start,
      |    CASE WHEN event_id % 2 = 1 THEN 'click' ELSE 'billing' END AS feed,
      |    COUNT(*) AS n_events,
      |    CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1, 2)
      |SELECT window_start, feed, n_events, sum_value FROM agg
      |WHERE window_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
      |ORDER BY window_start, feed""".stripMargin

  // --------------------------------------------------------------------
  // q264 — STREAMING write through the V2 sink contract: the epoch
  // form of q260's commit protocol. q80/q256 publish from
  // foreachBatch (the application owns idempotence); here the SINK
  // owns it — each micro-batch's tasks stage attempt files, the
  // driver commits ONCE per epoch, and the manifest's TXN LEDGER (a
  // per-query epoch highwater written by the same atomic rename that
  // publishes the files — Delta's txn action) makes a replayed commit
  // (a recovered query re-offers its last epoch) a no-op, which is
  // how a V2 sink upgrades Structured Streaming's at-least-once
  // batch replay to exactly-once publication (StreamingSinkSpec pins
  // the replay no-op, a checkpointed restart appending nothing, and
  // epoch+run-tagged file names that cannot collide across runs).
  // The query streams the events table into the sink keyed by
  // event_id % 53 and aggregates the read-back; the oracle
  // aggregates the source.
  // Scale notes (100 TB/day): exactly-once at the sink is THE
  // streaming-ingest contract — the ledger check at epoch granularity
  // costs one manifest header read per batch, vs reprocessing or
  // row-level dedup of a replayed epoch's full payload; ledger-in-
  // the-snapshot (not a marker file beside it) closes the crash
  // window between publishing files and recording the epoch.
  def q264StreamV2Sink(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val root = graft.sources.ShardPaths.resolve(ss, "q264", dir)
    val ckpt = graft.sources.ShardPaths.resolveCheckpoint(ss, "q264", dir)
    // table and checkpoint are one unit: a fresh table with a stale
    // checkpoint would replay nothing and read back empty
    graft.sources.SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.sources.SinkSource.fs(ckpt)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    val keyed = EventsStreaming.readEventsStream(ss, dir)
      .select((col("event_id") % 53).as("k"), col("event_id").as("v"))
    val q = keyed.writeStream
      .format("graft.sources.SinkSource")
      .option("path", s"$root/t")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .start()
    q.processAllAvailable()
    q.stop()
    graft.sources.SinkSource.load(ss, s"$root/t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .orderBy(col("k"))
  }

  val q264Oracle: String =
    """SELECT event_id % 53 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q267 — STREAMING source over the V2 sink (the changelog read):
  // every committed manifest version is an OFFSET, and a micro-batch
  // reads exactly the files the end version lists beyond the start
  // version — so any table written through q260's commit protocol is
  // incrementally consumable with no separate queue or change log
  // (Delta-CDF's shape: the table IS the feed). This is the
  // registry's first custom MicroBatchStream — every other stream
  // reads files through the engine's file source; here the CONNECTOR
  // owns offsets, batch planning, and replay (SinkCdcSpec pins
  // version-delta batches — the second batch's input-row count is
  // exactly the appended delta — and checkpointed offset recovery
  // re-reading nothing). The query builds a two-commit history (base,
  // then a late delta), streams the table from version 0, and
  // aggregates in Complete mode; the oracle aggregates the source.
  // Scale notes (100 TB/day): downstream consumers (index builders,
  // feature pipelines) tail the corpus table this way — per-batch
  // work is proportional to the DELTA's files, never the table, and
  // a consumer restart resumes from its checkpointed version instead
  // of rescanning history.
  def q267StreamSinkCdc(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val root = graft.sources.ShardPaths.resolve(ss, "q267", dir)
    val ckpt = graft.sources.ShardPaths.resolveCheckpoint(ss, "q267", dir)
    graft.sources.SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.sources.SinkSource.fs(ckpt)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    def keyed(pred: org.apache.spark.sql.Column) =
      graft.sources.Tables.events(ss, dir).filter(pred)
        .select((col("event_id") % 41).as("k"), col("event_id").as("v"))
        .repartition(8, col("k"))
    graft.sources.SinkSource.write(keyed(col("event_id") % 4 =!= 0),
      s"$root/t", overwrite = true)                          // version 1
    graft.sources.SinkSource.write(keyed(col("event_id") % 4 === 0),
      s"$root/t", overwrite = false)                         // version 2
    val stream = ss.readStream.format("graft.sources.SinkSource")
      .option("path", s"$root/t").load()
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
    val q = stream.writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("q267_mem").start()
    q.processAllAvailable()
    q.stop()
    ss.table("q267_mem").orderBy(col("k"))
  }

  val q267Oracle: String =
    """SELECT event_id % 41 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q272 — ADMISSION CONTROL on the changelog source
  // ([[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]],
  // `maxVersionsPerTrigger`): the engine asks the connector for the
  // next batch's END offset given the start and a READ LIMIT, so a
  // consumer that fell behind a 4-commit backlog drains it in 4
  // BOUNDED one-version batches instead of one unbounded catch-up
  // batch — the connector-side contract under Kafka's
  // maxOffsetsPerTrigger and the file source's maxFilesPerTrigger.
  // reportLatestOffset still reports the TRUE head, so progress
  // telemetry shows lag while admission paces work. SinkRateLimitSpec
  // pins one-version batches (4 non-empty batches, each exactly one
  // commit's rows), the unlimited contrast (1 batch), and that the
  // limit composes with checkpointed restart. The query builds a
  // four-commit history, streams it rate-limited in Complete mode;
  // the oracle aggregates the source.
  // Scale notes (100 TB/day): an index builder restarting after a
  // weekend faces thousands of commits; unbounded catch-up is an OOM
  // or a cluster-sized spike. Bounding by VERSIONS bounds batch work
  // by ingest commits — the unit the table's own history is measured
  // in — and keeps state-store updates and sink commits amortized.
  def q272StreamRateLimit(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val root = graft.sources.ShardPaths.resolve(ss, "q272", dir)
    val ckpt = graft.sources.ShardPaths.resolveCheckpoint(ss, "q272", dir)
    graft.sources.SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.sources.SinkSource.fs(ckpt)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    def keyed(i: Int) =
      graft.sources.Tables.events(ss, dir)
        .filter(col("event_id") % 4 === i)
        .select((col("event_id") % 37).as("k"), col("event_id").as("v"))
        .repartition(8, col("k"))
    graft.sources.SinkSource.write(keyed(0), s"$root/t", overwrite = true)
    (1 to 3).foreach(i =>
      graft.sources.SinkSource.write(keyed(i), s"$root/t", overwrite = false))
    val stream = ss.readStream.format("graft.sources.SinkSource")
      .option("path", s"$root/t")
      .option("maxVersionsPerTrigger", "1").load()
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
    val q = stream.writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("q272_mem").start()
    q.processAllAvailable()
    q.stop()
    ss.table("q272_mem").orderBy(col("k"))
  }

  val q272Oracle: String =
    """SELECT event_id % 37 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q278 — STATE STORE introspection (the `statestore` /
  // `state-metadata` batch readers): a checkpointed streaming
  // aggregation's state is itself a queryable TABLE — the reader loads
  // the checkpoint's key/value rows (key = grouping columns, value =
  // the aggregation buffer) as a batch DataFrame, and the query's
  // final answer comes FROM THE STATE, not from the stream's sink.
  // The oracle aggregates the source directly, so the hash gate
  // proves state rows ≡ the aggregation they buffer — the ops
  // contract behind state debugging, state migration audits, and
  // "what does this stuck query actually hold" forensics.
  // StateReaderSpec pins the state-metadata row (operator identity,
  // partition count, batch range) and state-vs-sink equality.
  // Scale notes (100 TB): a long-running pipeline's state is often
  // the only record of what it has seen; reading it offline — at scan
  // parallelism, without stopping anything or replaying the stream —
  // is how state bloat, skewed keys, and corrupt buffers get
  // diagnosed. The reader shards by the store's own partitioning, so
  // introspection scales with state partitions like any other scan.
  def q278StreamStateReader(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val root = graft.sources.ShardPaths.resolve(ss, "q278", dir)
    val ckpt = graft.sources.ShardPaths.resolveCheckpoint(ss, "q278", dir)
    graft.sources.SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.sources.SinkSource.fs(ckpt)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    val keyed = graft.sources.Tables.events(ss, dir)
      .select((col("event_id") % 43).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    graft.sources.SinkSource.write(keyed, s"$root/t", overwrite = true)
    val q = ss.readStream.format("graft.sources.SinkSource")
      .option("path", s"$root/t").load()
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("q278_mem").start()
    q.processAllAvailable()
    q.stop()
    // the answer comes from the CHECKPOINT'S STATE, not the sink
    ss.read.format("statestore").load(ckpt)
      .select(col("key.k").as("k"), col("value.count").as("n_rows"),
        col("value.sum").as("sum_v"))
      .orderBy(col("k"))
  }

  val q278Oracle: String =
    """SELECT event_id % 43 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q281 — EVENT-TIME TIMERS on transformWithState
  // ([[EventsStreaming.InactivityCloseProcessor]]): the processor
  // emits NOTHING on data arrival — it folds rows into ValueState and
  // re-arms one timer at `last event time + gap`; the ENGINE invokes
  // handleExpiredTimer when the WATERMARK passes that horizon, and
  // only that callback emits (the push-based half of arbitrary state
  // that q122's ValueState processor never exercises: time progress,
  // not data arrival, drives output). Batch boundaries are made
  // DETERMINISTIC by pacing the changelog source one version per
  // trigger (q272's admission control): version 1 delivers every
  // user's events and arms their timers; version 2 is a single
  // far-future flush row whose watermark advance fires them all —
  // the emitted inactivity closes ARE the per-user event counts and
  // last-seen times, which the oracle recomputes from the source.
  // TimerSpec pins the no-emit-before-expiry contract, the re-arm
  // (stale timers deleted), and state cleanup after close.
  // Scale notes (100 TB/day): inactivity timeouts, SLA alarms, and
  // session closes need the engine to call YOU on time progress —
  // polling state with sentinel rows per key does not scale past a
  // few thousand keys, timers shard with the state store.
  def q281StreamTimers(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.stateV2Session(spark)
    val root = graft.sources.ShardPaths.resolve(ss, "q281", dir)
    val ckpt = graft.sources.ShardPaths.resolveCheckpoint(ss, "q281", dir)
    graft.sources.SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.sources.SinkSource.fs(ckpt)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    val keyed = graft.sources.Tables.events(ss, dir)
      .select((col("event_id") % 31).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    graft.sources.SinkSource.write(keyed, s"$root/t", overwrite = true)
    import ss.implicits._
    graft.sources.SinkSource.write(
      Seq((-1L, 9000000000L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = false) // the flush version
    val timed = ss.readStream.format("graft.sources.SinkSource")
      .option("path", s"$root/t")
      .option("maxVersionsPerTrigger", "1").load()
      // +1000s shift: the initial watermark is epoch 0 and a row AT
      // the watermark counts as late — v=0 (a real event id) must not
      // sit on that boundary. The shift is uniform, so gaps, timer
      // order, and the flush all translate with it.
      .select(col("k"), col("v").as("sec"),
        timestamp_seconds(col("v") + 1000).as("ts"))
      .withWatermark("ts", "10 seconds")
    val q = EventsStreaming.inactivityCloses(ss, timed, gapMs = 60000L)
      .toDF()
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("q281_mem").start()
    q.processAllAvailable()
    q.stop()
    ss.table("q281_mem").filter(col("k") >= 0)
      .select(col("k"), col("n_events"), col("last_sec"))
      .orderBy(col("k"))
  }

  val q281Oracle: String =
    """SELECT event_id % 31 AS k, COUNT(*) AS n_events,
      |  CAST(MAX(event_id) AS BIGINT) AS last_sec
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q282 — changelog BOOTSTRAP (`startingVersion`): a NEW consumer of
  // a long-lived table must not replay its whole past — the option
  // starts the changelog AT a chosen version (Delta's startingVersion
  // / Kafka's startingOffsets contract), and the checkpoint still owns
  // resumption afterwards (the option is consulted only when no
  // checkpoint exists — StartingVersionSpec pins that a restart
  // ignores it, plus the boundary semantics: version n is INCLUDED,
  // history before it never read). The query builds a three-commit
  // history, subscribes from version 2, and aggregates; the oracle
  // reproduces versions 2–3's slices.
  // Scale notes (100 TB): a year-old corpus table has thousands of
  // commits; an index builder deployed today cares about the table
  // FROM NOW (or from the last compaction) — bootstrap-at-version
  // turns onboarding from a full-history replay into a pointer.
  def q282StreamStartingVersion(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val root = graft.sources.ShardPaths.resolve(ss, "q282", dir)
    val ckpt = graft.sources.ShardPaths.resolveCheckpoint(ss, "q282", dir)
    graft.sources.SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.sources.SinkSource.fs(ckpt)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    def keyed(i: Int) =
      graft.sources.Tables.events(ss, dir)
        .filter(col("event_id") % 3 === i)
        .select((col("event_id") % 23).as("k"), col("event_id").as("v"))
        .repartition(8, col("k"))
    graft.sources.SinkSource.write(keyed(0), s"$root/t", overwrite = true)
    graft.sources.SinkSource.write(keyed(1), s"$root/t", overwrite = false)
    graft.sources.SinkSource.write(keyed(2), s"$root/t", overwrite = false)
    val q = ss.readStream.format("graft.sources.SinkSource")
      .option("path", s"$root/t")
      .option("startingVersion", "2").load()
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("q282_mem").start()
    q.processAllAvailable()
    q.stop()
    ss.table("q282_mem").orderBy(col("k"))
  }

  val q282Oracle: String =
    """SELECT event_id % 23 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events WHERE event_id % 3 <> 0
      |GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q300 — STREAMING CHANGE FEED with RETRACTIONS: q267 streams the
  // sink's changelog but can only APPEND (new files per version);
  // this source streams q296's CHANGE ROWS — inserts AND
  // value-carrying deletes tagged `_change_type` — so a stateful
  // consumer can maintain RETRACTABLE state: the query keeps a live
  // per-key (COUNT, SUM) by signed aggregation (+1/-1), i.e. a
  // STREAMING materialized view that stays correct through MoR
  // DELETEs and UPDATEs (delete + insert in one commit), not just
  // appends. Offsets are manifest versions (checkpointed, resumable);
  // admission bounds catch-up batches by commits
  // (`maxVersionsPerTrigger=1` here: every commit is its own batch,
  // so the retraction provably crosses batch boundaries). A history
  // rewrite mid-stream fails the batch loudly — resync, the feed's
  // contract. New plan shape: the registry's only streaming source
  // whose batches carry signed change rows.
  // Scale notes (100 TB): a downstream consumer (feature store,
  // index, serving cache) that must TRACK a mutable corpus cannot
  // re-read it per sync; commit-grain change batches with carried
  // delete values are the only shape that keeps consumer cost
  // proportional to churn.
  def q300StreamChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val ss = EventsStreaming.streamSession(spark)
    val root = graft.sources.ShardPaths.resolve(ss, "q300", dir)
    val ckpt = graft.sources.ShardPaths.resolveCheckpoint(ss, "q300", dir)
    graft.sources.SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    graft.sources.SinkSource.fs(ckpt)
      .delete(new org.apache.hadoop.fs.Path(ckpt), true)
    def keyed(m: Long, pred: org.apache.spark.sql.Column) =
      graft.sources.Tables.events(ss, dir)
        .select((col("event_id") % 31).as("k"),
          (col("event_id") + m).as("v"))
        .filter(pred)
        .repartition(8, col("k"))
    graft.sources.SinkSource.write(keyed(0, lit(true)),
      s"$root/t", overwrite = true)                            // v1
    graft.sources.SinkSource.write(
      keyed(1000000, col("v") % 3 === 1),
      s"$root/t", overwrite = false)                           // v2
    ss.conf.set("spark.sql.catalog.graft_cdc3",
      classOf[graft.sources.SinkCatalog].getName)
    ss.conf.set("spark.sql.catalog.graft_cdc3.root", root)
    ss.conf.set("spark.sql.catalog.graft_cdc3.mor", "true")
    ss.sql("DELETE FROM graft_cdc3.t WHERE v % 7 = 2")         // v3
    ss.sql("UPDATE graft_cdc3.t SET v = v + 5000000 WHERE v % 13 = 1") // v4
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val live = graft.sources.SinkChanges
      .readStream(ss, s"$root/t", 0, Some(1))
      .select(col("k"), sign.as("s"), col("v"))
      .groupBy(col("k"))
      .agg(sum(col("s")).as("n_rows"),
        sum(col("s") * col("v")).as("sum_v"))
    val q = live.writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("q300_mem").start()
    q.processAllAvailable()
    q.stop()
    ss.table("q300_mem").filter(col("n_rows") > 0).orderBy(col("k"))
  }

  val q300Oracle: String =
    """WITH ingested AS (
      |  SELECT event_id % 31 AS k, event_id AS v FROM events
      |  UNION ALL
      |  SELECT event_id % 31, event_id + 1000000 FROM events
      |  WHERE (event_id + 1000000) % 3 = 1),
      |after_delete AS (SELECT * FROM ingested WHERE v % 7 <> 2),
      |live AS (
      |  SELECT k, CASE WHEN v % 13 = 1 THEN v + 5000000 ELSE v END AS v
      |  FROM after_delete)
      |SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
      |FROM live GROUP BY k ORDER BY k""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q300_stream_change_feed" -> q300StreamChangeFeed,
    "q282_stream_starting_version" -> q282StreamStartingVersion,
    "q281_stream_timers" -> q281StreamTimers,
    "q278_stream_state_reader" -> q278StreamStateReader,
    "q272_stream_rate_limit" -> q272StreamRateLimit,
    "q267_stream_sink_cdc" -> q267StreamSinkCdc,
    "q264_stream_v2_sink" -> q264StreamV2Sink,
    "q262_stream_union_watermarks" -> q262StreamUnionWatermarks,
    "q225_stream_rag_chunks" -> q225StreamRagChunks,
    "q153_stream_curation_pipeline" -> q153StreamCurationPipeline,
    "q163_stream_index_update" -> q163StreamIndexUpdate,
    "q122_stream_user_totals" -> q122StreamUserTotals,
    "q45_stream_hourly" -> q45StreamHourly,
    "q46_stream_sessions" -> q46StreamSessions,
    "q146_stream_session_window" -> q146StreamSessionWindow,
    "q151_stream_hopping" -> q151StreamHopping,
    "q72_stream_dedup" -> q72StreamDedup,
    "q244_stream_restart" -> q244StreamRestart,
    "q250_stream_rocksdb" -> q250RocksdbState,
    "q253_stream_available_now" -> q253StreamAvailableNow,
    "q256_stream_incremental_publish" -> q256StreamIncrementalPublish,
    "q73_stream_join" -> q73StreamJoin,
    "q167_stream_outer_join" -> q167StreamOuterJoin,
    "q181_stream_privacy_gate" -> q181StreamPrivacyGate,
    "q183_stream_rate_monitor" -> q183StreamRateMonitor,
    "q193_stream_dsir_gate" -> q193StreamDsirGate,
    "q194_stream_admission_stack" -> q194StreamAdmissionStack,
    "q203_stream_semantic_watchlist" -> q203StreamSemanticWatchlist,
    "q80_stream_shard_sink" -> q80StreamShardSink,
    "q84_stream_dedup_watermark" -> q84StreamDedupWatermark,
    "q88_stream_curation_gate" -> q88StreamCurationGate,
    "q91_stream_enrich" -> q91StreamEnrich,
    "q103_stream_dedup_static" -> q103StreamDedupStatic)

  def oracleSql: Map[String, String] = Map(
    "q300_stream_change_feed" -> q300Oracle,
    "q282_stream_starting_version" -> q282Oracle,
    "q281_stream_timers" -> q281Oracle,
    "q278_stream_state_reader" -> q278Oracle,
    "q272_stream_rate_limit" -> q272Oracle,
    "q267_stream_sink_cdc" -> q267Oracle,
    "q264_stream_v2_sink" -> q264Oracle,
    "q262_stream_union_watermarks" -> q262Oracle,
    "q225_stream_rag_chunks" -> q225Oracle,
    "q153_stream_curation_pipeline" -> q153Oracle,
    "q163_stream_index_update" -> q163Oracle,
    "q122_stream_user_totals" -> q122Oracle,
    "q45_stream_hourly" -> q45Oracle,
    "q46_stream_sessions" -> q46Oracle,
    "q146_stream_session_window" -> q146Oracle,
    "q151_stream_hopping" -> q151Oracle,
    "q72_stream_dedup" -> q72Oracle,
    "q244_stream_restart" -> q244Oracle,
    "q250_stream_rocksdb" -> q250Oracle,
    "q253_stream_available_now" -> q253Oracle,
    "q256_stream_incremental_publish" -> q256Oracle,
    "q73_stream_join" -> q73Oracle,
    "q167_stream_outer_join" -> q167Oracle,
    "q181_stream_privacy_gate" -> q181Oracle,
    "q183_stream_rate_monitor" -> q183Oracle,
    "q193_stream_dsir_gate" -> q193Oracle,
    "q194_stream_admission_stack" -> q194Oracle,
    "q203_stream_semantic_watchlist" -> q203Oracle,
    "q80_stream_shard_sink" -> q80Oracle,
    "q84_stream_dedup_watermark" -> q84Oracle,
    "q88_stream_curation_gate" -> q88Oracle,
    "q91_stream_enrich" -> q91Oracle,
    "q103_stream_dedup_static" -> q103Oracle)
}
