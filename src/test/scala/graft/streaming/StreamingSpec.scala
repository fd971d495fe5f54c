package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.EventsQueries

/** Streaming duals must agree with their oracle-checked batch forms
  * when the whole table arrives as one batch. */
class StreamingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("streaming windowed agg matches batch q23 counts") {
    val stream = EventsStreaming.readEventsStream(spark, dir)
    // complete mode: watermark append-mode would hold back the tail
    // window of a finite input; totals must still match batch exactly.
    val got = EventsStreaming.runToMemory(
      EventsStreaming.windowedAgg(stream), "win_agg",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .select("window_start", "event_type", "n_events")
    val expect = EventsQueries.q23EventWindows(spark, dir)
      .select("window_start", "event_type", "n_events")
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("sessionization state carries across micro-batches") {
    // split the events timeline in half into two files and force one
    // file per trigger: sessions that straddle the boundary emit a
    // partial row per batch under Append mode, with the SAME session id
    // because GroupState carries (nextSessionId, lastSec). Merging the
    // partials must reproduce the batch result exactly.
    val base = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    // cut INSIDE a session: the earliest same-user event pair closer
    // than the 1800s gap, so at least one session must straddle the
    // file boundary and emit partial rows from both batches
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cut = base
      .withColumn("next_sec", lead(col("ts").cast("long"), 1).over(w))
      .filter(col("next_sec") - col("ts").cast("long") > 0 &&
        col("next_sec") - col("ts").cast("long") <= 1800)
      .orderBy(col("ts")).select(col("ts")).first().getTimestamp(0)
    val tmpDir = s"${sys.props("java.io.tmpdir")}/graft_stream_batches_${System.nanoTime()}"
    base.filter(col("ts") <= cut).coalesce(1).write.parquet(s"$tmpDir/b1.parquet")
    base.filter(col("ts") > cut).coalesce(1).write.parquet(s"$tmpDir/b2.parquet")
    // file-stream ordering is by modification time: push b2 later
    new java.io.File(tmpDir).listFiles().filter(_.getName == "b2.parquet")
      .flatMap(_.listFiles()).foreach(f => f.setLastModified(System.currentTimeMillis() + 60000))

    val stream = spark.readStream
      .schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmpDir/*.parquet")
    val got = EventsStreaming.runToMemory(
      EventsStreaming.sessionize(spark, stream).toDF(), "sessions_mb")
    // partial session rows merge on (user_id, session_id)
    val merged = got.groupBy(col("user_id"), col("session_id"))
      .agg(sum(col("n_events")).as("n_events"),
        min(col("session_start_sec")).as("session_start_sec"),
        max(col("session_end_sec")).as("session_end_sec"))
    val expect = EventsQueries.q24Sessionization(spark, dir)
      .select(col("user_id"), col("session_id").cast("long"),
        col("n_events"), col("session_start_sec"), col("session_end_sec"))
    assert(got.count() > expect.count(), "expected straddling sessions to emit partials")
    assert(merged.count() == expect.count())
    assert(merged.exceptAll(expect).isEmpty && expect.exceptAll(merged).isEmpty)
  }

  test("streaming dedup suppresses duplicates arriving in a LATER micro-batch") {
    // the same file delivered twice, one file per trigger: the second
    // batch is 100% duplicates and must emit nothing — the dedup state
    // (one entry per event_id) survives across batches
    val base = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val tmpDir = s"${sys.props("java.io.tmpdir")}/graft_stream_dedup_${System.nanoTime()}"
    base.coalesce(1).write.parquet(s"$tmpDir/d1.parquet")
    base.coalesce(1).write.parquet(s"$tmpDir/d2.parquet")
    new java.io.File(tmpDir).listFiles().filter(_.getName == "d2.parquet")
      .flatMap(_.listFiles()).foreach(f => f.setLastModified(System.currentTimeMillis() + 60000))
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmpDir/*.parquet")
    val got = EventsStreaming.runToMemory(
      stream.dropDuplicates("event_id"), "dedup_mb")
    assert(got.count() == base.count())
    assert(got.select(col("event_id")).distinct().count() == base.count())
  }

  test("q167 outer join emits all three row classes at the watermark gate") {
    val out = StreamingQueries.q167StreamOuterJoin(spark, dir)
    val rows = out.collect()
    val matched = rows.count(r => !r.isNullAt(2))
    val nullEmitted = rows.count(r => r.isNullAt(2))
    // the inner rows must be exactly q73's result
    val inner = StreamingQueries.q73StreamJoin(spark, dir).collect()
    assert(matched === inner.length,
      s"outer join's matched set $matched != inner join ${inner.length}")
    assert(nullEmitted > 0, "watermark flush emitted no outer rows")
    // the held-back class: unmatched events inside the final 41-minute
    // horizon stay in state and must NOT appear
    val emittedA = rows.map(_.getLong(1)).toSet
    val allEvents = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    val heldBack = allEvents -- emittedA
    assert(heldBack.nonEmpty,
      "every event emitted — the watermark gate is not holding the tail")
  }

  test("stream shard sink writes real shard dirs and reruns deterministically") {
    val a = StreamingQueries.q80StreamShardSink(spark, dir).collect()
    assert(a.nonEmpty)
    // the manifest matches the batch aggregate over the source table
    val expect = graft.sources.Tables.events(spark, dir)
      .groupBy((col("event_id") % StreamingQueries.SinkShards).cast("int").as("shard"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      assert(r.getAs[Long]("n_events") == expect(r.getAs[Int]("shard")),
        s"shard ${r.getAs[Int]("shard")} row count drifted from the source")
    }
    // a rerun resets checkpoint + output and reproduces the manifest
    val b = StreamingQueries.q80StreamShardSink(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("stream shuffle-partition pin is isolated from the parent session") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val ss = EventsStreaming.streamSession(spark)
    // the pin lands only in the stream's own session …
    assert(ss.conf.get("spark.sql.shuffle.partitions") ==
      EventsStreaming.StatePartitions.toString)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    // … and the parent's runtime confs (e.g. the nano-ts legacy flag the
    // events scan needs) were replicated into it
    assert(ss.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    // a full streamed query leaves the parent untouched end-to-end
    assert(StreamingQueries.q45StreamHourly(spark, dir).count() > 0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("streaming sessionization matches batch q24 on a single batch") {
    val stream = EventsStreaming.readEventsStream(spark, dir)
    val got = EventsStreaming.runToMemory(
      EventsStreaming.sessionize(spark, stream).toDF(), "sessions")
      .select("user_id", "session_id", "n_events", "session_start_sec", "session_end_sec")
    val expect = EventsQueries.q24Sessionization(spark, dir)
      .select(col("user_id"), col("session_id").cast("long"),
        col("n_events"), col("session_start_sec"), col("session_end_sec"))
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }
}
