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
    val got = EventsStreaming.runToMemory(spark,
      EventsStreaming.windowedAgg(stream), "win_agg",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .select("window_start", "event_type", "n_events")
    val expect = EventsQueries.q23EventWindows(spark, dir)
      .select("window_start", "event_type", "n_events")
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("streaming sessionization matches batch q24 on a single batch") {
    val stream = EventsStreaming.readEventsStream(spark, dir)
    val got = EventsStreaming.runToMemory(spark,
      EventsStreaming.sessionize(spark, stream).toDF(), "sessions")
      .select("user_id", "session_id", "n_events", "session_start_sec", "session_end_sec")
    val expect = EventsQueries.q24Sessionization(spark, dir)
      .select(col("user_id"), col("session_id").cast("long"),
        col("n_events"), col("session_start_sec"), col("session_end_sec"))
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }
}
