package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.SinkSource

/** q281 — event-time timers. The oracle proves the emitted closes;
  * this spec locks the TIMER contract with a three-version
  * choreography: nothing emits on data arrival, a key active across
  * batches RE-ARMS (its stale timer is deleted — exactly one close,
  * with the cross-batch total), an idle key closes as soon as the
  * watermark passes its horizon, and a closed key's state is gone.
  */
class TimerSpec extends SparkSpec {

  test("timers fire on watermark progress; re-arm extends a key's life") {
    val ss = EventsStreaming.stateV2Session(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q281_spec").toString
    import ss.implicits._
    // v1: A has 11 events (ts 100..110), B has 6 (ts 100..105)
    SinkSource.write(
      ((100L to 110L).map(t => (1L, t)) ++ (100L to 105L).map(t => (2L, t)))
        .toDF("k", "v").repartition(2, col("k")),
      s"$base/t", overwrite = true)
    // v2: A only, at ts 200 — re-arms A past B's horizon
    SinkSource.write(Seq((1L, 200L)).toDF("k", "v").coalesce(1),
      s"$base/t", overwrite = false)
    // v3: flush — fires everything still armed
    SinkSource.write(Seq((-1L, 9000000000L)).toDF("k", "v").coalesce(1),
      s"$base/t", overwrite = false)

    val timed = ss.readStream.format("graft.sources.SinkSource")
      .option("path", s"$base/t")
      .option("maxVersionsPerTrigger", "1").load()
      .select(col("k"), col("v").as("sec"),
        timestamp_seconds(col("v") + 1000).as("ts"))
      .withWatermark("ts", "10 seconds")
    val q = EventsStreaming.inactivityCloses(ss, timed, gapMs = 60000L)
      .toDF()
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", s"$base/ckpt")
      .format("memory").queryName("q281_spec_mem").start()
    q.processAllAvailable()
    // data batches emit nothing: every output row came from an
    // expired-timer callback
    val perBatch = q.recentProgress
      .map(p => p.numInputRows -> p.sink.numOutputRows).toSeq
    q.stop()
    assert(perBatch.exists { case (in, out) => in > 0 && out == 0 },
      s"data-only batches must emit nothing (timer-driven output): $perBatch")

    val rows = ss.table("q281_spec_mem").filter(col("k") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    // A closes ONCE with the cross-batch total (stale timer deleted —
    // a surviving batch-1 timer would have closed A early at count 11
    // and produced a second row); B closes with its batch-1 count
    assert(rows == Seq((1L, 12L, 200L), (2L, 6L, 105L)),
      s"timer closes wrong: $rows")
  }
}
