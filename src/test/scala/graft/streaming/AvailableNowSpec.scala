package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q253 — Trigger.AvailableNow. The oracle proves the drained totals;
  * this spec pins the trigger semantics on a synthetic staging:
  * (1) a run processes the backlog in MULTIPLE rate-limited batches
  *     (maxFilesPerTrigger=1 → one batch per file) and TERMINATES by
  *     itself — awaitTermination returns without stop();
  * (2) successive runs are incremental — run 2 reads EXACTLY the
  *     files staged after run 1 and recovers run 1's state.
  */
class AvailableNowSpec extends SparkSpec {

  test("a run drains in multiple batches, terminates, and resumes incrementally") {
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q253_spec").toString
    val (stage, ckpt, out) = (s"$base/stage", s"$base/ckpt", s"$base/out")
    val raw = graft.sources.Tables.events(ss, "/root/testdata/sf0.001")
    (0 until 3).foreach { i =>
      raw.filter(col("event_id") % 4 === i)
        .coalesce(1).write.parquet(s"$stage/s$i.parquet")
    }
    val staged = raw.filter(col("event_id") % 4 < 3).count()
    val (batches1, rows1) = StreamingQueries.q253Run(ss, stage, ckpt, out)
    assert(rows1 == staged, s"run 1 read $rows1 of $staged staged rows")
    assert(batches1 >= 3,
      s"maxFilesPerTrigger=1 over 3 files should take >=3 batches, took $batches1")
    // incremental second run: only the newly staged file
    raw.filter(col("event_id") % 4 === 3)
      .coalesce(1).write.parquet(s"$stage/s3.parquet")
    val delta = raw.filter(col("event_id") % 4 === 3).count()
    val (_, rows2) = StreamingQueries.q253Run(ss, stage, ckpt, out)
    assert(rows2 == delta,
      s"incremental run re-read the backlog: $rows2 rows, only $delta are new")
    val got = spark.read.parquet(out)
      .select(sum(col("n_events"))).collect()(0).getLong(0)
    assert(got == raw.count(), "recovered state does not cover the whole corpus")
  }
}
