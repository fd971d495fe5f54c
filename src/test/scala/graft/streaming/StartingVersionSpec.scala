package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.SinkSource

/** q282 — changelog bootstrap. The oracle proves the subscribed
  * slice; this spec locks the BOUNDARY and PRECEDENCE contract:
  * version n is included and history before it never read; a
  * checkpointed restart ignores the option (the checkpoint owns
  * resumption); and the default (no option) still reads from the
  * beginning.
  */
class StartingVersionSpec extends SparkSpec {

  test("startingVersion bounds history; checkpoints take precedence") {
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q282_spec").toString
    import ss.implicits._
    def rows(lo: Long, hi: Long) =
      (lo until hi).map(i => (i % 3, i)).toDF("k", "v")
    SinkSource.write(rows(0, 30), s"$base/t", overwrite = true)   // v1
    SinkSource.write(rows(30, 40), s"$base/t", overwrite = false) // v2
    SinkSource.write(rows(40, 45), s"$base/t", overwrite = false) // v3

    def drain(ckpt: String, starting: Option[Int]): Long = {
      val r = ss.readStream.format("graft.sources.SinkSource")
        .option("path", s"$base/t")
      val q = starting.fold(r)(v => r.option("startingVersion", v.toString))
        .load()
        .groupBy().agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .writeStream.outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("sv_mem").start()
      q.processAllAvailable()
      q.stop()
      ss.table("sv_mem").collect()(0).getLong(0)
    }

    // inclusive boundary: version 2 onward = 10 + 5 rows
    assert(drain(s"$base/ckpt2", Some(2)) == 15L,
      "startingVersion=2 must deliver versions 2 and 3")
    // default: the whole history
    assert(drain(s"$base/ckpt0", None) == 45L,
      "without the option the changelog starts at the beginning")
    // precedence: a restart with a DIFFERENT startingVersion resumes
    // from the checkpoint, re-reading nothing (total unchanged after
    // an idle drain, not re-bootstrapped at version 1)
    SinkSource.write(rows(45, 47), s"$base/t", overwrite = false) // v4
    assert(drain(s"$base/ckpt2", Some(1)) == 17L,
      "a checkpointed restart must ignore startingVersion")
  }
}
