package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.SinkSource

/** q272 — admission control on the changelog source. The oracle proves
  * the drained aggregate; this spec locks the RATE-LIMIT CONTRACT:
  * `maxVersionsPerTrigger=1` turns a 4-commit backlog into 4 batches
  * of exactly one commit's rows each, the unlimited read drains the
  * same backlog in 1 batch, and the limit composes with checkpointed
  * restart (a resumed consumer paces from its checkpoint, re-reading
  * nothing).
  */
class SinkRateLimitSpec extends SparkSpec {

  test("a version-limited drain paces one commit per batch") {
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q272_spec").toString
    import ss.implicits._

    def rows(lo: Long, hi: Long) =
      (lo until hi).map(i => (i % 3, i)).toDF("k", "v")

    // 4-commit backlog: 30 + 10 + 20 + 5 rows
    SinkSource.write(rows(0, 30), s"$base/t", overwrite = true)
    SinkSource.write(rows(30, 40), s"$base/t", overwrite = false)
    SinkSource.write(rows(40, 60), s"$base/t", overwrite = false)
    SinkSource.write(rows(60, 65), s"$base/t", overwrite = false)

    def drain(ckpt: String, limit: Option[Int]): Seq[Long] = {
      val r = ss.readStream.format("graft.sources.SinkSource")
        .option("path", s"$base/t")
      val q = limit.fold(r)(n => r.option("maxVersionsPerTrigger", n.toString))
        .load()
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
        .writeStream.outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("rate_mem").start()
      q.processAllAvailable()
      val reads = q.recentProgress.map(_.numInputRows).toSeq
      q.stop()
      reads
    }

    val paced = drain(s"$base/ckpt_paced", Some(1)).filter(_ > 0)
    assert(paced == Seq(30L, 10L, 20L, 5L),
      s"one-version pacing should read commit-sized batches: $paced")

    val unlimited = drain(s"$base/ckpt_unlim", None).filter(_ > 0)
    assert(unlimited == Seq(65L),
      s"without the option the backlog is one batch: $unlimited")

    // the aggregate is identical either way
    val snap = ss.table("rate_mem")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 65L).groupBy(_ % 3)
      .map { case (k, vs) => k -> vs.sum }
    assert(snap == expected, s"drained aggregate wrong: $snap")

    // restart composes: two more commits, the paced checkpoint resumes
    // with exactly two one-commit batches
    SinkSource.write(rows(65, 70), s"$base/t", overwrite = false)
    SinkSource.write(rows(70, 72), s"$base/t", overwrite = false)
    val resumed = drain(s"$base/ckpt_paced", Some(1)).filter(_ > 0)
    assert(resumed == Seq(5L, 2L),
      s"a resumed consumer must pace from its checkpoint: $resumed")
  }
}
