package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.SinkSource

/** q267 — the changelog stream over the V2 sink. The oracle proves
  * the aggregate; this spec locks the SOURCE CONTRACT: each
  * micro-batch reads exactly the files its offset delta added (the
  * second batch's input-row count equals the appended delta, not the
  * table), and a restarted query resumes from the checkpointed
  * version, re-reading nothing.
  */
class SinkCdcSpec extends SparkSpec {

  test("version-delta batches and checkpointed offset recovery") {
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q267_spec").toString
    val (table, ckpt) = (s"$base/t", s"$base/ckpt")
    import ss.implicits._

    def rows(lo: Long, hi: Long) =
      (lo until hi).map(i => (i % 3, i)).toDF("k", "v")

    SinkSource.write(rows(0, 30), table, overwrite = true)    // v1

    def drain(): Seq[Long] = {
      val q = ss.readStream.format("graft.sources.SinkSource")
        .option("path", table).load()
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
        .writeStream.outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("cdc_mem").start()
      q.processAllAvailable()
      val reads = q.recentProgress.map(_.numInputRows).toSeq
      q.stop()
      reads
    }

    val first = drain()
    assert(first.sum == 30, s"first drain read ${first.sum} of 30 rows")

    // append a delta commit; the next drain must read ONLY its rows
    SinkSource.write(rows(30, 40), table, overwrite = false)  // v2
    val second = drain()
    assert(second.sum == 10,
      s"delta drain re-read history: ${second.sum} rows (10 are new)")
    val snap = ss.table("cdc_mem")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 40L).groupBy(_ % 3)
      .map { case (k, vs) => k -> vs.sum }
    assert(snap == expected, s"recovered aggregate wrong: $snap")

    // nothing new: the drain reads zero rows
    val third = drain()
    assert(third.sum == 0, s"an idle drain re-read ${third.sum} rows")
  }
}
