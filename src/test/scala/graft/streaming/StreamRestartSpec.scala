package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q244 — checkpoint recovery. The oracle proves the recovered totals;
  * this spec pins the two recovery halves SEPARATELY on a synthetic
  * staging:
  * (1) offset recovery — run 2's input-row count is EXACTLY half B
  *     (re-reading half A would show up here before it corrupted
  *     any aggregate);
  * (2) state recovery — after run 2 the snapshot equals the full
  *     corpus aggregate even though run 2 only READ half B.
  */
class StreamRestartSpec extends SparkSpec {

  test("restart reads only the new files and recovers the aggregate state") {
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q244_spec").toString
    val (stage, ckpt, out) = (s"$base/stage", s"$base/ckpt", s"$base/out")
    val raw = graft.sources.Tables.events(ss, "/root/testdata/sf0.001")
    val a = raw.filter(col("event_id") % 2 === 0)
    val b = raw.filter(col("event_id") % 2 =!= 0)
    val (nA, nB) = (a.count(), b.count())
    a.coalesce(1).write.parquet(s"$stage/a1.parquet")
    val read1 = StreamingQueries.q244Run(ss, stage, ckpt, out)
    assert(read1 == nA, s"run 1 read $read1 rows, staged $nA")
    b.coalesce(1).write.parquet(s"$stage/a2.parquet")
    val read2 = StreamingQueries.q244Run(ss, stage, ckpt, out)
    assert(read2 == nB,
      s"restart re-read data: processed $read2 rows, only $nB are new")
    val got = spark.read.parquet(out)
      .select(sum(col("n_events"))).collect()(0).getLong(0)
    assert(got == nA + nB,
      s"recovered state lost rows: snapshot covers $got of ${nA + nB}")
  }
}
