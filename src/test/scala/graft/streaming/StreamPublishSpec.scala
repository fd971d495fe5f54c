package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q256 — update-mode incremental publish. The oracle proves the final
  * table; this spec pins the incremental mechanics on a day-split
  * staging:
  * (1) offset recovery — run 2 reads EXACTLY the newly staged rows;
  * (2) partition-scoped publish — the day partitions entirely served
  *     by run 1 are byte-identical after run 2 (update mode emitted
  *     only the new days, dynamic overwrite touched only those);
  * (3) the published table equals the whole-corpus aggregate.
  */
class StreamPublishSpec extends SparkSpec {

  test("run 2 publishes only the new days; history files are untouched") {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val base = java.nio.file.Files
      .createTempDirectory("graft_q256_spec").toString
    val (stage, ckpt, out) = (s"$base/stage", s"$base/ckpt", s"$base/out")
    val split = StreamingQueries.PublishSplitDay
    val raw = graft.sources.Tables.events(ss, "/root/testdata/sf0.001")
      .withColumn("day", expr("CAST(ts AS LONG) DIV 86400"))
    val a = raw.filter(col("day") < split).drop("day")
    val b = raw.filter(col("day") >= split).drop("day")
    a.coalesce(1).write.parquet(s"$stage/a1.parquet")
    val read1 = StreamingQueries.q256Run(ss, stage, ckpt, out)
    assert(read1 == a.count(), s"run 1 read $read1 of ${a.count()} staged rows")

    val fs = new Path(out).getFileSystem(ss.sessionState.newHadoopConf())
    def files(day: Long) =
      fs.listStatus(new Path(out, s"day=$day"))
        .filter(_.getPath.getName.startsWith("part-"))
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
        .sortBy(_._1).toSeq
    val historyDays = fs.listStatus(new Path(out))
      .map(_.getPath.getName).filter(_.startsWith("day="))
      .map(_.stripPrefix("day=").toLong).sorted
    assert(historyDays.nonEmpty && historyDays.forall(_ < split))
    val before = historyDays.map(d => d -> files(d)).toMap

    b.coalesce(1).write.parquet(s"$stage/a2.parquet")
    val read2 = StreamingQueries.q256Run(ss, stage, ckpt, out)
    assert(read2 == b.count(),
      s"incremental run re-read history: $read2 rows, only ${b.count()} are new")
    historyDays.foreach { d =>
      assert(files(d) == before(d),
        s"day=$d was republished by a run that carried no data for it")
    }
    val total = spark.read.parquet(out)
      .select(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total == raw.count(),
      s"published table covers $total of ${raw.count()} events")
  }
}
