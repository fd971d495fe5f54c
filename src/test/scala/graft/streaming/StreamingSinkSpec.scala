package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.{SinkCommitMessage, SinkSource, SinkStreamingWrite}

/** q264 — the V2 streaming sink's epoch protocol. The oracle proves
  * the round-tripped totals; this spec locks the PROTOCOL: each epoch
  * advances the manifest's txn ledger (the (queryId, epoch) highwater
  * recorded ATOMICALLY by the same manifest rename that publishes the
  * files), a replayed epoch commit is a publish no-op, a checkpointed
  * restart appends nothing for already-processed input, and new input
  * after the restart lands exactly once.
  */
class StreamingSinkSpec extends SparkSpec {

  private def run(stage: String, ckpt: String, table: String): Unit = {
    val ss = EventsStreaming.streamSession(spark)
    val keyed = EventsStreaming
      .readEventsStream(ss, s"$stage/*.parquet", glob = "*.parquet",
        options = Map("maxFilesPerTrigger" -> "1"))
      .select((col("event_id") % 7).as("k"), col("event_id").as("v"))
    val q = keyed.writeStream
      .format("graft.sources.SinkSource")
      .option("path", table)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .start()
    q.processAllAvailable()
    q.stop()
  }

  test("epoch txn ledger, replay no-op, and restart exactly-once") {
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q264_spec").toString
    val (stage, ckpt, table) = (s"$base/stage", s"$base/ckpt", s"$base/t")
    val raw = graft.sources.Tables.events(ss, "/root/testdata/sf0.001")
    val a = raw.filter(col("event_id") % 3 === 0)
    val b = raw.filter(col("event_id") % 3 === 1)
    a.coalesce(1).write.parquet(s"$stage/f1.parquet")
    b.coalesce(1).write.parquet(s"$stage/f2.parquet")
    run(stage, ckpt, table)

    // two files + maxFilesPerTrigger=1 → two epochs, each its own
    // manifest version, and the current manifest's txn ledger carries
    // the query's epoch highwater (= 1, epochs 0 and 1 published)
    val txns = SinkSource.txns(table)
    assert(txns.size == 1 && txns.head._2 == 1L,
      s"expected one txn at epoch highwater 1: $txns")
    // the ledger is IN the manifest: no separate marker file exists,
    // so publish-files and record-epoch are one atomic rename
    val f = SinkSource.fs(table)
    val markers = f.listStatus(new Path(table)).map(_.getPath.getName)
      .filter(n => n.startsWith("epoch.") && n.endsWith(".done"))
    assert(markers.isEmpty, s"unexpected marker files: ${markers.toSeq}")
    val n1 = SinkSource.load(spark, table).count()
    assert(n1 == a.count() + b.count(), s"sink lost rows: $n1")

    // a REPLAYED epoch commit (recovery re-offering epoch 0, or the
    // highwater epoch 1 itself) must not publish a new manifest version
    val vBefore = SinkSource.currentVersion(table)
    val queryId = txns.head._1
    new SinkStreamingWrite(table, queryId)
      .commit(0L, Array(SinkCommitMessage(Seq.empty)))
    new SinkStreamingWrite(table, queryId)
      .commit(1L, Array(SinkCommitMessage(Seq.empty)))
    assert(SinkSource.currentVersion(table) == vBefore,
      "a replayed epoch advanced the manifest")

    // restart on the same checkpoint with no new input: nothing appends
    run(stage, ckpt, table)
    assert(SinkSource.load(spark, table).count() == n1,
      "a no-new-input restart appended rows")

    // new input after the restart lands exactly once
    val c = raw.filter(col("event_id") % 3 === 2)
    c.coalesce(1).write.parquet(s"$stage/f3.parquet")
    run(stage, ckpt, table)
    val n2 = SinkSource.load(spark, table).count()
    assert(n2 == n1 + c.count(),
      s"restart ingest not exactly-once: $n1 -> $n2 (+${c.count()} staged)")
  }
}
