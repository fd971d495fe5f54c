package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.SinkSource

/** q278 — the state-store batch readers. The oracle proves the state
  * contents; this spec locks the INTROSPECTION contract: the
  * state-metadata reader identifies the operator, store, partition
  * count, and batch range; the statestore reader's rows equal the
  * query's own sink output; and rows shard by the store's physical
  * partitioning (partition_id populated, bounded by numPartitions).
  */
class StateReaderSpec extends SparkSpec {

  test("checkpoint state reads back as a table and matches the sink") {
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q278_spec").toString
    import ss.implicits._
    SinkSource.write((0L until 90L).map(i => (i % 6, i)).toDF("k", "v")
      .repartition(3, col("k")), s"$base/t", overwrite = true)
    val q = ss.readStream.format("graft.sources.SinkSource")
      .option("path", s"$base/t").load()
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", s"$base/ckpt")
      .format("memory").queryName("q278_spec_mem").start()
    q.processAllAvailable()
    q.stop()

    val md = ss.read.format("state-metadata").load(s"$base/ckpt")
      .collect()
    assert(md.length == 1, s"one stateful operator expected: ${md.toSeq}")
    val row = md(0)
    assert(row.getAs[String]("operatorName") == "stateStoreSave",
      s"unexpected operator: $row")
    val numParts = row.getAs[Int]("numPartitions")
    assert(numParts > 0)
    assert(row.getAs[Long]("maxBatchId") >= 0L)

    val state = ss.read.format("statestore").load(s"$base/ckpt")
    val stateRows = state
      .select(col("key.k"), col("value.count"), col("value.sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val sinkRows = ss.table("q278_spec_mem")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(stateRows == sinkRows,
      s"state store disagrees with the sink:\n$stateRows\nvs\n$sinkRows")

    val pids = state.select(col("partition_id"))
      .collect().map(_.getInt(0)).toSet
    assert(pids.forall(p => p >= 0 && p < numParts),
      s"partition ids out of range: $pids (numPartitions=$numParts)")
  }
}
