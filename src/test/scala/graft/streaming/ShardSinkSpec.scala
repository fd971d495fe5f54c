package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q80's sink path across REAL micro-batch boundaries: with the source
  * forced to one file per trigger, the batchId-scoped appends must
  * land in separate batch=N directories and the read-back manifest
  * must equal the batch-computed dual — micro-batch boundaries cannot
  * drift the shards' content.
  */
class ShardSinkSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("multi-batch shard sink: manifest equals the batch dual") {
    val base = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val root = s"${sys.props("java.io.tmpdir")}/graft_sink_mb_${System.nanoTime()}"
    base.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$root/in/e1.parquet")
    base.filter(col("event_id") % 2 =!= 0).coalesce(1)
      .write.parquet(s"$root/in/e2.parquet")
    // file-stream ordering is by modification time: push e2 later
    new java.io.File(s"$root/in/e2.parquet").listFiles()
      .foreach(f => f.setLastModified(System.currentTimeMillis() + 60000))

    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in/*.parquet")
    val q = StreamingQueries.shardSinkStart(stream, s"$root/out", s"$root/ckpt")
    try q.processAllAvailable() finally q.stop()

    // the appends really crossed a batch boundary
    val batchDirs = new java.io.File(s"$root/out").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(batchDirs.length >= 2,
      s"expected >=2 batch directories, got ${batchDirs.map(_.getName).mkString(",")}")

    val manifest = StreamingQueries.shardManifest(spark, s"$root/out")
    val expect = base
      .groupBy((col("event_id") % StreamingQueries.SinkShards).cast("int").as("shard"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"),
        expr("bit_xor(CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 12), 16, 10) AS BIGINT))")
          .as("content_hash"))
    assert(manifest.count() == expect.count())
    assert(manifest.exceptAll(expect).isEmpty && expect.exceptAll(manifest).isEmpty,
      "multi-batch manifest drifted from the batch dual")
  }
}
