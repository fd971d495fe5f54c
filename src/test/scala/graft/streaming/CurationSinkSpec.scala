package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q153's end-to-end streaming curation pipeline (rowLocalGate →
  * dropDuplicatesWithinWatermark → batch-scoped shard sink) against its
  * batch dual: the staged at-least-once source must cross a REAL
  * micro-batch boundary, the duplicate arrivals must be suppressed by
  * dedup state that survives that boundary, and the read-back manifest
  * must equal the manifest computed from the batch gate — the same
  * batch/stream parity contract q88 pins for the gate alone, here for
  * the whole chain including the sink.
  */
class CurationSinkSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q153: streaming gate→dedup→sink manifest equals the batch dual") {
    val manifest = StreamingQueries.q153StreamCurationPipeline(spark, dir)

    // the staged arrivals really crossed a micro-batch boundary
    val outDir = graft.sources.ShardPaths.resolve(spark, "q153", dir)
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    val batchDirs = fs.listStatus(out)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    assert(batchDirs.length >= 2,
      s"expected >=2 batch directories, got ${batchDirs.map(_.getPath.getName).mkString(",")}")

    // batch dual: the SAME gate function over the batch table, then the
    // same integer-only manifest
    val gated = graft.operators.Curation.rowLocalGate(Tables.documents(spark, dir))
    val expect = gated
      .groupBy((col("doc_id") % StreamingQueries.DocSinkShards).cast("int").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 12), 16, 10) AS BIGINT))")
          .as("content_hash"))
    assert(manifest.count() == expect.count())
    assert(manifest.exceptAll(expect).isEmpty && expect.exceptAll(manifest).isEmpty,
      "streaming curation manifest drifted from the batch dual")

    // the second arrival of every doc was suppressed by dedup state
    // ACROSS the batch boundary: the sink holds exactly the gate's
    // output, not 2x of it
    assert(spark.read.parquet(outDir).count() == gated.count(),
      "duplicate arrivals leaked past the watermark dedup into the sink")
  }
}
