package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q250 — RocksDB state store. The oracle proves the aggregate; this
  * spec pins the BACKEND: the state operator's progress reports
  * rocksdb* metrics (the provider actually in use, not just a conf
  * string), the checkpoint contains a .changelog file (incremental
  * state upload, not full snapshots), state cardinality tracks the
  * user population, and the result is backend-invariant vs the
  * default HDFS-backed provider.
  */
class RocksDbStateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the state operator runs on RocksDB with changelog checkpointing") {
    val ss = StreamingQueries.rocksSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q250_spec").toString
    val (ckpt, out) = (s"$base/ckpt", s"$base/out")
    val prog = StreamingQueries.q250Run(ss, sf, ckpt, out)
    val ops = prog.stateOperators
    assert(ops.nonEmpty, "no stateful operator in the progress")
    val metricKeys = ops(0).customMetrics.keySet()
      .toArray.map(_.toString)
    assert(metricKeys.exists(_.startsWith("rocksdb")),
      s"state metrics are not RocksDB's: ${metricKeys.sorted.mkString(", ")}")
    val users = graft.sources.Tables.events(ss, sf)
      .select(col("user_id")).distinct().count()
    assert(ops(0).numRowsTotal == users,
      s"state rows ${ops(0).numRowsTotal} != distinct users $users")
    // changelog checkpointing: per-batch DELTA files, not full snapshots
    val changelogs = java.nio.file.Files
      .walk(java.nio.file.Paths.get(ckpt))
      .filter(_.toString.endsWith(".changelog"))
      .count()
    assert(changelogs > 0, s"no .changelog files under $ckpt")
  }

  test("the aggregate is backend-invariant vs the default provider") {
    val rocks = StreamingQueries.q250RocksdbState(spark, sf)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    // default HDFS-backed provider, same plan
    val ss = EventsStreaming.streamSession(spark)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q250_hdfs").toString
    StreamingQueries.q250Run(ss, sf, s"$base/ckpt", s"$base/out")
    val hdfs = spark.read.parquet(s"$base/out")
      .select(col("user_id"), col("n_events"),
        col("dec_sum").cast("double").as("sum_value"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(rocks.sameElements(hdfs), "state backend changed the aggregate")
  }
}
