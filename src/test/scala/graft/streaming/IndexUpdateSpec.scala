package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q163's index write-back loop: the corpus is staged twice across a
  * real micro-batch boundary, so the second arrival of every document
  * must be annihilated by the fingerprints the first batch appended —
  * the property a static index (q103) cannot give. The survivor set,
  * the final index content, and the per-batch layout are all pinned.
  */
class IndexUpdateSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q163: appended fingerprints annihilate the second arrival") {
    val out = StreamingQueries.q163StreamIndexUpdate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val static = docs.filter(_._1 % 3 == 0).map(_._2).toSet
    val expected = docs.groupBy(_._2).map { case (fp, g) => (g.map(_._1).min, fp) }
      .filterNot(t => static(t._2)).toSeq.sorted

    // survivors = canonical first occurrence of every fingerprint not
    // already admitted — duplicates across arrivals contributed NOTHING
    assert(out.toSeq.sorted == expected,
      "survivor set drifted — a duplicate arrival leaked past the updated index")
    assert(out.map(_._2).distinct.length == out.length,
      "a fingerprint was admitted twice across batches")

    // the staged arrivals really crossed a micro-batch boundary
    val outDir = graft.sources.ShardPaths.resolve(spark, "q163", dir)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    assert(batchDirs.length >= 2,
      s"expected >=2 batches, got ${batchDirs.map(_.getPath.getName).mkString(",")}")

    // the index accumulated to the full corpus fingerprint set
    val idxDir = graft.sources.ShardPaths.resolve(spark, "q163_index", dir)
    val idx = spark.read.parquet(idxDir).select("fp").distinct().count()
    assert(idx == docs.map(_._2).distinct.length,
      "final index does not hold every corpus fingerprint")
  }
}
