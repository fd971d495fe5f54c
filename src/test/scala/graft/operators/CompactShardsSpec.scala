package graft.operators

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** q89's shard compaction: content-identical manifest, collapsed file
  * counts, one file per shard directory after the rewrite.
  */
class CompactShardsSpec extends SparkSpec {

  // sf0.01, not sf0.001: fragmentation needs more windows than shard
  // directories (sf0.001 packs exactly one window per occupied shard,
  // so the "fragmented" state is indistinguishable from the compact one)
  val dir = "/root/testdata/sf0.01"

  private def dataFiles(root: String): Map[String, Int] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.globStatus(new Path(p, "out_shard=*/part-*"))
      .map(_.getPath.getParent.getName)
      .groupBy(identity).map { case (k, v) => k -> v.length }
  }

  test("compaction preserves the manifest and collapses the file count") {
    val manifest = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val compacted = manifest(Curation.q89CompactShards(spark, dir))
    val original = manifest(Curation.q78ShardManifest(spark, dir))
    assert(compacted.nonEmpty)
    assert(compacted == original,
      s"compaction drifted the manifest: ${compacted.diff(original)}")

    val frag = dataFiles(graft.sources.ShardPaths.resolve(spark, "q89frag", dir))
    val comp = dataFiles(graft.sources.ShardPaths.resolve(spark, "q89", dir))
    assert(frag.nonEmpty && comp.nonEmpty)
    // fragmented state has multiple files in at least some shards;
    // compacted state has exactly one per shard directory
    assert(frag.values.sum > comp.values.sum,
      s"fragmentation did not materialize: frag=$frag comp=$comp")
    comp.foreach { case (shard, n) =>
      assert(n == 1, s"$shard still has $n files after compaction")
    }
  }
}
