package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q260 — the V2 sink's commit protocol. The oracle proves the
  * round-tripped values; this spec locks the PROTOCOL: readers plan
  * from the manifest alone (unlisted files do not exist), an aborted
  * write leaves no trace, overwrite truncates only at commit, and the
  * manifest advances by versioned publish, never in-place rewrite.
  */
class SinkProtocolSpec extends SparkSpec {

  private def freshTable(tag: String): String = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_sink_$tag").toString
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("k", "v").repartition(2, col("k"))
    SinkSource.write(df, root, overwrite = true)
    root
  }

  test("readers see the manifest, not the directory") {
    val root = freshTable("manifest")
    val f = SinkSource.fs(root)
    // plant a stray data file (a crashed writer's orphan) and a staged
    // attempt: neither is cited by the manifest, so neither exists to
    // a reader
    val stray = f.create(new Path(root, "data/p9_t9_k7.psv"), true)
    stray.write("7|700\n".getBytes("UTF-8")); stray.close()
    val staged = f.create(new Path(root, "_staging/zombie/p0_t0_k8.psv"), true)
    staged.write("8|800\n".getBytes("UTF-8")); staged.close()
    val got = SinkSource.load(spark, root)
      .groupBy(col("k")).agg(sum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 21L, 2L -> 20L, 3L -> 30L),
      s"uncommitted files leaked into the read: $got")
  }

  test("an aborted write leaves the table untouched") {
    val root = freshTable("abort")
    val before = SinkSource.manifest(root)
    // drive the write protocol by hand to its abort arm: stage a task,
    // then abort the job instead of committing it
    val bw = new SinkBatchWrite(root, "attempt1", truncate = true)
    val w = new SinkWriterFactory(root, "attempt1").createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(99L, 999L))
    w.commit()
    val f = SinkSource.fs(root)
    assert(f.exists(new Path(root, "_staging/attempt1/p0_t0_k99.psv")),
      "task commit should have staged its file")
    bw.abort(Array.empty)
    assert(!f.exists(new Path(root, "_staging/attempt1")),
      "abort must delete the staging attempt")
    assert(SinkSource.manifest(root) == before,
      "abort must not advance the manifest")
    val ks = SinkSource.load(spark, root).select(col("k"))
      .collect().map(_.getLong(0)).toSet
    assert(ks == Set(1L, 2L, 3L), s"aborted rows leaked: $ks")
  }

  test("overwrite truncates at commit; append accumulates") {
    val root = freshTable("modes")
    import spark.implicits._
    SinkSource.write(Seq((5L, 50L)).toDF("k", "v"), root, overwrite = false)
    val appended = SinkSource.load(spark, root).count()
    assert(appended == 5, s"append lost rows: $appended")
    SinkSource.write(Seq((6L, 60L)).toDF("k", "v"), root, overwrite = true)
    val after = SinkSource.load(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == Set((6L, 60L)), s"truncate left old rows: $after")
    // truncating commit GC'd the unreachable data files
    val f = SinkSource.fs(root)
    val dataFiles = f.listStatus(new Path(root, "data")).map(_.getPath.getName)
    assert(dataFiles.length == 1 && dataFiles(0).endsWith("_k6.psv"),
      s"stale data files survived truncation: ${dataFiles.toSeq}")
  }

  test("publishes advance the manifest version, never rewrite in place") {
    val root = freshTable("versions")
    val v1 = SinkSource.currentVersion(root)
    import spark.implicits._
    SinkSource.write(Seq((7L, 70L)).toDF("k", "v"), root, overwrite = false)
    val v2 = SinkSource.currentVersion(root)
    assert(v2 == v1 + 1, s"expected a new manifest version, got $v1 -> $v2")
    val f = SinkSource.fs(root)
    assert(f.exists(new Path(root, s"manifest.v$v1.psv")),
      "the prior version must survive for in-flight readers")
  }
}
