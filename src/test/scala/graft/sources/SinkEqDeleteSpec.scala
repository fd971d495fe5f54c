package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q305 — equality deletes. The oracle proves the merged read; this
  * spec locks the SEQUENCE semantics and the lifecycle interplay:
  * re-inserted values survive (file seq > delete seq), positional
  * vectors compose on the same file, rollback restores the exact
  * tombstone state, expire/orphans treat the value files as
  * citations, and the refusal matrix (layout key, non-BIGINT, raw
  * compact) holds.
  */
class SinkEqDeleteSpec extends SparkSpec {

  private def vals(root: String): Seq[Long] =
    SinkSource.load(spark, root, mor = true).select("v")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("sequence semantics: the delete hits old files only; re-inserts survive") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_eqd").toString
    import spark.implicits._
    SinkSource.write(Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("k", "v"),
      root, overwrite = true)                                        // v1
    SinkSource.equalityDelete(root, "v", Seq(2L, 3L))                // v2
    assert(vals(root) == Seq(1L), "values 2 and 3 are tombstoned")
    // re-insert one deleted value: its file is YOUNGER than the delete
    SinkSource.write(Seq((1L, 3L)).toDF("k", "v"), root,
      overwrite = false)                                             // v3
    assert(vals(root) == Seq(1L, 3L),
      "a re-inserted value must survive the older delete")
    // a second delete hits everything committed so far, including the
    // re-insert — sequences order deletes and data mutually
    SinkSource.equalityDelete(root, "v", Seq(3L))                    // v4
    assert(vals(root) == Seq(1L))
    // the raw (non-MoR) read ignores value tombstones, like it
    // ignores positional vectors — the documented convention
    assert(SinkSource.load(spark, root).count() == 4L)
  }

  test("positional vectors compose; compaction materializes and self-prunes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_eqc").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(
      (0L until 10L).map(i => (i % 2, i)).toDF("k", "v")
        .repartition(2, col("k")), root, overwrite = true)           // v1
    SinkSource.equalityDelete(root, "v", Seq(4L, 5L))                // v2
    s.conf.set("spark.sql.catalog.graft_eqs", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_eqs.root",
      new Path(root).getParent.toString)
    s.conf.set("spark.sql.catalog.graft_eqs.mor", "true")
    val table = new Path(root).getName
    s.sql(s"DELETE FROM graft_eqs.`$table` WHERE k = 0 AND v = 2")   // v3 (DV)
    val expect = Seq(0L, 1L, 3L, 6L, 7L, 8L, 9L)
    assert(vals(root) == expect, s"eq + positional must compose: ${vals(root)}")
    // raw compact refuses; MoR compact materializes both tombstone
    // kinds and prunes the eq header
    s.conf.set("spark.sql.catalog.graft_eqraw", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_eqraw.root",
      new Path(root).getParent.toString)
    intercept[Exception] {
      s.sql(s"CALL graft_eqraw.compact('$table')").collect() }
    s.sql(s"CALL graft_eqs.compact('$table')").collect()
    assert(SinkSource.eqDeletes(root).isEmpty,
      "materialized deletes must self-prune the header")
    assert(SinkSource.deleteSidecar(root).isEmpty)
    assert(vals(root) == expect, "the rewrite must preserve the merged read")
    assert(SinkSource.load(spark, root).count() == expect.size.toLong,
      "after materialization even the raw read agrees")
  }

  test("rollback restores tombstone state; expire and orphans keep cited value files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_eqlc").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L), (0L, 2L)).toDF("k", "v"), root,
      overwrite = true)                                              // v1
    SinkSource.equalityDelete(root, "v", Seq(2L))                    // v2
    val eqFile = SinkSource.eqDeletes(root).head._1
    s.conf.set("spark.sql.catalog.graft_eql", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_eql.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    // rollback BEFORE the delete: value resurfaces (that is the point
    // of restore); rollback FORWARD: tombstone state returns exactly
    s.sql(s"CALL graft_eql.rollback('$table', 1)").collect()         // v3
    assert(vals(root) == Seq(1L, 2L))
    s.sql(s"CALL graft_eql.rollback('$table', 2)").collect()         // v4
    assert(vals(root) == Seq(1L))
    assert(SinkSource.eqDeletes(root).map(_._1) == Seq(eqFile))
    // orphan sweep with zero grace must NOT touch the cited value file
    s.sql(s"CALL graft_eql.remove_orphans('$table', 0)").collect()
    assert(SinkSource.fs(root).exists(new Path(root, s"deletes/$eqFile")))
    assert(vals(root) == Seq(1L))
    // expire away every version before the head: the value file is
    // still cited by the head and must survive GC
    s.sql(s"CALL graft_eql.expire('$table', 1)").collect()
    assert(SinkSource.fs(root).exists(new Path(root, s"deletes/$eqFile")))
    assert(vals(root) == Seq(1L))
  }

  test("the refusal matrix holds") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_eqref").toString
    import spark.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), root,
      overwrite = true)
    intercept[UnsupportedOperationException] {
      SinkSource.equalityDelete(root, "k", Seq(0L)) // layout key
    }
    intercept[IllegalArgumentException] {
      SinkSource.equalityDelete(root, "nope", Seq(0L))
    }
    intercept[IllegalArgumentException] {
      SinkSource.equalityDelete(root, "v", Seq.empty)
    }
    assert(SinkSource.currentVersion(root) == 1,
      "refused deletes must publish nothing")
  }
}
