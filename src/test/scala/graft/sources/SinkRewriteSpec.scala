package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q306 — clustered rewrite. The oracle proves the skipped read; this
  * spec locks the verb's contracts: the rewrite preserves row
  * semantics exactly, keeps the one-key-per-file layout invariant,
  * turns an unskippable layout into a skippable one, materializes MoR
  * tombstones, and refuses what it cannot do honestly.
  */
class SinkRewriteSpec extends SparkSpec {

  private def ruledOut(root: String, cut: Long): Seq[String] = {
    val stats = SinkSource.manifestStats(root)
    SinkSource.manifest(root).map(_._2).distinct.filter(fl =>
      stats.get(fl).exists(_.exists { case (id, mn, _) =>
        id == 2 && mn >= cut }))
  }

  test("rewrite preserves reads, keeps the layout invariant, and makes skipping real") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_zrw").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    // two interleaved appends: every file spans the full v range
    (0 until 2).foreach(i =>
      SinkSource.write((0L until 400L).filter(_ % 2 == i.toLong)
        .map(v => (v % 3, v)).toDF("k", "v").repartition(2, col("k")),
        root, overwrite = i == 0))
    assert(ruledOut(root, 200L).isEmpty, "interleaved layout: nothing skippable")
    val before = SinkSource.load(s, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    s.conf.set("spark.sql.catalog.graft_zrs", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_zrs.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    val sum = s.sql(
      s"CALL graft_zrs.rewrite_clustered('$table', 'v', 12)").collect()(0)
    assert(sum.getLong(2) == 400L, s"row count must survive: $sum")
    // reads are value-identical
    val after = SinkSource.load(s, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(after == before, "the rewrite must preserve row semantics")
    // one-key-per-file invariant held
    val perFile = SinkSource.manifest(root).groupBy(_._2)
      .view.mapValues(_.map(_._1).distinct.size)
    assert(perFile.values.forall(_ == 1), "one key per file")
    // the same predicate now rules out files — and the kill-shot
    // proves the scan never plans them
    val ruled = ruledOut(root, 200L)
    assert(ruled.nonEmpty, "clustered layout must be skippable")
    val f = SinkSource.fs(root)
    ruled.foreach(fl => f.delete(new Path(root, s"data/$fl"), false))
    val got = SinkSource.load(s, root).filter(col("v") < 200)
      .selectExpr("count(1)", "sum(v)").head
    assert(got.getLong(0) == 200L && got.getLong(1) == (0L until 200L).sum,
      s"skipped read must stay exact: $got")
  }

  test("MoR rewrite materializes vectors and equality deletes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_zrm").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 20L).map(v => (v % 2, v)).toDF("k", "v"),
      root, overwrite = true)
    SinkSource.equalityDelete(root, "v", Seq(4L, 5L))
    s.conf.set("spark.sql.catalog.graft_zrm", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_zrm.root",
      new Path(root).getParent.toString)
    s.conf.set("spark.sql.catalog.graft_zrm.mor", "true")
    val table = new Path(root).getName
    s.sql(s"DELETE FROM graft_zrm.`$table` WHERE k = 0 AND v = 2")
    val before = SinkSource.load(s, root, mor = true).select("v")
      .collect().map(_.getLong(0)).sorted.toSeq
    // raw refuses while eq deletes ride; the MoR verb materializes
    s.conf.set("spark.sql.catalog.graft_zraw", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_zraw.root",
      new Path(root).getParent.toString)
    intercept[Exception] {
      s.sql(s"CALL graft_zraw.rewrite_clustered('$table', 'v', 12)").collect() }
    s.sql(s"CALL graft_zrm.rewrite_clustered('$table', 'v', 12)").collect()
    assert(SinkSource.deleteSidecar(root).isEmpty)
    assert(SinkSource.eqDeletes(root).isEmpty)
    assert(SinkSource.load(s, root).select("v")
      .collect().map(_.getLong(0)).sorted.toSeq == before,
      "materialized state must equal the merged read")
  }

  test("refusals: unknown and non-BIGINT cluster columns") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_zrr").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), root, overwrite = true)
    s.conf.set("spark.sql.catalog.graft_zrf", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_zrf.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    s.sql(s"ALTER TABLE graft_zrf.`$table` ADD COLUMN tag STRING")
    intercept[Exception] {
      s.sql(s"CALL graft_zrf.rewrite_clustered('$table', 'nope', 4)").collect() }
    intercept[Exception] {
      s.sql(s"CALL graft_zrf.rewrite_clustered('$table', 'tag', 4)").collect() }
    assert(SinkSource.manifest(root).size == 1, "refusals rewrite nothing")
  }
}
