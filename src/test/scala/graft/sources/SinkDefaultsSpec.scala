package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q309 — column defaults. The oracle proves the merged read; this
  * spec locks the mechanics: pre-ADD rows read the initial default
  * through BOTH readers (raw and MoR), the default is metadata-only
  * (no rewrite), time travel to the pre-ADD version never sees it,
  * compaction materializes defaults into rewritten bytes, and the
  * refusal matrix (SET DEFAULT, unparseable literals) holds.
  */
class SinkDefaultsSpec extends SparkSpec {

  test("initial defaults serve pre-ADD rows without a rewrite; compaction materializes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dflt").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("k", "v"),
      root, overwrite = true)                                        // v1
    s.conf.set("spark.sql.catalog.graft_df", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_df.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    val filesBefore = SinkSource.manifest(root).map(_._2).toSet
    s.sql(s"ALTER TABLE graft_df.`$table` ADD COLUMN st BIGINT DEFAULT 7")
    s.sql(s"ALTER TABLE graft_df.`$table` ADD COLUMN tag STRING " +
      "DEFAULT 'a''b'") // embedded quote pins the unescaping
    assert(SinkSource.manifest(root).map(_._2).toSet == filesBefore,
      "defaults are metadata-only")
    s.sql(s"INSERT INTO graft_df.`$table` VALUES (1, 4, NULL, 'x')")
    def rows() = s.table(s"graft_df.`$table`")
      .select("v", "st", "tag").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .sorted.toSeq
    val expect = Seq((1L, 7L, "a'b"), (2L, 7L, "a'b"), (3L, 7L, "a'b"),
      (4L, -1L, "x"))
    assert(rows() == expect, rows().toString)
    // time travel to the pre-ADD snapshot: no column, no default
    assert(s.sql(s"SELECT * FROM graft_df.`$table` VERSION AS OF 1")
      .columns.toSeq == Seq("k", "v"))
    // compaction materializes the defaults into rewritten bytes and
    // the read stays identical
    s.sql(s"CALL graft_df.compact('$table')").collect()
    assert(rows() == expect, "compaction must preserve default reads")
    // the MoR reader serves defaults identically (delta scans and
    // mor loads share it)
    assert(SinkSource.load(s, root, mor = true).select("st")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
      .sorted.toSeq == Seq(-1L, 7L, 7L, 7L))
  }

  test("the refusal matrix holds") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dflt_ref").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), root, overwrite = true)
    s.conf.set("spark.sql.catalog.graft_dr", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_dr.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    s.sql(s"ALTER TABLE graft_dr.`$table` ADD COLUMN st BIGINT DEFAULT 5")
    val vBefore = SinkSource.currentVersion(root)
    // initial defaults are immutable
    intercept[Exception] {
      s.sql(s"ALTER TABLE graft_dr.`$table` ALTER COLUMN st SET DEFAULT 9") }
    intercept[Exception] {
      s.sql(s"ALTER TABLE graft_dr.`$table` ALTER COLUMN st DROP DEFAULT") }
    assert(SinkSource.currentVersion(root) == vBefore,
      "refused ALTERs must not publish")
  }
}
