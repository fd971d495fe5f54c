package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q283 — snapshot tags / write-audit-publish. The oracle proves the
  * published read; this spec locks the TAG contract: a tag pins its
  * version across later appends, moving it is a metadata swap that
  * repoints consumers, unknown tags fail loudly, and out-of-history
  * versions are rejected at CALL time.
  */
class TagSpec extends SparkSpec {

  test("tags pin, move, and reject bad versions") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_tags").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 20L).map(i => (i % 2, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)   // v1
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)

    val set = s.sql("CALL graft_sink.tag('t', 1, 'published')").collect()(0)
    assert(set.getString(0) == "published" && set.getLong(1) == 1L)

    SinkSource.write(Seq((0L, 100L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = false)                             // v2
    def publishedCount() =
      s.sql("SELECT COUNT(*) FROM graft_sink.t VERSION AS OF 'published'")
        .collect()(0).getLong(0)
    assert(publishedCount() == 20L,
      "the tag must pin v1 across the later append")

    s.sql("CALL graft_sink.tag('t', 2, 'published')").collect()
    assert(publishedCount() == 21L,
      "moving the tag must repoint consumers to v2")

    val unknown = intercept[Exception] {
      s.sql("SELECT COUNT(*) FROM graft_sink.t VERSION AS OF 'nope'")
        .collect()
    }
    assert(unknown.getMessage != null)

    val outOfHistory = intercept[Exception] {
      s.sql("CALL graft_sink.tag('t', 9, 'published')").collect()
    }
    assert(outOfHistory.getMessage != null)
    // the failed CALL must not have moved the tag
    assert(publishedCount() == 21L, "a rejected tag call moved the pointer")
  }
}
