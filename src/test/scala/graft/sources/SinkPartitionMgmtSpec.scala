package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q290 — partition management DDL. The oracle proves the post-drop
  * table; this spec locks the DDL contract: SHOW PARTITIONS lists the
  * manifest's distinct keys (and answers with the data directory
  * REMOVED — metadata-only), a spec-scoped listing filters, DROP
  * PARTITION removes the key and its files, dropping a missing
  * partition errors (and IF EXISTS doesn't), and ADD PARTITION is
  * refused.
  */
class SinkPartitionMgmtSpec extends SparkSpec {

  test("SHOW/DROP PARTITION run on manifest arithmetic") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pm").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 50L).map(i => (i % 5, i)).toDF("k", "v")
      .repartition(5, col("k")), s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_pm", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_pm.root", root)
    s.conf.set("spark.sql.catalog.graft_pm.partman", "true")

    def parts() = s.sql("SHOW PARTITIONS graft_pm.t").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(parts() == (0 until 5).map(k => s"k=$k"), parts())

    // spec-scoped listing
    val one = s.sql("SHOW PARTITIONS graft_pm.t PARTITION (k = 3)")
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("k=3"), one)

    // metadata-only: answers with the data directory gone
    val f = SinkSource.fs(root)
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/t/data")
    val stash = new org.apache.hadoop.fs.Path(s"$root/t/data_stash")
    assert(f.rename(dataDir, stash))
    assert(parts().size == 5, "SHOW PARTITIONS opened data files")
    assert(f.rename(stash, dataDir))

    // DROP removes the key and its files
    val dropped = SinkSource.manifest(s"$root/t")
      .filter(_._1 == 2L).map(_._2)
    s.sql("ALTER TABLE graft_pm.t DROP PARTITION (k = 2)")
    assert(parts() == Seq("k=0", "k=1", "k=3", "k=4"), parts())
    dropped.foreach { fl =>
      assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/t/data/$fl")),
        s"dropped partition's file must be GC'd: $fl") }
    assert(s.sql("SELECT COUNT(*) FROM graft_pm.t").collect()(0).getLong(0)
      == 40L)

    // missing partition: loud without IF EXISTS, silent with
    intercept[Exception] {
      s.sql("ALTER TABLE graft_pm.t DROP PARTITION (k = 2)")
    }
    s.sql("ALTER TABLE graft_pm.t DROP IF EXISTS PARTITION (k = 2)")

    // partitions exist by containing data: ADD is refused
    val ex = intercept[Exception] {
      s.sql("ALTER TABLE graft_pm.t ADD PARTITION (k = 9)")
    }
    assert(ex.getMessage.contains("writes create them"), ex.getMessage)
  }
}
