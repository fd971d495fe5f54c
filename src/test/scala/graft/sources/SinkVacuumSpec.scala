package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q280 — deletion-vector purge (vacuum). The oracle proves the
  * post-vacuum table; this spec locks the MAINTENANCE contract: the
  * vector-merging rewrite materializes tombstones (rows fall out, not
  * copied), the sidecar empties, vector files are GC'd, clean keys'
  * files are untouched, and reads are identical across the purge.
  */
class SinkVacuumSpec extends SparkSpec {

  test("compact on an MoR table purges vectors and keeps reads identical") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_vacuum").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    // keys 0..2 get tombstones; key 9 stays clean in its own file
    SinkSource.write((0L until 60L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(3, col("k")), s"$root/t", overwrite = true)
    SinkSource.write(Seq((9L, 900L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = false)
    s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root)
    s.conf.set("spark.sql.catalog.graft_mor.mor", "true")
    s.sql("DELETE FROM graft_mor.t WHERE v % 4 = 1")
    val f = SinkSource.fs(root)
    assert(f.listStatus(new Path(s"$root/t/deletes")).nonEmpty,
      "fixture should have produced vector files")
    val cleanBefore = SinkSource.manifest(s"$root/t").filter(_._1 == 9L)
    def rows() = s.sql("SELECT k, v FROM graft_mor.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val before = rows()

    val summary = s.sql("CALL graft_mor.compact('t')").collect()(0)
    assert(summary.getLong(0) == 3L,
      s"the three vectored keys should compact: $summary")

    assert(rows() == before, "vacuum changed the table contents")
    assert(SinkSource.manifest(s"$root/t").filter(_._1 == 9L) == cleanBefore,
      "the clean key's file must be untouched")
    // sidecar gone: the new version carries no vectors, and the vector
    // files themselves are GC'd
    val v = s.sql("SELECT COUNT(*) FROM graft_mor.t").collect()(0).getLong(0)
    assert(v == before.size.toLong)
    assert(!f.exists(new Path(s"$root/t/deletes")) ||
      f.listStatus(new Path(s"$root/t/deletes")).isEmpty,
      "fully-applied vector files must be GC'd")
    // a second call is a no-op
    val again = s.sql("CALL graft_mor.compact('t')").collect()(0)
    assert(again.getLong(0) == 0L, s"vacuum must be idempotent: $again")
  }
}
