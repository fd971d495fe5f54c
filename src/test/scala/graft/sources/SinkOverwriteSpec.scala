package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q289 — overwrite by filter. The oracle proves the backfilled table;
  * this spec locks the COMMIT contract: one atomic version swaps
  * exactly the matched keys' entries (kept entries verbatim, byte-
  * identical files), replaced files are GC'd only after the manifest
  * stops citing them, a non-key-aligned condition fails the statement
  * loudly (never approximates), and the AlwaysTrue degenerate case is
  * plain truncate.
  */
class SinkOverwriteSpec extends SparkSpec {

  test("filter overwrite swaps matched keys atomically; unaligned fails") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ow").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 60L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(3, col("k")), s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_ow", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ow.root", root)
    val keptBefore = SinkSource.manifest(s"$root/t").filter(_._1 != 1L)
    val replacedFiles = SinkSource.manifest(s"$root/t")
      .filter(_._1 == 1L).map(_._2).toSet
    val vBefore = SinkSource.currentVersion(s"$root/t")

    Seq((1L, 9991L), (1L, 9992L)).toDF("k", "v")
      .writeTo("graft_ow.t").overwrite($"k" === 1L)

    // one atomic version; kept entries verbatim; replaced files GC'd
    assert(SinkSource.currentVersion(s"$root/t") == vBefore + 1)
    val m = SinkSource.manifest(s"$root/t")
    assert(m.filter(_._1 != 1L) == keptBefore,
      "untouched keys' entries must carry over verbatim")
    val f = SinkSource.fs(root)
    replacedFiles.foreach { fl =>
      assert(!f.exists(new Path(s"$root/t/data/$fl")),
        s"replaced file must be GC'd after the swap: $fl") }
    val got = s.sql("SELECT k, v FROM graft_ow.t WHERE k = 1 ORDER BY v")
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(9991L, 9992L), s"backfill wrong: $got")
    assert(s.sql("SELECT COUNT(*) FROM graft_ow.t").collect()(0).getLong(0)
      == 40L + 2L)

    // a v-condition is finer than the layout grain: fail, never approximate
    val ex = intercept[Exception] {
      Seq((2L, 1L)).toDF("k", "v")
        .writeTo("graft_ow.t").overwrite($"v" > 100L)
    }
    assert(ex.getMessage.contains("aligned to the layout key"),
      ex.getMessage)
    assert(s.sql("SELECT COUNT(*) FROM graft_ow.t").collect()(0).getLong(0)
      == 42L, "a rejected overwrite must not change the table")

    // AlwaysTrue == truncate
    Seq((7L, 70L)).toDF("k", "v").writeTo("graft_ow.t").overwrite(lit(true))
    assert(s.sql("SELECT k, v FROM graft_ow.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 70L)))
  }
}
