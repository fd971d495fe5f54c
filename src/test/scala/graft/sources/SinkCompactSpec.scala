package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q276 — the compaction procedure. The oracle proves post-compaction
  * contents + the one-file-per-key bound; this spec locks the
  * PROCEDURE contract: CALL returns the typed summary row, the
  * manifest ends one-file-per-key, row contents are identical across
  * the swap, untouched single-file groups keep their entries
  * verbatim, and a second CALL is a no-op (keys_compacted = 0).
  */
class SinkCompactSpec extends SparkSpec {

  test("CALL compacts multi-file groups and reports what it did") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    // keys 0..3 scattered over 2 tasks x 2 appends = up to 4 files
    // each; key 9 staged alone in one file (must stay untouched)
    val scattered = (0L until 80L).map(i => (i % 4, i)).toDF("k", "v")
      .repartition(2)
    SinkSource.write(scattered.filter(col("v") % 2 === 0), s"$root/t",
      overwrite = true)
    SinkSource.write(scattered.filter(col("v") % 2 =!= 0), s"$root/t",
      overwrite = false)
    SinkSource.write(Seq((9L, 900L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = false)
    val before = SinkSource.manifest(s"$root/t")
    val singleBefore = before.filter(_._1 == 9L)
    assert(before.groupBy(_._1).exists(_._2.size > 1),
      "fixture no longer produces multi-file keys")
    val rowsBefore = SinkSource.load(s, s"$root/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    val summary = s.sql("CALL graft_sink.compact('t')").collect()
    assert(summary.length == 1)
    val (kc, fb, fa) = (summary(0).getLong(0), summary(0).getLong(1),
      summary(0).getLong(2))
    assert(kc == 4L, s"expected 4 compacted keys, got $kc")
    assert(fb == before.map(_._2).distinct.size.toLong,
      s"files_before miscounted: $fb")
    assert(fa == 5L, s"4 compacted keys + 1 untouched = 5 files, got $fa")

    val after = SinkSource.manifest(s"$root/t")
    assert(after.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1),
      s"compaction left a multi-file key: $after")
    assert(after.filter(_._1 == 9L) == singleBefore,
      "the single-file group must keep its manifest entry verbatim")
    val rowsAfter = SinkSource.load(s, s"$root/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rowsAfter == rowsBefore, "compaction changed table contents")

    // idempotence: nothing left to compact
    val again = s.sql("CALL graft_sink.compact('t')").collect()(0)
    assert(again.getLong(0) == 0L && again.getLong(2) == 5L,
      s"second CALL should be a no-op: $again")
  }
}
