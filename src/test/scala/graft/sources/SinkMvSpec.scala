package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q297 — incrementally-maintained materialized view. The oracle
  * proves the final aggregate; this spec locks the maintenance
  * protocol:
  *   - refresh is DELTA-ONLY (pre-watermark source files physically
  *     removed; refresh still lands the right answer);
  *   - the watermark rides the MV's txn ledger (the publishing
  *     commit records it atomically) and a head-level refresh
  *     publishes NOTHING;
  *   - deletes retract through the feed's values, and a group whose
  *     count reaches zero leaves the MV;
  *   - a rewritten source history fails the refresh loudly.
  */
class SinkMvSpec extends SparkSpec {

  private def temp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$tag").toString

  private def aggOf(mvPath: String): Map[Long, (Long, Long)] =
    SinkSource.load(spark, mvPath).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("refresh is delta-only and ledger-watermarked") {
    val root = temp("delta")
    import spark.implicits._
    SinkSource.write((0L until 30L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/src", overwrite = true)      // v1
    assert(SinkMv.create(spark, s"$root/mv", s"$root/src") == 1)
    assert(SinkMv.watermark(s"$root/mv") == 1)
    SinkSource.write((100L until 110L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/src", overwrite = false)     // v2
    // kill-shot: v1's source files vanish — a recompute is impossible,
    // only a delta read can refresh
    val f = SinkSource.fs(root)
    SinkSource.manifest(s"$root/src", Some(1)).map(_._2).foreach(fl =>
      f.delete(new Path(s"$root/src/data/$fl"), false))
    assert(SinkMv.refresh(spark, s"$root/mv") == 2)
    assert(SinkMv.watermark(s"$root/mv") == 2)
    val expected = ((0L until 30L) ++ (100L until 110L)).groupBy(_ % 3)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.sum)) }
    assert(aggOf(s"$root/mv") == expected, s"mv: ${aggOf(s"$root/mv")}")
    // and the full recompute really was impossible
    intercept[Exception] {
      SinkSource.load(spark, s"$root/src").agg(sum(col("v"))).collect()
    }
  }

  test("no-op refresh publishes nothing; deletes retract; empty groups leave") {
    val root = temp("retract")
    import spark.implicits._
    SinkSource.write((0L until 12L).map(i => (i % 4, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/src", overwrite = true)
    SinkMv.create(spark, s"$root/mv", s"$root/src")
    val before = SinkSource.currentVersion(s"$root/mv")
    assert(SinkMv.refresh(spark, s"$root/mv") == 1)
    assert(SinkSource.currentVersion(s"$root/mv") == before,
      "a head-level refresh must publish nothing")
    // retract group k=3 entirely (rows 3, 7, 11) and part of k=0
    spark.conf.set("spark.sql.catalog.graft_mvt", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mvt.root", root)
    spark.conf.set("spark.sql.catalog.graft_mvt.mor", "true")
    spark.sql("DELETE FROM graft_mvt.src WHERE v % 4 = 3 OR v = 0")
    assert(SinkMv.refresh(spark, s"$root/mv") == 2)
    val got = aggOf(s"$root/mv")
    assert(!got.contains(3L), s"empty group must leave the MV: $got")
    assert(got(0L) == ((2L, 12L)), s"k=0 after retraction: ${got(0L)}")
    assert(got(1L) == ((3L, 15L)) && got(2L) == ((3L, 18L)), got.toString)
  }

  test("a rewritten source history fails the refresh loudly") {
    val root = temp("rewrite")
    import spark.implicits._
    SinkSource.write(Seq((1L, 1L), (2L, 2L)).toDF("k", "v").coalesce(1),
      s"$root/src", overwrite = true)
    SinkMv.create(spark, s"$root/mv", s"$root/src")
    SinkSource.write(Seq((1L, 9L)).toDF("k", "v").coalesce(1),
      s"$root/src", overwrite = true) // truncate rewrite
    val ex = intercept[Exception] { SinkMv.refresh(spark, s"$root/mv") }
    // the feed's refusal may surface wrapped by the write job
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(t => t.isInstanceOf[UnsupportedOperationException] &&
      t.getMessage.contains("resync")), s"unexpected failure: $chain")
    // the failed refresh must not have moved the watermark
    assert(SinkMv.watermark(s"$root/mv") == 1)
  }
}
