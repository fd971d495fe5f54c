package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q296 — batch change data feed. The oracle proves the change-row
  * values; this spec locks the protocol:
  *   - the feed is DELTA-ONLY (pre-window files are never opened —
  *     kill-shot with them physically removed);
  *   - deletes carry the retracted VALUES out of the live file, and
  *     only the positions NEW in the version (not re-reported);
  *   - rewritten history (truncate, compaction) refuses loudly;
  *   - an ALTER version contributes zero change rows, and mixed-
  *     schema windows read with the schema as of `to`;
  *   - window validation fails loudly at plan time.
  */
class SinkChangesSpec extends SparkSpec {

  private def temp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cdf_$tag").toString

  test("insert feed is delta-only: pre-window files can be gone") {
    val root = temp("delta")
    import spark.implicits._
    SinkSource.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)                                   // v1
    SinkSource.write(Seq((1L, 30L), (3L, 40L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = false)                                  // v2
    // kill-shot: remove v1's files; the (1,2] feed must not miss them
    val f = SinkSource.fs(root)
    SinkSource.manifest(s"$root/t", Some(1)).map(_._2).foreach(fl =>
      f.delete(new Path(s"$root/t/data/$fl"), false))
    val got = SinkChanges.load(spark, s"$root/t", 1, 2)
      .select("k", "v", "_change_type", "_commit_version")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set((1L, 30L, "insert", 2L), (3L, 40L, "insert", 2L)),
      s"wrong delta: $got")
  }

  test("deletes carry retracted values, only the NEW positions") {
    val root = temp("del")
    import spark.implicits._
    SinkSource.write((0L until 20L).map(i => (i % 2, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)        // v1
    spark.conf.set("spark.sql.catalog.graft_cdft", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdft.root", root)
    spark.conf.set("spark.sql.catalog.graft_cdft.mor", "true")
    spark.sql("DELETE FROM graft_cdft.t WHERE v < 5")                 // v2
    spark.sql("DELETE FROM graft_cdft.t WHERE v >= 15")               // v3
    // v2's feed: exactly v<5 retracted, values intact
    val d2 = SinkChanges.load(spark, s"$root/t", 1, 2)
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(d2 == (0L until 5L).map((_, "delete")).toSet, s"v2 feed: $d2")
    // v3's feed must NOT re-report v2's tombstones
    val d3 = SinkChanges.load(spark, s"$root/t", 2, 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(d3 == (15L until 20L).toSet, s"v3 feed re-reported: $d3")
    // MoR UPDATE = delete + insert in one version
    spark.sql("UPDATE graft_cdft.t SET v = v + 100 WHERE v = 7")      // v4
    val d4 = SinkChanges.load(spark, s"$root/t", 3, 4)
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(d4 == Set((7L, "delete"), (107L, "insert")), s"v4 feed: $d4")
  }

  test("rewritten history refuses loudly; windows validate") {
    val root = temp("refuse")
    import spark.implicits._
    SinkSource.write(Seq((1L, 1L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)
    SinkSource.write(Seq((1L, 2L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true) // truncate: v1's file leaves
    intercept[UnsupportedOperationException] {
      SinkChanges.load(spark, s"$root/t", 0, 2).count()
    }
    // a window beyond history fails at table construction
    intercept[Exception] {
      SinkChanges.load(spark, s"$root/t", 0, 99).count()
    }
  }

  test("an ALTER version contributes zero rows; mixed schemas read as of `to`") {
    val root = temp("alter")
    import spark.implicits._
    SinkSource.write(Seq((1L, 10L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)                                   // v1
    spark.conf.set("spark.sql.catalog.graft_cdfa", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdfa.root", root)
    spark.sql("ALTER TABLE graft_cdfa.t ADD COLUMN w BIGINT")         // v2
    spark.sql("INSERT INTO graft_cdfa.t VALUES (2, 20, 7)")           // v3
    val feed = SinkChanges.load(spark, s"$root/t", 0, 3)
    assert(feed.schema.fieldNames.toSeq ==
      Seq("k", "v", "w", "_change_type", "_commit_version"),
      feed.schema.simpleString)
    val got = feed.select("k", "v", "w", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    // v1's row reads w as NULL (pre-evolution file); no v2 rows at all
    assert(got == Set((1L, 10L, -1L, 1L), (2L, 20L, 7L, 3L)), s"feed: $got")
  }
}
