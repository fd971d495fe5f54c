package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** q308 — null-count statistics. The oracle proves the three arms;
  * this spec locks the proof discipline: COUNT(col) plans the
  * manifest-agg scan (and answers with the data directory REMOVED),
  * the DISTINCT form and tombstoned snapshots refuse the push, and
  * null-skipping never skips a file without a record — the pre-ADD
  * files whose rows READ null must still be planned for `IS NULL`.
  */
class SinkNullStatsSpec extends SparkSpec {

  private val f3 = Seq(SinkSchemas.SinkField(1, "k", LongType),
    SinkSchemas.SinkField(2, "v", LongType),
    SinkSchemas.SinkField(3, "w", LongType))

  test("COUNT(col) answers from the manifest; DISTINCT and tombstones refuse") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_nulls").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L, Some(5L)), (0L, 2L, None),
      (1L, 3L, Some(7L))).map { case (k, v, w) => (k, v, w) }
      .toDF("k", "v", "w"), root, overwrite = true, fields = Some(f3))
    val agg = SinkSource.load(s, root).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), count(col("w")).as("nw"))
    assert(agg.queryExecution.executedPlan.toString
      .contains("SinkManifestAggScan"), "COUNT(col) must push")
    // kill-shot: metadata-only for real
    SinkSource.fs(root).delete(new Path(root, "data"), true)
    val got = agg.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq((0L, 2L, 1L), (1L, 1L, 1L)), got.toString)
    // DISTINCT has no metadata answer — must not plan the agg scan
    val distinctPlan = SinkSource.load(s, root).groupBy(col("k"))
      .agg(countDistinct(col("w"))).queryExecution.executedPlan.toString
    assert(!distinctPlan.contains("SinkManifestAggScan"),
      "COUNT(DISTINCT) must refuse the push")
    // a tombstoned snapshot refuses too
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_nulls_ts").toString
    SinkSource.write(Seq((0L, 1L, Some(5L)), (0L, 2L, None))
      .toDF("k", "v", "w"), root2, overwrite = true, fields = Some(f3))
    SinkSource.equalityDelete(root2, "v", Seq(1L))
    val tsPlan = SinkSource.load(s, root2).groupBy(col("k"))
      .agg(count(col("w"))).queryExecution.executedPlan.toString
    assert(!tsPlan.contains("SinkManifestAggScan"),
      "tombstoned snapshots must refuse the push")
  }

  test("null-skipping is sound: recordless files are read, proven files skip") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_nullskip").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    // era 1: the BASE contract (k, v) — w does not exist, so these
    // files carry NO null record for it, yet their rows READ null
    SinkSource.write(Seq((0L, 1L), (1L, 2L)).toDF("k", "v"), root,
      overwrite = true)
    s.conf.set("spark.sql.catalog.graft_ns", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ns.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    s.sql(s"ALTER TABLE graft_ns.`$table` ADD COLUMN w BIGINT")
    // era 2: w fully populated (null record says 0)
    s.sql(s"INSERT INTO graft_ns.`$table` VALUES (0, 10, 100), (1, 11, 101)")
    // `w IS NULL`: era-2 files are provably unmatched — and ONLY them
    val nulls = SinkSource.manifestNulls(root)
    val skippable = SinkSource.manifest(root).map(_._2).distinct
      .filter(fl => nulls.get(fl).exists(_.exists { case (id, n) =>
        id == 3 && n == 0 }))
    assert(skippable.nonEmpty, "the populated era must be skippable")
    val f = SinkSource.fs(root)
    skippable.foreach(fl => f.delete(new Path(root, s"data/$fl"), false))
    // the recordless era-1 files MUST still be planned (their rows
    // match IS NULL) — a skipper that drops recordless files loses
    // these rows and fails here
    val got = s.table(s"graft_ns.`$table`").filter(col("w").isNull)
      .select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L),
      s"recordless files must never be skipped: $got")
  }
}
