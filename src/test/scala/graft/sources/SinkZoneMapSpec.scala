package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q294 / q295 — zone maps: per-file (min, max) column stats recorded
  * as `#stat` manifest headers at commit, read back for FILE SKIPPING
  * (pushed predicates prune splits whose range can't match) and for
  * METADATA-ONLY MIN/MAX aggregate pushdown. The oracle proves the
  * row answers; this spec locks the mechanism:
  *   - the write path records sound stats (non-null BIGINT ranges,
  *     no stat for all-NULL or non-BIGINT columns);
  *   - skipping is proven by kill-shot (ruled-out files physically
  *     removed; the filtered read never plans them) and soundness by
  *     comparison against the unskipped answer;
  *   - stats survive appends (carry-forward) and are DROPPED with
  *     files that leave the manifest;
  *   - skipping composes with MoR tombstones;
  *   - MIN/MAX pushdown answers with the data directory removed, and
  *     REFUSES (falls back to the row scan) on tombstoned snapshots
  *     and on files without stat coverage.
  */
class SinkZoneMapSpec extends SparkSpec {

  private def temp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_zm_$tag").toString

  import org.apache.spark.sql.DataFrame
  private def write(df: DataFrame, path: String, overwrite: Boolean): Unit =
    SinkSource.write(df, path, overwrite)

  test("the writer records per-file min/max of non-null BIGINT columns") {
    val root = temp("rec")
    import spark.implicits._
    write(Seq((1L, 10L), (1L, 30L), (2L, -5L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)
    val stats = SinkSource.manifestStats(s"$root/t")
    val byKey = SinkSource.manifest(s"$root/t")
      .map { case (k, f, _) => k -> stats.get(f) }.toMap
    assert(byKey(1L).contains(Seq((2, 10L, 30L))), s"k=1 stats: ${byKey(1L)}")
    assert(byKey(2L).contains(Seq((2, -5L, -5L))), s"k=2 stats: ${byKey(2L)}")
  }

  test("all-NULL and non-BIGINT columns carry no stat; nulls are excluded") {
    val root = temp("nulls")
    // evolve to (k, v, w BIGINT, s STRING), write rows with w sometimes
    // null per key and s strings: w's stat covers non-nulls only, s and
    // the all-null group get none
    spark.conf.set("spark.sql.catalog.graft_zmn", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_zmn.root", root)
    import spark.implicits._
    write(Seq((1L, 10L)).toDF("k", "v").coalesce(1), s"$root/t",
      overwrite = true)
    spark.sql("ALTER TABLE graft_zmn.t ADD COLUMN w BIGINT")
    spark.sql("ALTER TABLE graft_zmn.t ADD COLUMN s STRING")
    spark.sql("""INSERT INTO graft_zmn.t VALUES
      (5, 100, 7, 'a'), (5, 200, NULL, 'b'), (6, 300, NULL, 'c')""")
    // a key may span several files (one per writer task); merge its
    // zone maps: min of mins, max of maxes per field id
    val stats = SinkSource.manifestStats(s"$root/t")
    def merged(k: Long): Map[Int, (Long, Long)] =
      SinkSource.manifest(s"$root/t").filter(_._1 == k).map(_._2).distinct
        .flatMap(f => stats.getOrElse(f, Seq.empty))
        .groupBy(_._1).map { case (id, ss) =>
          id -> ((ss.map(_._2).min, ss.map(_._3).max)) }
    assert(merged(5L) == Map(2 -> ((100L, 200L)), 3 -> ((7L, 7L))),
      s"k=5 stats: ${merged(5L)}")
    // k=6: w all-null -> no field-3 stat; s never gets one
    assert(merged(6L) == Map(2 -> ((300L, 300L))), s"k=6 stats: ${merged(6L)}")
  }

  test("skipping is sound and proven: ruled-out files removed, answers hold") {
    val root = temp("skip")
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i % 4, i))
    write(rows.toDF("k", "v").repartitionByRange(8, col("v")),
      s"$root/t", overwrite = true)
    val t = SinkSource.load(spark, s"$root/t")
    val expected = rows.filter { case (k, v) => v < 50 && k >= 1 }
      .map(_._2).sum
    // plan shows the pushed filters and a non-zero skip
    val df = t.filter(col("v") < 50 && col("k") >= 1)
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("skippedFiles="), s"no skip evidence:\n$desc")
    // kill-shot: remove every file whose v-range is >= 50 entirely
    val stats = SinkSource.manifestStats(s"$root/t")
    val ruledOut = SinkSource.manifest(s"$root/t").map(_._2).distinct
      .filter(f => stats.get(f)
        .exists(_.exists { case (id, mn, _) => id == 2 && mn >= 50L }))
    assert(ruledOut.nonEmpty, "fixture must produce skippable files")
    val fs = SinkSource.fs(root)
    ruledOut.foreach(f => fs.delete(new Path(s"$root/t/data/$f"), false))
    val got = df.agg(sum(col("v"))).collect()(0).getLong(0)
    assert(got == expected, s"skipped read wrong: $got vs $expected")
    // and the UNfiltered read must fail — proving those files would
    // have been planned without the zone maps
    intercept[Exception] { t.agg(sum(col("v"))).collect() }
  }

  test("stats carry forward across appends and drop with their files") {
    val root = temp("carry")
    import spark.implicits._
    write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)
    val v1files = SinkSource.manifest(s"$root/t").map(_._2).toSet
    write(Seq((1L, 100L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = false)
    val stats2 = SinkSource.manifestStats(s"$root/t")
    assert(v1files.forall(stats2.contains),
      s"append lost carried stats: ${stats2.keySet} vs $v1files")
    // metadata delete of k=2 drops its file AND its stat header
    SinkSource.load(spark, s"$root/t") // ensure readable
    spark.conf.set("spark.sql.catalog.graft_zmc", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_zmc.root", root)
    spark.sql("DELETE FROM graft_zmc.t WHERE k = 2")
    val stats3 = SinkSource.manifestStats(s"$root/t")
    val cited = SinkSource.manifest(s"$root/t").map(_._2).toSet
    assert(stats3.keySet == cited,
      s"stats must track cited files exactly: ${stats3.keySet} vs $cited")
  }

  test("skipping composes with MoR tombstones") {
    val root = temp("mor")
    import spark.implicits._
    val rows = (0L until 100L).map(i => (i % 2, i))
    write(rows.toDF("k", "v").repartitionByRange(4, col("v")),
      s"$root/t", overwrite = true)
    spark.conf.set("spark.sql.catalog.graft_zmm", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_zmm.root", root)
    spark.conf.set("spark.sql.catalog.graft_zmm.mor", "true")
    spark.sql("DELETE FROM graft_zmm.t WHERE v % 10 = 3")
    val got = spark.table("graft_zmm.t").filter(col("v") < 30)
      .agg(sum(col("v"))).collect()(0).getLong(0)
    val expected = rows.map(_._2).filter(v => v < 30 && v % 10 != 3).sum
    assert(got == expected, s"mor+skip wrong: $got vs $expected")
    val desc = spark.table("graft_zmm.t").filter(col("v") < 30)
      .queryExecution.executedPlan.toString
    assert(desc.contains("skippedFiles="), s"no mor skip evidence:\n$desc")
  }

  test("MIN/MAX pushdown answers from metadata alone") {
    val root = temp("minmax")
    import spark.implicits._
    val rows = (0L until 60L).map(i => (i % 3, i * 7))
    write(rows.toDF("k", "v").repartition(4, col("k")),
      s"$root/t", overwrite = true)
    SinkSource.load(spark, s"$root/t").createOrReplaceTempView("zm_mm")
    val df = spark.sql(
      "SELECT k, COUNT(*) AS n, MIN(v) AS mn, MAX(v) AS mx FROM zm_mm GROUP BY k")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SinkManifestAggScan"), s"not pushed:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown should plan no aggregate node:\n$plan")
    assert(SinkSource.fs(root).delete(new Path(s"$root/t/data"), true))
    val got = df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      k -> ((rs.size.toLong, rs.map(_._2).min, rs.map(_._2).max)) }
    assert(got == expected, s"metadata extremes wrong: $got vs $expected")
  }

  test("MIN/MAX refuses the push without proof") {
    // (a) tombstoned snapshot: vectors make stats over-approximate
    val root = temp("refuse")
    import spark.implicits._
    write((0L until 40L).map(i => (i % 2, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)
    spark.conf.set("spark.sql.catalog.graft_zmr", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_zmr.root", root)
    spark.conf.set("spark.sql.catalog.graft_zmr.mor", "true")
    spark.sql("DELETE FROM graft_zmr.t WHERE v = 39") // the max, tombstoned
    SinkSource.load(spark, s"$root/t").createOrReplaceTempView("zm_ref")
    val plan = spark.sql("SELECT MAX(v) FROM zm_ref")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinkManifestAggScan"),
      s"tombstoned snapshot must refuse MIN/MAX push:\n$plan")
    // (b) a file without stat coverage (pre-stats history, simulated
    // by stripping #stat headers from the manifest) refuses too
    val root2 = temp("legacy")
    write(Seq((1L, 5L), (1L, 9L)).toDF("k", "v").coalesce(1),
      s"$root2/t", overwrite = true)
    val f = SinkSource.fs(root2)
    val mf = new Path(s"$root2/t/manifest.v1.psv")
    val in = f.open(mf)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val stripped = body.linesIterator
      .filterNot(_.startsWith("#stat|")).mkString("\n") + "\n"
    f.delete(mf, false)
    val out = f.create(mf, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    SinkSource.load(spark, s"$root2/t").createOrReplaceTempView("zm_leg")
    val plan2 = spark.sql("SELECT MIN(v) FROM zm_leg")
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("SinkManifestAggScan"),
      s"stat-less files must refuse MIN/MAX push:\n$plan2")
    // the fallback row scan still answers
    assert(spark.sql("SELECT MIN(v) AS m FROM zm_leg")
      .collect()(0).getLong(0) == 5L)
    // and COUNT(*) still pushes (needs no zone maps)
    val plan3 = spark.sql("SELECT COUNT(*) FROM zm_leg")
      .queryExecution.executedPlan.toString
    assert(plan3.contains("SinkManifestAggScan"),
      s"count push must survive stat-less files:\n$plan3")
  }
}
