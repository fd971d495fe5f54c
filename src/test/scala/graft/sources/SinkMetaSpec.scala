package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q286 — metadata tables (`t.history` / `t.files`). The oracle proves
  * the history arithmetic; this spec locks what the oracle can't see:
  * the files table lists exactly the current manifest's entries (and
  * nothing from staged/aborted writes), vector counts appear after a
  * MoR delete and retire after vacuum, expiry drops rows from history,
  * tags column tracks tag moves, and the scan is a LocalScan (zero
  * input partitions planned against data).
  */
class SinkMetaSpec extends SparkSpec {

  test("files and history serve manifest arithmetic and track the lifecycle") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_meta").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 30L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(3, col("k")), s"$root/t", overwrite = true)  // v1
    SinkSource.write(Seq((9L, 900L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = false)                            // v2
    s.conf.set("spark.sql.catalog.graft_meta", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_meta.root", root)
    s.conf.set("spark.sql.catalog.graft_meta.mor", "true")

    // files = the current manifest, verbatim
    val files = s.sql("SELECT k, file, n_rows FROM graft_meta.t.files")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    val manifest = SinkSource.manifest(s"$root/t")
      .sortBy(e => (e._1, e._2))
    assert(files == manifest, s"files table drifted: $files vs $manifest")

    // history: v1 then v2, cumulative rows 30 then 31, no vectors yet
    val hist = s.sql(
      "SELECT version, n_rows, n_vectors, tags FROM graft_meta.t.history " +
        "ORDER BY version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(hist.toSeq == Seq((1L, 30L, 0L, ""), (2L, 31L, 0L, "")), hist.toSeq)

    // a MoR delete surfaces vector accounting in BOTH tables
    s.sql("DELETE FROM graft_meta.t WHERE v IN (0, 1)")
    val vecs = s.sql(
      "SELECT CAST(SUM(n_vectors) AS BIGINT) FROM graft_meta.t.files")
      .collect()(0).getLong(0)
    assert(vecs == 2L, s"expected 2 vectored files, got $vecs")
    val v3 = s.sql(
      "SELECT n_vectors FROM graft_meta.t.history WHERE version = 3")
      .collect()(0).getLong(0)
    assert(v3 == 2L, s"history must carry the sidecar count: $v3")

    // tag then expire: the tag shows on its version; expired versions
    // drop out of history
    s.sql("CALL graft_meta.tag('t', 2, 'pinned')").collect()
    s.sql("CALL graft_meta.expire('t', 1)").collect()
    val after = s.sql(
      "SELECT version, tags FROM graft_meta.t.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(after.toSeq == Seq((2L, "pinned"), (3L, "")),
      s"history after expiry: ${after.toSeq}")

    // the scan is driver-local metadata: a LocalScan plans no input
    // partitions against data files
    val plan = s.sql("SELECT * FROM graft_meta.t.files")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("LocalScan"),
      s"metadata table must be a local scan:\n$plan")
  }

  test("the partitions table reports layout groups per era (q314)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_meta_part").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 12L).map(i => (i % 6, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)  // v1
    s.conf.set("spark.sql.catalog.graft_metp", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_metp.root", root)
    // single-era: six identity groups, 2 rows each
    val era0 = s.sql("SELECT key, spec_id, transform, n_rows " +
      "FROM graft_metp.t.partitions ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(era0.toSeq == (0L until 6L).map(k => (k, 0L, "identity", 2L)),
      s"identity-era partitions: ${era0.toSeq}")
    // evolve + append: bucket groups appear as their own era rows;
    // identity rows stay put (nothing was rewritten)
    s.sql("CALL graft_metp.evolve_spec('t', 'bucket(3)')").collect()
    SinkSource.write((12L until 24L).map(i => (i % 6, i)).toDF("k", "v"),
      s"$root/t", overwrite = false)
    val mixed = s.sql("SELECT key, spec_id, transform, n_rows " +
      "FROM graft_metp.t.partitions ORDER BY spec_id, key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expectBuckets = (12L until 24L).groupBy(i => (i % 6) % 3)
      .toSeq.sortBy(_._1).map { case (b, g) =>
        (b, 1L, "bucket(3)", g.size.toLong) }
    assert(mixed.toSeq ==
      (0L until 6L).map(k => (k, 0L, "identity", 2L)) ++ expectBuckets,
      s"mixed-era partitions: ${mixed.toSeq}")
    // file counts are >= 1 per group and the scan stays driver-local
    val nf = s.sql("SELECT n_files FROM graft_metp.t.partitions")
      .collect().map(_.getLong(0))
    assert(nf.forall(_ >= 1L))
    val plan = s.sql("SELECT * FROM graft_metp.t.partitions")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("LocalScan"),
      s"partitions table must be a local scan:\n$plan")
  }
}
