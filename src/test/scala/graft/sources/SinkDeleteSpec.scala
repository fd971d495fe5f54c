package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q261 — V2 metadata delete. The oracle proves the survivors; this
  * spec locks the CONTRACT: a key-aligned DELETE drops manifest
  * entries without touching surviving data files, and any predicate
  * finer than the layout key is REJECTED, not approximated.
  */
class SinkDeleteSpec extends SparkSpec {

  private def catalogSession(root: String) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.catalog.graft_sink",
      classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s
  }

  private def stage(root: String): Unit = {
    import spark.implicits._
    val df = (0L until 40L).map(i => (i % 4, i)).toDF("k", "v")
      .repartition(2, col("k"))
    SinkSource.write(df, s"$root/t", overwrite = true)
  }

  test("a key-aligned DELETE is metadata-only") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_sinkdel").toString
    stage(root)
    val s = catalogSession(root)
    val f = SinkSource.fs(root)
    val dataDir = new Path(s"$root/t/data")
    def snapshot() = f.listStatus(dataDir)
      .map(st => st.getPath.getName -> st.getModificationTime).toMap
    val before = snapshot()
    s.sql("DELETE FROM graft_sink.t WHERE k = 1 OR k >= 3")
    val after = snapshot()
    // survivors' files are byte-for-byte untouched (same file, same
    // mtime); the doomed keys' files are gone
    val (kept, dropped) = before.partition(e =>
      e._1.endsWith("_k0.psv") || e._1.endsWith("_k2.psv"))
    assert(kept.forall { case (n, t) => after.get(n).contains(t) },
      "a surviving data file was rewritten by a metadata delete")
    assert(dropped.keySet.forall(!after.contains(_)),
      s"deleted keys' files survived: ${after.keySet}")
    val ks = SinkSource.load(spark, s"$root/t").select(col("k"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ks == Set(0L, 2L), s"wrong survivors: $ks")
  }

  test("a sub-key predicate never takes the metadata path") {
    // before q274 the table REJECTED sub-key deletes (canDeleteWhere
    // still does — SinkRowLevelSpec pins that the metadata arm stays
    // key-aligned); with SupportsRowLevelOperations the engine now
    // routes them through the copy-on-write REWRITE instead, so the
    // delete succeeds with exact row-level semantics, never a
    // manifest-grain approximation
    val root = java.nio.file.Files
      .createTempDirectory("graft_sinkdel2").toString
    stage(root)
    val s = catalogSession(root)
    assert(!new SinkTable(s"$root/t").canDeleteWhere(
      Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.GreaterThan("v", 10L))),
      "the metadata arm must keep rejecting sub-key predicates")
    val before = SinkSource.load(spark, s"$root/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    s.sql("DELETE FROM graft_sink.t WHERE v > 10")
    val after = SinkSource.load(spark, s"$root/t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before.filter(_._2 <= 10L),
      s"the rewrite arm deleted the wrong rows: $after")
  }
}
