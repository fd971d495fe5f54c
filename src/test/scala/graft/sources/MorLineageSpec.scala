package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q284 — metadata-column lineage. The oracle proves the clustered
  * lineage report; this spec locks the MECHANISM: the scan honors the
  * engine's projection (a plain SELECT k prunes the read schema; a
  * metadata query widens it), and the (_file, _pos) a lineage query
  * reports is EXACTLY the slot a subsequent DELETE's deletion vector
  * addresses — identity and tombstone agree byte-for-byte.
  */
class MorLineageSpec extends SparkSpec {

  test("projection pruning and identity-vector agreement") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lineage").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 30L).map(i => (i % 3, i)).toDF("k", "v"),
      s"$root/t", overwrite = true, clustered = true)
    s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root)
    s.conf.set("spark.sql.catalog.graft_mor.mor", "true")

    // pruning: SELECT k narrows the scan's read schema to one column
    val narrow = s.sql("SELECT k FROM graft_mor.t")
    narrow.collect()
    val nPlan = narrow.queryExecution.executedPlan.toString
    assert(nPlan.contains("readSchema=[k]"),
      s"a one-column query must prune the MoR scan:\n$nPlan")

    // lineage: where does v=7 physically live?
    val slot = s.sql("SELECT _file, _pos FROM graft_mor.t WHERE v = 7")
      .collect()(0)
    val (file, pos) = (slot.getString(0), slot.getLong(1))
    // clustered write sorts (k, v): key 1 holds v = 1,4,7,... so v=7 is
    // that file's position 2
    assert(file.endsWith("_k1.psv") && pos == 2L,
      s"lineage slot wrong: ($file, $pos)")

    // the tombstone a DELETE writes addresses exactly that slot
    s.sql("DELETE FROM graft_mor.t WHERE v = 7")
    val dv = SinkSource.deleteSidecar(s"$root/t")
    assert(dv.map(_._1) == Seq(file),
      s"the vector must address the reported file: $dv")
    val f = SinkSource.fs(root)
    val in = f.open(new Path(s"$root/t/deletes/${dv.head._2}"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(body.trim == pos.toString,
      s"the vector must address the reported position: '$body' vs $pos")
  }
}
