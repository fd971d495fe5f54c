package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q288 — merge-on-read MERGE (WriteDelta + MergeRows). The oracle
  * proves the post-merge table; this spec locks the delta-MERGE
  * contract: existing data files are byte-untouched (matched updates
  * go through vectors, never a rewrite), vectors + appended files
  * publish in ONE commit (manifest advances exactly one version),
  * tombstoned positions equal the matched-row count, not-matched rows
  * append, and an unmatched-by-anything MERGE is a clean no-op commit
  * path.
  */
class SinkMorMergeSpec extends SparkSpec {

  test("MERGE tombstones matched rows and appends inserts in one commit") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_mor_merge").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    // keys 0..2, values 0..59; v is unique — the merge key
    SinkSource.write((0L until 60L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(3, col("k")), s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_mm", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mm.root", root)
    s.conf.set("spark.sql.catalog.graft_mm.mor", "true")
    val f = SinkSource.fs(root)
    def dataFiles() = f.listStatus(new Path(s"$root/t/data"))
      .filterNot(_.getPath.getName.startsWith("."))
      .map(st => st.getPath.getName -> st.getLen).toMap
    val before = dataFiles()
    val vBefore = SinkSource.currentVersion(s"$root/t")

    // matched: v % 10 = 0 (6 rows) -> shift key by 100
    // not matched: 3 new rows at v = 1000..1002
    Seq((0L, 1000L), (1L, 1001L), (2L, 1002L), (9L, 0L), (9L, 30L))
      .toDF("k", "v").createOrReplaceTempView("mm_src")
    s.sql(
      """MERGE INTO graft_mm.t t USING mm_src s ON t.v = s.v
        |WHEN MATCHED THEN UPDATE SET k = t.k + 100, v = t.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)

    // one commit: exactly one new manifest version
    assert(SinkSource.currentVersion(s"$root/t") == vBefore + 1,
      "MERGE must publish vectors and appends in ONE commit")
    // base files byte-untouched; appended files are strictly new
    val after = dataFiles()
    assert(before.forall { case (n, len) => after.get(n).contains(len) },
      s"MERGE touched an existing data file: $before vs $after")
    assert(after.size > before.size, "inserts/updates must append files")
    // tombstoned positions = matched rows (v=0 and v=30)
    val tombstones = SinkSource.deleteSidecar(s"$root/t").map { case (_, dv) =>
      val ls = new SinkSource.LineStream(s"$root/t/deletes/$dv")
      try Iterator.continually(ls).takeWhile(_.hasNext).map(_.next()).size
      finally ls.close()
    }.sum
    assert(tombstones == 2, s"expected 2 tombstoned positions: $tombstones")

    // table state: 60 rows with v=0,v=30 re-keyed, plus 3 inserts
    val got = s.sql("SELECT k, v FROM graft_mm.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expect = ((0L until 60L).map { i =>
      if (i == 0L || i == 30L) (i % 3 + 100, i) else (i % 3, i)
    } ++ Seq((0L, 1000L), (1L, 1001L), (2L, 1002L))).sorted
    assert(got == expect, s"post-merge state wrong: $got")

    // a MERGE that matches nothing and inserts nothing leaves the
    // table at a clean state (no stray files, correct reads)
    Seq((5L, -1L)).toDF("k", "v").createOrReplaceTempView("mm_none")
    s.sql(
      """MERGE INTO graft_mm.t t USING mm_none s
        |ON t.v = s.v AND s.v > 0
        |WHEN MATCHED THEN UPDATE SET k = t.k, v = t.v
        |""".stripMargin)
    val got2 = s.sql("SELECT k, v FROM graft_mm.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got2 == expect, "no-op MERGE changed the table")
  }
}
