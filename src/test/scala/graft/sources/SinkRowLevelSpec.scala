package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q274/q275 — copy-on-write row-level operations. The oracles prove
  * final table states; this spec locks the GROUP contract: a runtime-
  * filtered UPDATE replaces only the affected key's files (untouched
  * groups keep their manifest entries verbatim), a fine-grained DELETE
  * rewrites groups while a key-aligned DELETE still takes the
  * metadata path, and MERGE upserts through the same machinery.
  */
class SinkRowLevelSpec extends SparkSpec {

  private def catSession(root: String) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s
  }

  private def staged(tag: String): String = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_rowlevel_$tag").toString
    import spark.implicits._
    val df = (0L until 60L).map(i => (i % 3, i)).toDF("k", "v")
    SinkSource.write(df.repartition(3, col("k")), s"$root/t",
      overwrite = true)
    root
  }

  private def snapshot(root: String): Map[(Long, Long), Long] =
    SinkSource.load(spark, s"$root/t").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (kv, rs) => kv -> rs.length.toLong }

  test("UPDATE rewrites only the affected key's groups") {
    val root = staged("upd")
    val s = catSession(root)
    val before = SinkSource.manifest(s"$root/t")
    s.sql("UPDATE graft_sink.t SET v = v + 1000 WHERE k = 1 AND v % 2 = 0")
    val after = SinkSource.manifest(s"$root/t")
    // untouched groups keep their entries verbatim
    val beforeOther = before.filter(_._1 != 1L).toSet
    val afterOther = after.filter(_._1 != 1L).toSet
    assert(afterOther == beforeOther,
      s"groups outside k=1 were rewritten:\n$beforeOther\nvs\n$afterOther")
    // k=1 groups were replaced (new file names), same row count
    assert(after.filter(_._1 == 1L).map(_._2).toSet
      .intersect(before.filter(_._1 == 1L).map(_._2).toSet).isEmpty,
      "k=1 files should have been swapped, not kept")
    val expected = (0L until 60L).map(i => (i % 3, i)).map {
      case (1L, v) if v % 2 == 0 => (1L, v + 1000)
      case kv => kv
    }.groupBy(identity).map { case (kv, rs) => kv -> rs.size.toLong }
    assert(snapshot(root) == expected, "UPDATE produced the wrong table")
  }

  test("fine-grained DELETE rewrites; key-aligned DELETE stays metadata") {
    val root = staged("del")
    val s = catSession(root)
    // finer than the layout key: q261's metadata arm REJECTS this, the
    // row-level arm rewrites the affected groups
    s.sql("DELETE FROM graft_sink.t WHERE v % 4 = 1")
    val expected = (0L until 60L).filter(_ % 4 != 1).map(i => (i % 3, i))
      .groupBy(identity).map { case (kv, rs) => kv -> rs.size.toLong }
    assert(snapshot(root) == expected, "fine DELETE produced the wrong table")

    // key-aligned: pure metadata — every surviving data file untouched
    val filesBefore = SinkSource.manifest(s"$root/t")
      .filter(_._1 != 2L).map(_._2).toSet
    s.sql("DELETE FROM graft_sink.t WHERE k = 2")
    val filesAfter = SinkSource.manifest(s"$root/t").map(_._2).toSet
    assert(filesAfter == filesBefore,
      s"key-aligned delete must drop manifest entries only:\n" +
        s"$filesBefore vs $filesAfter")
    val expected2 = expected.filter { case ((k, _), _) => k != 2L }
    assert(snapshot(root) == expected2, "metadata DELETE lost rows")
  }

  test("MERGE INTO upserts through the same group rewrite") {
    val root = staged("merge")
    val s = catSession(root)
    import s.implicits._
    // updates for half of k=0's rows, inserts for a new key
    Seq((0L, 0L, 555L), (0L, 6L, 666L), (7L, 70L, 70L))
      .toDF("mk", "mv", "nv").createOrReplaceTempView("changes")
    s.sql(
      """MERGE INTO graft_sink.t
        |USING changes ON t.k = changes.mk AND t.v = changes.mv
        |WHEN MATCHED THEN UPDATE SET v = changes.nv
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (changes.mk, changes.nv)
        |""".stripMargin)
    val expected = ((0L until 60L).map(i => (i % 3, i)).map {
      case (0L, 0L) => (0L, 555L)
      case (0L, 6L) => (0L, 666L)
      case kv => kv
    } :+ (7L, 70L))
      .groupBy(identity).map { case (kv, rs) => kv -> rs.size.toLong }
    assert(snapshot(root) == expected, "MERGE produced the wrong table")
  }
}
