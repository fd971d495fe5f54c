package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q303 — type widening (`ALTER COLUMN .. TYPE ..`). The oracle
  * proves the mixed-era read; this spec locks the contracts around
  * it: the widening is metadata-only (no file rewrite), time travel
  * serves the NARROW type before the widening version, compaction
  * normalizes mixed-era files to the current schema, and the refusal
  * matrix (narrowing, lossy bigint→double, cross-family, layout key)
  * holds.
  */
class SinkTypeWideningSpec extends SparkSpec {

  test("widening is metadata-only; eras mix; time travel keeps the narrow type") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_widen").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L), (1L, 2L)).toDF("k", "v"), s"$root/t",
      overwrite = true)                                              // v1
    s.conf.set("spark.sql.catalog.graft_tws", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_tws.root", root)
    s.sql("ALTER TABLE graft_tws.t ADD COLUMN cnt INT")              // v2
    s.sql("INSERT INTO graft_tws.t VALUES (0, 3, 7)")                // v3
    val filesBefore = SinkSource.manifest(s"$root/t").map(_._2).toSet
    s.sql("ALTER TABLE graft_tws.t ALTER COLUMN cnt TYPE BIGINT")    // v4
    // metadata-only: the data file set is untouched
    assert(SinkSource.manifest(s"$root/t").map(_._2).toSet == filesBefore,
      "widening must not rewrite data files")
    s.sql("INSERT INTO graft_tws.t VALUES (1, 4, 4000000000)")       // v5
    // current read: bigint column mixing the int-era value and the
    // beyond-int value
    val cur = s.table("graft_tws.t")
    assert(cur.schema("cnt").dataType ==
      org.apache.spark.sql.types.LongType)
    val cnts = cur.select("cnt").collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    assert(cnts == Seq(-1L, -1L, 7L, 4000000000L), cnts.toString)
    // time travel BEFORE the widening serves the int type
    val pinned = s.sql("SELECT * FROM graft_tws.t VERSION AS OF 3")
    assert(pinned.schema("cnt").dataType ==
      org.apache.spark.sql.types.IntegerType,
      "schema travels with the snapshot")
    assert(pinned.select("cnt").collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).sorted.toSeq ==
      Seq(-1, -1, 7))
    // compaction normalizes the mixed eras to the current schema
    s.sql("CALL graft_tws.compact('t')").collect()
    val after = s.table("graft_tws.t").select("k", "v", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted.toSeq
    assert(after == Seq((0L, 1L, -1L), (0L, 3L, 7L), (1L, 2L, -1L),
      (1L, 4L, 4000000000L)), after.toString)
  }

  test("the refusal matrix holds and refusals publish nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_widen_refuse").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), s"$root/t",
      overwrite = true)
    s.conf.set("spark.sql.catalog.graft_twr", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_twr.root", root)
    s.sql("ALTER TABLE graft_twr.t ADD COLUMN cnt INT")
    s.sql("ALTER TABLE graft_twr.t ADD COLUMN tag STRING")
    val vBefore = SinkSource.currentVersion(s"$root/t")
    def refuse(sql: String): Unit = {
      intercept[Exception] { s.sql(sql) }
      assert(SinkSource.currentVersion(s"$root/t") == vBefore,
        s"a refused ALTER must not publish: $sql")
    }
    // narrowing dies at the engine's own analysis gate (canUpCast);
    // the rest pass analysis (Spark allows lossy long->double and
    // any->string up-casts) and must die at the CONNECTOR's matrix
    refuse("ALTER TABLE graft_twr.t ALTER COLUMN v TYPE INT")       // narrow
    refuse("ALTER TABLE graft_twr.t ALTER COLUMN v TYPE DOUBLE")    // lossy
    refuse("ALTER TABLE graft_twr.t ALTER COLUMN cnt TYPE STRING")  // family
    refuse("ALTER TABLE graft_twr.t ALTER COLUMN tag TYPE BIGINT")  // family
    // layout key: the structural guard fires before the matrix
    refuse("ALTER TABLE graft_twr.t ALTER COLUMN k TYPE DOUBLE")
  }
}
