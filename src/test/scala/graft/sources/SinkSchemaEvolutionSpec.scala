package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q292 — sink schema evolution. The oracle proves the evolved
  * aggregate; this spec locks the contracts the hash can't see:
  * reconciliation semantics (adds null-fill, renames read by field
  * id), the structural guard rails (layout key, constraint
  * references, id freshness across drop/re-add), time travel serving
  * the schema AS OF its version, row-level DML over an evolved
  * table, and compaction normalizing mixed-schema groups.
  */
class SinkSchemaEvolutionSpec extends SparkSpec {

  private def session(root: String, cat: String, extra: (String, String)*) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set(s"spark.sql.catalog.$cat", classOf[SinkCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    extra.foreach { case (k, v) =>
      s.conf.set(s"spark.sql.catalog.$cat.$k", v) }
    s
  }

  test("adds null-fill old files; renames read by field id; drops never resurrect") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evo").toString
    val s = session(root, "ev1")
    import s.implicits._
    SinkSource.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)

    s.sql("ALTER TABLE ev1.t ADD COLUMN w BIGINT")
    s.sql("INSERT INTO ev1.t VALUES (3, 30, 300)")
    val rows = s.table("ev1.t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(rows == Set((1L, 10L, None), (2L, 20L, None),
      (3L, 30L, Some(300L))),
      s"pre-evolution rows must read NULL for the added column: " +
        s"${rows.toSeq.sorted}")

    // rename: the batch written under the OLD name keeps serving by id
    s.sql("ALTER TABLE ev1.t RENAME COLUMN w TO weight")
    assert(s.table("ev1.t").columns.toSeq == Seq("k", "v", "weight"))
    assert(s.sql("SELECT sum(weight) s FROM ev1.t").collect()(0)
      .getLong(0) == 300L,
      "rename must keep reading the pre-rename files' bytes by field id")

    // drop, then add a DIFFERENT column: the fresh field id must not
    // resurrect the dropped column's bytes
    s.sql("ALTER TABLE ev1.t DROP COLUMN weight")
    assert(s.table("ev1.t").columns.toSeq == Seq("k", "v"))
    s.sql("ALTER TABLE ev1.t ADD COLUMN note STRING")
    val notes = s.sql("SELECT note FROM ev1.t").collect()
    assert(notes.forall(_.isNullAt(0)),
      "a re-added column must get a FRESH field id — the dropped " +
        s"column's stored bytes resurrected: ${notes.mkString(",")}")
    // escaping: the format's own delimiter and a newline survive
    s.sql("INSERT INTO ev1.t VALUES (4, 40, 'a|b\nc')")
    assert(s.sql("SELECT note FROM ev1.t WHERE k = 4").collect()(0)
      .getString(0) == "a|b\nc")
  }

  test("the layout key is structural; constraint references block rename/drop") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evo_guard").toString
    val s = session(root, "ev2")
    import s.implicits._
    SinkSource.write(Seq((1L, 10L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)

    val exK = intercept[Exception] {
      s.sql("ALTER TABLE ev2.t RENAME COLUMN k TO id") }
    assert(exK.getMessage.contains("structural"), exK.getMessage)
    val exK2 = intercept[Exception] {
      s.sql("ALTER TABLE ev2.t DROP COLUMN k") }
    assert(exK2.getMessage.contains("structural"), exK2.getMessage)

    // a column a stored CHECK references cannot be renamed or dropped
    s.sql("ALTER TABLE ev2.t ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    val exC = intercept[Exception] {
      s.sql("ALTER TABLE ev2.t RENAME COLUMN v TO val") }
    assert(exC.getMessage.contains("v_nonneg"), exC.getMessage)
    val exC2 = intercept[Exception] {
      s.sql("ALTER TABLE ev2.t DROP COLUMN v") }
    assert(exC2.getMessage.contains("v_nonneg"), exC2.getMessage)
    // dropping the constraint lifts the block
    s.sql("ALTER TABLE ev2.t DROP CONSTRAINT v_nonneg")
    s.sql("ALTER TABLE ev2.t RENAME COLUMN v TO val")
    assert(s.table("ev2.t").columns.toSeq == Seq("k", "val"))

    // a constraint ON an evolved column is enforced on writes
    s.sql("ALTER TABLE ev2.t ADD COLUMN score BIGINT")
    s.sql("ALTER TABLE ev2.t ADD CONSTRAINT score_pos CHECK (score IS NULL OR score > 0)")
    intercept[Exception] {
      s.sql("INSERT INTO ev2.t VALUES (2, 20, -5)") }
    s.sql("INSERT INTO ev2.t VALUES (2, 20, 5)")
    assert(s.sql("SELECT count(*) c FROM ev2.t").collect()(0).getLong(0) == 2L)

    // refusals: non-nullable add, type change
    val exN = intercept[Exception] {
      s.sql("ALTER TABLE ev2.t ADD COLUMN req BIGINT NOT NULL") }
    assert(exN.getMessage.toLowerCase.contains("nullable"), exN.getMessage)
    val exT = intercept[Exception] {
      s.sql("ALTER TABLE ev2.t ALTER COLUMN val TYPE STRING") }
    assert(exT.getMessage != null)
  }

  test("time travel serves the schema AS OF its version") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evo_tt").toString
    val s = session(root, "ev3")
    import s.implicits._
    SinkSource.write(Seq((1L, 10L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)                                 // v1
    s.sql("ALTER TABLE ev3.t ADD COLUMN w BIGINT")                  // v2
    s.sql("INSERT INTO ev3.t VALUES (2, 20, 200)")                  // v3
    // the pre-evolution snapshot is two columns wide — the ALTER is a
    // snapshot like any other
    val v1 = s.sql("SELECT * FROM ev3.t VERSION AS OF 1")
    assert(v1.columns.toSeq == Seq("k", "v"),
      s"v1 must serve the schema as of v1: ${v1.columns.toSeq}")
    assert(v1.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L)))
    val v3 = s.sql("SELECT * FROM ev3.t VERSION AS OF 3")
    assert(v3.columns.toSeq == Seq("k", "v", "w"))
  }

  test("row-level DML and compaction work over mixed-schema files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evo_dml").toString
    val s = session(root, "ev4")
    import s.implicits._
    SinkSource.write((0L until 12L).map(i => (i % 2, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)
    s.sql("ALTER TABLE ev4.t ADD COLUMN w BIGINT")
    s.sql("INSERT INTO ev4.t VALUES (0, 100, 1), (1, 101, 2)")
    // copy-on-write UPDATE sets an evolved column across a mixed
    // group (the rewrite serializes the CURRENT schema)
    s.sql("UPDATE ev4.t SET w = 7 WHERE k = 0 AND v < 4")
    val got = s.sql("SELECT v, w FROM ev4.t WHERE k = 0").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got == Set((0L, Some(7L)), (2L, Some(7L)),
      (4L, None), (6L, None), (8L, None), (10L, None), (100L, Some(1L))),
      s"CoW update over mixed-schema group: ${got.toSeq.sortBy(_._1)}")

    // compaction rewrites multi-file groups to ONE file stamped with
    // the CURRENT schema id — normalization, not concatenation
    val before = s.sql("SELECT k, v, w FROM ev4.t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    s.sql("CALL ev4.compact('t')").collect()
    val sidsAfter = SinkSource.manifestSids(s"$root/t")
    val curSid = SinkSource.schemaIdOf(s"$root/t")
    assert(curSid > 0)
    assert(sidsAfter.values.toSet == Set(curSid),
      s"compacted files must carry the current schema id: $sidsAfter")
    val after = s.sql("SELECT k, v, w FROM ev4.t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(after == before, "compaction changed the table's content")
  }

  test("the changelog stream reconciles files written after an ALTER") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_evo_cdc").toString
    val (table, ckpt) = (s"$base/t", s"$base/ckpt")
    val s = session(base, "ev6")
    import s.implicits._
    SinkSource.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      table, overwrite = true)                                      // v1
    // the stream plans with the CURRENT schema (k, v); files landed
    // after a later ALTER carry wider layouts and must reconcile DOWN
    val q = s.readStream.format("graft.sources.SinkSource")
      .option("path", table).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("evo_cdc").start()
    q.processAllAvailable()
    s.sql("ALTER TABLE ev6.t ADD COLUMN w BIGINT")                  // v2
    s.sql("INSERT INTO ev6.t VALUES (3, 30, 300)")                  // v3
    q.processAllAvailable()
    q.stop()
    val got = s.table("evo_cdc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L), (3L, 30L)),
      s"the post-ALTER batch must reconcile to the stream's plan-time " +
        s"schema: $got")
  }

  test("merge-on-read DML applies over an evolved table") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_evo_mor").toString
    val s = session(root, "ev5", "mor" -> "true")
    import s.implicits._
    SinkSource.write((0L until 10L).map(i => (i % 2, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)
    s.sql("ALTER TABLE ev5.t ADD COLUMN w BIGINT")
    s.sql("INSERT INTO ev5.t VALUES (0, 50, 5)")
    // vector delete across mixed-schema files
    s.sql("DELETE FROM ev5.t WHERE v < 3")
    assert(SinkSource.deleteSidecar(s"$root/t").nonEmpty,
      "fine-grained MoR delete must publish vectors")
    val left = s.sql("SELECT v FROM ev5.t").collect()
      .map(_.getLong(0)).toSet
    assert(left == Set(3L, 4L, 5L, 6L, 7L, 8L, 9L, 50L), left.toString)
    // MoR UPDATE writes the evolved row shape through the delta arm
    s.sql("UPDATE ev5.t SET w = 9 WHERE v = 4")
    val r = s.sql("SELECT w FROM ev5.t WHERE v = 4").collect()
    assert(r.length == 1 && r(0).getLong(0) == 9L, r.mkString(","))
  }
}
