package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** q312 — schema evolution on write (mergeSchema). The oracle proves
  * the merged read; this spec locks the protocol:
  *
  *   - strict by default: a schema-declaring append whose declaration
  *     no longer matches the destination (a concurrent ALTER, a stale
  *     plan) refuses with the conflict exception and publishes
  *     nothing; a PLAIN append with extra columns fails Spark's own
  *     write analysis;
  *   - with mergeSchema: an append planned BEFORE a concurrent ALTER
  *     commits AFTER it without losing either evolution (union by
  *     permanent field id, published atomically with the data in the
  *     commit's CAS);
  *   - unresolvable clashes (both sides invented a column under the
  *     same field id) abort with the conflict exception;
  *   - constraint interplay: stored CHECK constraints keep enforcing
  *     through evolving writes, and a violating evolving write fails
  *     the statement before publishing.
  */
class MergeSchemaSpec extends SparkSpec {

  private def catalogFor(name: String, root: String) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set(s"spark.sql.catalog.$name", classOf[SinkCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.root", root)
    s
  }

  private def stage(path: String, queryId: String, name: String,
      body: String): Unit = {
    val f = SinkSource.fs(path)
    val out = f.create(new Path(path, s"_staging/$queryId/$name"), true)
    out.write(body.getBytes("UTF-8")); out.close()
  }

  test("strict by default: moved schemas refuse; plain extra columns fail analysis") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ms_strict").toString
    val s = catalogFor("graft_mss", root)
    import s.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), s"$root/t",
      overwrite = true)                                              // v1
    s.sql("ALTER TABLE graft_mss.t ADD COLUMN flag BIGINT")          // v2
    // a declared write planned against the PRE-ALTER schema: its
    // declaration no longer matches the head — refuse, publish nothing
    stage(s"$root/t", "ms_stale", "ms_stale_f.psv", "1|10\n")
    val vBefore = SinkSource.currentVersion(s"$root/t")
    val ex = intercept[SinkConflictException] {
      new SinkBatchWrite(s"$root/t", "ms_stale", truncate = false,
        fields = SinkSchemas.base, sid = 0, declareSchema = true)
        .commit(Array(SinkCommitMessage(Seq((1L, "ms_stale_f.psv", 1L)))))
    }
    assert(ex.getMessage.contains("mergeSchema"), ex.getMessage)
    assert(SinkSource.currentVersion(s"$root/t") == vBefore)
    // a PLAIN append with an undeclared extra column never reaches the
    // connector: Spark's write analysis refuses the shape mismatch
    intercept[Exception] {
      Seq((2L, 20L, 200L)).toDF("k", "v", "score")
        .write.format("graft.sources.SinkSource")
        .option("path", s"$root/t").mode("append").save()
    }
    assert(SinkSource.currentVersion(s"$root/t") == vBefore)
  }

  test("mergeSchema unions a racing ALTER with the write's own evolution") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ms_race").toString
    val s = catalogFor("graft_msr", root)
    import s.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), s"$root/t",
      overwrite = true)                                              // v1
    // the evolving write PLANS first: score gets the next field id
    val ours = SinkSchemas.base :+
      SinkSchemas.SinkField(3, "score", LongType)
    val oursSid = SinkSchemas.ensure(s"$root/t", ours)
    // ...then a concurrent ALTER lands (flag allocates id 4 — ids are
    // table-global, so the two evolutions stay disjoint)
    s.sql("ALTER TABLE graft_msr.t ADD COLUMN flag BIGINT")          // v2
    // the commit reconciles against the head it replaces: the union
    // (k, v, flag, score) publishes with the data, atomically
    stage(s"$root/t", "ms_race", "ms_race_f.psv", "5|50|500\n")
    new SinkBatchWrite(s"$root/t", "ms_race", truncate = false,
      fields = ours, sid = oursSid, declareSchema = true,
      mergeSchema = true)
      .commit(Array(SinkCommitMessage(Seq((5L, "ms_race_f.psv", 1L)))))
    val names = SinkSchemas.currentFields(s"$root/t").map(_.name)
    assert(names.toSet == Set("k", "v", "flag", "score"),
      s"neither evolution may be lost: $names")
    val got = SinkSource.load(s, s"$root/t")
      .select("k", "v", "score", "flag").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set((0L, 1L, -1L, -1L), (5L, 50L, 500L, -1L)),
      s"per-file reconciliation must null-fill both eras: $got")
    // COMMUTE arm: an evolving write that adds NOTHING new simply
    // adopts the head's schema — appends commute with ALTERs
    stage(s"$root/t", "ms_base", "ms_base_f.psv", "6|60\n")
    new SinkBatchWrite(s"$root/t", "ms_base", truncate = false,
      fields = SinkSchemas.base, sid = 0, declareSchema = true,
      mergeSchema = true)
      .commit(Array(SinkCommitMessage(Seq((6L, "ms_base_f.psv", 1L)))))
    assert(SinkSchemas.currentFields(s"$root/t").map(_.name).toSet ==
      Set("k", "v", "flag", "score"),
      "a no-new-columns merge adopts the head schema verbatim")
    assert(SinkSource.load(s, s"$root/t").count() == 3L)
  }

  test("an unresolvable field-id clash aborts with the conflict exception") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ms_clash").toString
    val s = catalogFor("graft_msc", root)
    import s.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), s"$root/t",
      overwrite = true)                                              // v1
    // BOTH sides invent a column under field id 3 (the write never
    // registered its schema, so the ALTER allocated the same id) —
    // no safe union exists; the statement must re-plan
    val ours = SinkSchemas.base :+
      SinkSchemas.SinkField(3, "score", LongType)
    s.sql("ALTER TABLE graft_msc.t ADD COLUMN flag BIGINT")          // v2
    stage(s"$root/t", "ms_clash", "ms_clash_f.psv", "5|50|500\n")
    val vBefore = SinkSource.currentVersion(s"$root/t")
    val ex = intercept[SinkConflictException] {
      new SinkBatchWrite(s"$root/t", "ms_clash", truncate = false,
        fields = ours, sid = 0, declareSchema = true, mergeSchema = true)
        .commit(Array(SinkCommitMessage(Seq((5L, "ms_clash_f.psv", 1L)))))
    }
    assert(ex.getMessage.contains("conflicts"), ex.getMessage)
    assert(SinkSource.currentVersion(s"$root/t") == vBefore,
      "a clashing merge must publish nothing")
  }

  test("stored CHECK constraints keep enforcing through evolving writes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ms_check").toString
    val s = catalogFor("graft_msk", root)
    import s.implicits._
    SinkSource.write(Seq((0L, 1L)).toDF("k", "v"), s"$root/t",
      overwrite = true)
    s.sql("ALTER TABLE graft_msk.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    // a valid evolving write passes and preserves the constraint
    SinkSource.writeEvolved(Seq((1L, 5L, 7L)).toDF("k", "v", "score"),
      s"$root/t")
    assert(SinkSchemas.currentFields(s"$root/t").map(_.name)
      .contains("score"))
    assert(SinkConstraints.load(s"$root/t").map(_._1) == Seq("v_pos"),
      "evolution must not shed constraints")
    // a violating plain insert through the catalog still refuses —
    // the constraint compiled into the write plan
    val before = SinkSource.load(s, s"$root/t").count()
    intercept[Exception] {
      s.sql("INSERT INTO graft_msk.t VALUES (2, -1, NULL)")
    }
    assert(SinkSource.load(s, s"$root/t").count() == before,
      "a violating write must publish nothing")
  }
}
