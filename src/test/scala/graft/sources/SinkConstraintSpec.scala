package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q291 — table CHECK constraints. The oracle proves the guarded
  * table; this spec locks the CONSTRAINT contract: ADD CONSTRAINT
  * validates existing rows (a violating history refuses the
  * constraint), an enforced constraint fails violating INSERTs before
  * anything publishes (no manifest advance), valid writes pass, the
  * constraint survives to a fresh catalog instance, and DROP
  * CONSTRAINT lifts enforcement.
  */
class SinkConstraintSpec extends SparkSpec {

  private def session(root: String) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.catalog.graft_ck", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ck.root", root)
    s
  }

  test("enforced CHECK constraints guard writes; ADD validates history") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ck").toString
    val s = session(root)
    import s.implicits._
    SinkSource.write((0L until 20L).map(i => (i % 2, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)

    // adding a constraint the existing rows VIOLATE must fail and
    // persist nothing
    intercept[Exception] {
      s.sql("ALTER TABLE graft_ck.t ADD CONSTRAINT v_small CHECK (v < 10)")
    }
    assert(SinkConstraints.load(s"$root/t").isEmpty,
      "a failed-validation constraint must not persist")

    s.sql("ALTER TABLE graft_ck.t ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    assert(SinkConstraints.load(s"$root/t")
      .exists(c => c._1 == "v_nonneg" && c._2),
      SinkConstraints.load(s"$root/t").toString)

    // a violating INSERT fails and publishes nothing
    val vBefore = SinkSource.currentVersion(s"$root/t")
    intercept[Exception] {
      s.sql("INSERT INTO graft_ck.t VALUES (1, -5)")
    }
    assert(SinkSource.currentVersion(s"$root/t") == vBefore,
      "a constraint-violating insert advanced the manifest")
    // valid rows pass
    s.sql("INSERT INTO graft_ck.t VALUES (1, 100)")
    assert(s.sql("SELECT COUNT(*) FROM graft_ck.t").collect()(0).getLong(0)
      == 21L)

    // the constraint is catalog metadata: a FRESH session enforces it
    val s2 = session(root)
    intercept[Exception] {
      s2.sql("INSERT INTO graft_ck.t VALUES (1, -6)")
    }

    // DROP lifts enforcement
    s2.sql("ALTER TABLE graft_ck.t DROP CONSTRAINT v_nonneg")
    s2.sql("INSERT INTO graft_ck.t VALUES (1, -7)")
    assert(s2.sql("SELECT COUNT(*) FROM graft_ck.t").collect()(0).getLong(0)
      == 22L)
  }

  test("constraint publishes are versioned — no zero-constraint window") {
    // Round-16 hardening: store() publishes `_constraints.v<N>.psv`
    // with a refuse-existing rename (the manifest's own discipline)
    // and load() reads the highest version. The old delete-then-rename
    // swap had a window in which a concurrent write planned with ZERO
    // constraints (an enforced CHECK silently not compiled in) and a
    // crash point that lost every constraint.
    val root = java.nio.file.Files
      .createTempDirectory("graft_ckv").toString
    val path = s"$root/t"
    val f = SinkSource.fs(path)
    f.mkdirs(new org.apache.hadoop.fs.Path(path))
    SinkConstraints.store(path, Seq(("c1", true, "v >= 0")))
    assert(f.exists(new org.apache.hadoop.fs.Path(path,
      "_constraints.v1.psv")))
    SinkConstraints.store(path,
      Seq(("c1", true, "v >= 0"), ("c2", true, "k >= 0")))
    // every published version stays on disk until the NEXT version is
    // fully live — a reader at any instant resolves a complete file
    assert(f.exists(new org.apache.hadoop.fs.Path(path,
      "_constraints.v1.psv")),
      "the previous constraint version must survive the publish (no " +
        "delete-then-rename window)")
    assert(SinkConstraints.load(path).map(_._1) == Seq("c1", "c2"))
    // dropping the LAST constraint is also an atomic versioned publish
    SinkConstraints.store(path, Seq.empty)
    assert(SinkConstraints.load(path).isEmpty)
    assert(f.exists(new org.apache.hadoop.fs.Path(path,
      "_constraints.v3.psv")), "drop-all must publish, not delete")
    // legacy unversioned files still read (version-0 compatibility)
    val legacyDir = s"$root/legacy"
    f.mkdirs(new org.apache.hadoop.fs.Path(legacyDir))
    val out = f.create(new org.apache.hadoop.fs.Path(legacyDir,
      "_constraints.psv"), true)
    try out.write("c0\ttrue\tv > 1\n".getBytes("UTF-8")) finally out.close()
    assert(SinkConstraints.load(legacyDir) == Seq(("c0", true, "v > 1")))
  }
}
