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
}
