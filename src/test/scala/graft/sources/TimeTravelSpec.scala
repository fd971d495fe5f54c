package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q263 — snapshot reads over the versioned-manifest history. The
  * oracle proves the joined inventory; this spec locks the CONTRACT:
  * a pinned version answers identically before and after later
  * appends (snapshot stability), the pinned scan is visible in the
  * plan, and a version that never existed fails loudly instead of
  * reading as an empty table.
  */
class TimeTravelSpec extends SparkSpec {

  private def catalogSession(root: String) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.catalog.graft_sink",
      classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s
  }

  test("a pinned snapshot is immune to later appends") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_tt").toString
    import spark.implicits._
    SinkSource.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"),
      s"$root/t", overwrite = true)                        // v1
    val s = catalogSession(root)
    def v1() = s.sql("SELECT k, v FROM graft_sink.t VERSION AS OF 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = v1()
    SinkSource.write(Seq((3L, 30L)).toDF("k", "v"),
      s"$root/t", overwrite = false)                       // v2
    assert(v1() == before, "the v1 snapshot drifted after an append")
    assert(before == Set((1L, 10L), (2L, 20L)))
    val cur = s.sql("SELECT k FROM graft_sink.t")
      .collect().map(_.getLong(0)).toSet
    assert(cur == Set(1L, 2L, 3L), "the unpinned read missed the append")
    val plan = s.sql("SELECT k FROM graft_sink.t VERSION AS OF 1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("version=1"),
      s"pinned scan not visible in the plan:\n$plan")
  }

  test("a version that never existed fails loudly, not empty") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_tt2").toString
    import spark.implicits._
    SinkSource.write(Seq((1L, 10L)).toDF("k", "v"), s"$root/t",
      overwrite = true)
    val s = catalogSession(root)
    val e = intercept[Exception] {
      s.sql("SELECT * FROM graft_sink.t VERSION AS OF 9").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("version 9")),
      s"expected a no-such-version failure, got: $e")
  }

  test("TIMESTAMP AS OF resolves the highest commit at or before the instant") {
    // q293's contract arm: commit wall-clocks live in the manifest
    // header; the catalog resolves micros → version metadata-side.
    val root = java.nio.file.Files
      .createTempDirectory("graft_ttts").toString
    import spark.implicits._
    SinkSource.write(Seq((1L, 10L)).toDF("k", "v"),
      s"$root/t", overwrite = true)                        // v1
    Thread.sleep(20)
    SinkSource.write(Seq((2L, 20L)).toDF("k", "v"),
      s"$root/t", overwrite = false)                       // v2
    Thread.sleep(20)
    SinkSource.write(Seq((3L, 30L)).toDF("k", "v"),
      s"$root/t", overwrite = false)                       // v3
    val s = catalogSession(root)
    val ts1 = SinkSource.commitTs(s"$root/t", 1).get
    val ts2 = SinkSource.commitTs(s"$root/t", 2).get
    def ks(tsMillis: Long) = s.sql(
      s"SELECT k FROM graft_sink.t TIMESTAMP AS OF timestamp_millis($tsMillis)")
      .collect().map(_.getLong(0)).toSet
    // exactly AT a commit instant includes that commit
    assert(ks(ts1) == Set(1L), "at v1's instant: v1 only")
    assert(ks(ts2) == Set(1L, 2L), "at v2's instant: v1+v2")
    // between commits resolves DOWN to the earlier snapshot
    assert(ks(ts2 - 1) == Set(1L), "just before v2: v1 only")
    // far in the future resolves to the latest snapshot
    assert(ks(ts2 + 3600000L) == Set(1L, 2L, 3L))
    // before the table existed: loud failure, never an empty table
    val e = intercept[Exception] { ks(ts1 - 3600000L) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("no snapshot")),
      s"expected a no-snapshot failure, got: $e")
  }
}
