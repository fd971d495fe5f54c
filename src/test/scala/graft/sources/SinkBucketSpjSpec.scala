package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q313 — storage-partitioned joins on bucket-era sink tables. The
  * oracle proves the joined values; this spec locks the mechanism:
  *
  *   - two uniformly bucket-era tables under the same catalog join
  *     with ZERO shuffle exchanges (the SpjSource contract, now on
  *     the real table format);
  *   - the exchange-free result is bit-identical to the same join
  *     with the mechanism off (plain shuffle path);
  *   - a MIXED-era table does NOT report the partitioning (no single
  *     truthful transform) — the join falls back to shuffles and
  *     stays correct;
  *   - zone-map skipping composes: a key-filtered SPJ read still
  *     prunes files and still answers exactly.
  */
class SinkBucketSpjSpec extends SparkSpec {

  private def session(name: String, root: String, spj: Boolean) = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      spj.toString)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set(s"spark.sql.catalog.$name", classOf[SinkCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$name.root", root)
    s
  }

  private def stageBucketed(s: org.apache.spark.sql.SparkSession,
      cat: String, root: String, name: String,
      rows: Seq[(Long, Long)]): Unit = {
    import s.implicits._
    SinkSource.write(Seq(rows.head).toDF("k", "v"), s"$root/$name",
      overwrite = true)
    s.sql(s"CALL $cat.evolve_spec('$name', 'bucket(4)')").collect()
    SinkSource.write(rows.toDF("k", "v").repartition(3, col("k")),
      s"$root/$name", overwrite = true)
  }

  test("uniform bucket-era tables join exchange-free; results match the shuffle path") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bspj").toString
    val s = session("graft_bspj", root, spj = true)
    val rnd = new scala.util.Random(313)
    val left = (0 until 60).map(_ =>
      (rnd.nextInt(11).toLong, rnd.nextInt(1000).toLong))
    val right = (0 until 25).map(_ =>
      (rnd.nextInt(17).toLong, rnd.nextInt(1000).toLong))
    stageBucketed(s, "graft_bspj", root, "l", left)
    stageBucketed(s, "graft_bspj", root, "r", right)
    val j = s.table("graft_bspj.l").as("a")
      .join(s.table("graft_bspj.r").as("b"), "k")
      .select(col("k"), col("a.v").as("av"), col("b.v").as("bv"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join riding the reported layout:\n$plan")
    assert(!plan.contains("Exchange"),
      s"a co-bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("keyGrouped=bucket(4, k)"),
      s"the scan must advertise its grouping:\n$plan")
    def rows(frame: org.apache.spark.sql.DataFrame): Seq[String] =
      frame.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .sorted.toSeq
    val sOff = session("graft_bspj_off", root, spj = false)
    val jOff = sOff.table("graft_bspj_off.l").as("a")
      .join(sOff.table("graft_bspj_off.r").as("b"), "k")
      .select(col("k"), col("a.v").as("av"), col("b.v").as("bv"))
    assert(rows(j) == rows(jOff),
      "the exchange-free join changed the result")
  }

  test("mixed-era tables fall back to the shuffle path, correctly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bspj_mix").toString
    val s = session("graft_bspjm", root, spj = true)
    import s.implicits._
    // l: uniform bucket era; r: MIXED (identity seed survives)
    stageBucketed(s, "graft_bspjm", root, "l",
      (0L until 20L).map(i => (i % 5, i)))
    SinkSource.write((0L until 10L).map(i => (i % 5, i)).toDF("k", "v"),
      s"$root/r", overwrite = true)                                  // era 0
    s.sql("CALL graft_bspjm.evolve_spec('r', 'bucket(4)')").collect()
    SinkSource.write((10L until 20L).map(i => (i % 5, i)).toDF("k", "v"),
      s"$root/r", overwrite = false)                                 // era 1
    assert(SinkSource.fileSpecs(s"$root/r").nonEmpty)
    val j = s.table("graft_bspjm.l").join(s.table("graft_bspjm.r"), "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"),
      s"a mixed-era side must not claim a single-transform layout:\n$plan")
    assert(j.count() == (0L until 20L).groupBy(_ % 5)
      .map { case (_, g) => g.size * g.size }.sum,
      "the fallback join must still be exact")
  }

  test("MoR: bucket-era tables keep the exchange-free join after row-level deletes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bspj_mor").toString
    val s = session("graft_bspjmor", root, spj = true)
    s.conf.set("spark.sql.catalog.graft_bspjmor.mor", "true")
    stageBucketed(s, "graft_bspjmor", root, "l",
      (0L until 40L).map(i => (i % 7, i)))
    stageBucketed(s, "graft_bspjmor", root, "r",
      (0L until 30L).map(i => (i % 5, i + 100L)))
    // a row-level delete FINER than the key: positional deletion
    // vectors land, data files are untouched — the exact state that
    // used to demote the join back to the full shuffle
    s.sql("DELETE FROM graft_bspjmor.l WHERE v % 3 = 1")
    assert(SinkSource.deleteSidecar(s"$root/l").nonEmpty,
      "fixture must produce deletion vectors")
    val j = s.table("graft_bspjmor.l").as("a")
      .join(s.table("graft_bspjmor.r").as("b"), "k")
      .select(col("k"), col("a.v").as("av"), col("b.v").as("bv"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join riding the reported layout:\n$plan")
    assert(!plan.contains("Exchange"),
      s"a MoR bucket-era join must stay exchange-free with tombstones intact:\n$plan")
    assert(plan.contains("keyGrouped=bucket(4, k)"),
      s"the MoR scan must advertise its grouping:\n$plan")
    val lRows = (0L until 40L).map(i => (i % 7, i)).filterNot(_._2 % 3 == 1)
    val rRows = (0L until 30L).map(i => (i % 5, i + 100L))
    val expect = (for { (lk, lv) <- lRows; (rk, rv) <- rRows if lk == rk }
      yield s"$lk|$lv|$rv").sorted
    val got = j.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .sorted.toSeq
    assert(got == expect, "the MoR exchange-free join changed the result")
  }

  test("zone-map skipping composes with the key-grouped scan") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bspj_skip").toString
    val s = session("graft_bspjs", root, spj = true)
    stageBucketed(s, "graft_bspjs", root, "t",
      (0L until 40L).map(i => (i % 8, i * 10)))
    // k = 6 lives in bucket pmod(6,4) = 2 only: the keyed scan must
    // prune the other buckets' files and still answer exactly
    val got = s.table("graft_bspjs.t").filter(col("k") === 6)
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got == (0L until 40L).filter(_ % 8 == 6).map(_ * 10).toSet)
    val d = s.table("graft_bspjs.t").filter(col("k") === 6)
      .queryExecution.executedPlan.toString
    assert(d.contains("skippedFiles"),
      s"the keyed scan must keep the skipping evidence:\n$d")
  }
}
