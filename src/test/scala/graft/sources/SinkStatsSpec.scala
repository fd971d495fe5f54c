package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q271 — connector-reported statistics, DEFAULT-ON as of round 18.
  * The oracle proves the joined values; this spec locks the
  * MECHANISM: by default the scan reports manifest-exact size/rows
  * and the optimizer's INITIAL plan broadcasts the dim (no hint, no
  * ANALYZE); with the `stats=false` opt-out, the same join's initial
  * plan is a sort-merge join (AQE may rescue it later — which is
  * exactly why the assertion is on the initial plan).
  */
class SinkStatsSpec extends SparkSpec {

  private def initialPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // under AQE the string prints Final Plan then Initial Plan; the
    // static choice is the Initial section (whole string if no AQE)
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(i) else s
  }

  test("default-on manifest stats flip the initial join plan to broadcast") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_stats").toString
    import spark.implicits._
    val dim = (0L until 50L).map(i => (i % 5, i)).toDF("k", "v")
    SinkSource.write(dim.repartition(2, col("k")), root, overwrite = true)
    // child session: threshold 10 KB, so the 40 KB fact can never be
    // the broadcast side — only the dim's manifest-exact 800 B can
    // earn a broadcast, and only when the scan REPORTS it
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    val fact = s.range(0, 5000)
      .select((col("id") % 5).as("k"), col("id").as("f"))

    val blind = fact.join(
      SinkSource.load(s, root, stats = false).withColumnRenamed("v", "d"),
      Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val blindInit = initialPlan(blind)
    assert(blindInit.contains("SortMergeJoin"),
      s"stats-blind V2 join should start as SMJ:\n$blindInit")

    val seen = fact.join(
      SinkSource.load(s, root).withColumnRenamed("v", "d"), Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    val seenInit = initialPlan(seen)
    assert(seenInit.contains("BroadcastHashJoin"),
      s"manifest stats should make the FIRST plan broadcast:\n$seenInit")
    assert(seenInit.contains("reportedStats=manifest"),
      s"scan should carry the stats marker:\n$seenInit")

    // and both answer identically
    val a = blind.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = seen.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1000 fact rows per key x 10 dim rows per key = 10 000 per key
    assert(a == b && a.values.sum == 50000L, s"plans disagree: $a vs $b")
  }

  test("reported numbers are manifest-exact") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_stats2").toString
    import spark.implicits._
    SinkSource.write((0L until 123L).map(i => (i % 3, i)).toDF("k", "v")
      .repartition(2, col("k")), root, overwrite = true)
    val st = new SinkScan(root).estimateStatistics()
    assert(st.numRows().getAsLong == 123L,
      s"numRows should be the manifest sum: ${st.numRows()}")
    assert(st.sizeInBytes().getAsLong == 123L * 16,
      s"sizeInBytes should scale with exact rows: ${st.sizeInBytes()}")
  }
}
