package graft.sources

import graft.SparkSpec

/** q252 — parquet aggregate pushdown. The oracle proves the audit
  * values; this spec locks the scan mechanism: every table's
  * BatchScan carries `PushedAggregation: [COUNT(*), MIN(..), MAX(..)]`
  * and its ReadSchema is the aggregate RESULTS (footer-only read, no
  * data pages), and disabling the pushdown leaves the values
  * unchanged — the conf moves work, never answers.
  */
class AggPushdownSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("all three table audits push COUNT/MIN/MAX into the parquet scan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    val df = FormatQueries.footerAudit(s, sf)
    assert(df.collect().length == 3)
    // the adaptive plan prints final + initial sections; count scans
    // in the FINAL one only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val pushed = plan.linesIterator
      .count(_.contains("PushedAggregation: [COUNT(*)"))
    assert(pushed == 3,
      s"expected 3 footer-answered scans, found $pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<count(*):bigint"),
      s"scan output is not the aggregate results (data pages read):\n$plan")
  }

  test("the pushdown moves work, never answers") {
    val on = graft.sources.FormatQueries.q252AggPushdown(spark, sf)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val s = spark.newSession()
    s.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    val off = FormatQueries.footerAudit(s, sf)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(on.sameElements(off), "aggregate pushdown changed the audit values")
  }
}
