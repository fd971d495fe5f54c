package graft.plans

import graft.SparkSpec

/** q237 — runtime bloom-filter join pruning. The answer is a plain
  * join aggregate (the oracle covers it); what this spec locks is the
  * MECHANISM: under the fixture-scale thresholds Catalyst must inject
  * a bloom_filter_agg scalar subquery built from the filtered dim and
  * plant might_contain on the fact's join key below the shuffle. If
  * injection silently stops (a conf rename, a threshold default
  * change), the query still answers correctly while the 100 TB plan
  * it exists to pin quietly degrades to an unfiltered shuffle.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("the optimized plan carries bloom_filter_agg + might_contain on the fact key") {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "100MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = graft.queries.Relational
      .runtimeFilterJoin(s, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_filter_agg"),
      s"no bloom filter built from the dim side:\n$plan")
    assert(plan.contains("might_contain"),
      s"no runtime filter applied:\n$plan")
    val filterLine = plan.linesIterator
      .find(_.contains("might_contain")).get
    assert(filterLine.contains("l_partkey"),
      s"runtime filter not on the fact join key: $filterLine")
    assert(df.collect().nonEmpty)
  }

  test("without the waived thresholds the same join answers identically") {
    // the filter is a pre-filter, never a verdict: bloom false
    // positives still go through the equality join
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val plain = graft.queries.Relational
      .runtimeFilterJoin(s, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val filtered = graft.queries.Relational
      .q237RuntimeFilter(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(plain == filtered, "runtime filtering changed the answer")
  }
}
