package graft.plans

import graft.SparkSpec

/** q243 — AQE runtime skew-join mitigation. The oracle proves the
  * join's rows; this spec locks the MECHANISM in the FINAL adaptive
  * plan (only available after execution): the hot-key reduce
  * partition must be detected from real map-output statistics and
  * split — `SortMergeJoin(skew=true)` with a `skewed` AQEShuffleRead
  * on the fact side. If a conf rename or threshold change silently
  * disables the optimization, the answer is unchanged while the hot
  * partition quietly serializes the whole key on one task.
  */
class AqeSkewSpec extends SparkSpec {

  test("the final adaptive plan splits the hot-key partition") {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "1KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = graft.queries.Relational.skewJoin(s, "/root/testdata/sf0.001")
    // collect, not count: a global count adds a downstream exchange,
    // and OptimizeSkewedJoin declines when the join's output
    // partitioning still matters downstream
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), "adaptive plan not final")
    assert(plan.contains("skew=true"),
      s"hot partition not split by OptimizeSkewedJoin:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("AQEShuffleRead") && l.contains("skewed")),
      s"no skewed shuffle read on the fact side:\n$plan")
  }

  test("skew splitting never changes the answer") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val plain = graft.queries.Relational
      .skewJoin(s, "/root/testdata/sf0.001")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val split = graft.queries.Relational
      .q243AqeSkewJoin(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(plain.sameElements(split), "skew split changed the join result")
  }
}
