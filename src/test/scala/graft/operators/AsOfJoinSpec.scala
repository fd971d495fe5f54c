package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  lazy val events = Seq(
    (1L, 100L, "e1"), (1L, 205L, "e2"), (1L, 300L, "e3"),
    (2L, 50L, "e4"), // before any state for user 2
    (2L, 400L, "e5"))
    .toDF("user_id", "ts", "name")

  lazy val state = Seq(
    (1L, 100L, "cfgA", 1), // takes effect exactly at e1's ts
    (1L, 200L, "cfgB", 2),
    (2L, 399L, "cfgC", 3))
    .toDF("user_id", "ts", "config", "version")

  lazy val joined = AsOfJoin.asOf(events, state, "user_id", "ts", "ts",
    Seq("config", "version"))

  test("each event sees the latest state at or before its timestamp") {
    val byName = joined.collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[String]("asof_config"), Option(r.get(r.fieldIndex("asof_version"))))).toMap
    assert(byName("e1") == (("cfgA", Some(1)))) // equal-ts state visible
    assert(byName("e2") == (("cfgB", Some(2))))
    assert(byName("e3") == (("cfgB", Some(2))))
    assert(byName("e4") == ((null, None))) // no prior state → nulls
    assert(byName("e5") == (("cfgC", Some(3))))
  }

  test("output preserves left rows and columns exactly") {
    assert(joined.count() == events.count())
    assert(joined.columns.toSeq ==
      Seq("user_id", "ts", "name", "asof_config", "asof_version"))
  }

  test("plan shuffles once on the key, no nested-loop range join") {
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("duplicate right timestamps carry the greatest payload deterministically") {
    val dupState = Seq(
      (1L, 100L, "cfgA", 1),
      (1L, 100L, "cfgZ", 9), // same key+ts — field-wise max must win
      (1L, 100L, "cfgM", 5))
      .toDF("user_id", "ts", "config", "version")
    val got = AsOfJoin.asOf(events.filter($"user_id" === 1L), dupState,
      "user_id", "ts", "ts", Seq("config", "version"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("asof_config")).toMap
    assert(got("e1") == "cfgZ" && got("e2") == "cfgZ" && got("e3") == "cfgZ")
  }
}
