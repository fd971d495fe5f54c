package graft.plans

import graft.SparkSpec

/** q257 — AQE runtime join-strategy demotion. The oracle proves the
  * aggregate; this spec locks the MECHANISM: with static broadcast
  * disabled (the conservative no-stats deployment) the INITIAL plan
  * must be a SortMergeJoin, and after execution the FINAL adaptive
  * plan must have re-planned it as a BroadcastHashJoin from the dim
  * side's observed shuffle-write bytes. If a conf rename silently
  * disables the conversion, the answer is unchanged while every fact
  * row quietly pays a sort + wide exchange.
  */
class AqeDemotionSpec extends SparkSpec {

  test("initial plan sort-merges; final adaptive plan broadcasts") {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
    val df = graft.queries.PlannerMechanisms
      .demotedJoin(s, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), "adaptive plan not final")
    val parts = plan.split("== Initial Plan ==")
    assert(parts.length == 2, s"expected an AQE two-section print:\n$plan")
    val (fin, ini) = (parts(0), parts(1))
    assert(ini.contains("SortMergeJoin"),
      s"static plan should start as SMJ (broadcast denied):\n$ini")
    assert(!ini.contains("BroadcastHashJoin"),
      s"static plan must not broadcast with threshold -1:\n$ini")
    assert(fin.contains("BroadcastHashJoin"),
      s"runtime stats did not demote the join to broadcast:\n$fin")
    assert(!fin.contains("SortMergeJoin"),
      s"final plan still sort-merges:\n$fin")
  }

  test("demotion never changes the answer") {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val smj = graft.queries.PlannerMechanisms
      .demotedJoin(s, "/root/testdata/sf0.001")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    val bhj = graft.queries.PlannerMechanisms
      .q257AqeJoinDemotion(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    assert(smj == bhj, "join demotion changed the aggregate")
  }
}
