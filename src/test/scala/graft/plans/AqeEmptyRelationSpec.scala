package graft.plans

import graft.SparkSpec

/** q248 — AQE empty-relation propagation. The oracle proves the
  * survivor stats; this spec locks the runtime elimination: the
  * blocklist anti join is present in the INITIAL plan (the guard is
  * structurally real) and absent from the FINAL adaptive plan (AQE
  * observed the built side's zero rows and rewrote the join to its
  * left child), so an always-empty guard costs nothing per row.
  */
class AqeEmptyRelationSpec extends SparkSpec {

  test("a runtime-empty anti-join side is eliminated from the final plan") {
    val df = graft.queries.PlannerMechanisms
      .q248AqeEmptyRelation(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), "adaptive plan not final")
    val sections = plan.split("== Initial Plan ==")
    assert(sections.length == 2, s"expected initial+final sections:\n$plan")
    assert(sections(1).contains("Join"),
      s"the blocklist guard must be in the initial plan:\n$plan")
    assert(!sections(0).contains("Join"),
      s"the empty-side join survived into the final plan:\n$plan")
  }
}
