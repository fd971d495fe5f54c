package graft.plans

import graft.SparkSpec

/** q247 — within-query exchange and scalar-subquery reuse. The oracle
  * proves the month-over-month rows; this spec locks the diamond:
  * the monthly aggregate's shuffle is planned ONCE (a ReusedExchange
  * node feeds the second join side) and the repeated scalar
  * subqueries collapse to ReusedSubquery references. A regression
  * here (e.g. a non-deterministic expression sneaking into one
  * branch) silently doubles the fact scan at scale while every value
  * stays correct.
  */
class ExchangeReuseSpec extends SparkSpec {

  test("the diamond reuses the aggregate exchange and the scalar subqueries") {
    val df = graft.queries.PlannerMechanisms
      .q247ExchangeReuse(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"monthly aggregate exchange not reused across the self-join:\n$plan")
    assert(plan.contains("ReusedSubquery"),
      s"repeated scalar subqueries not reused:\n$plan")
  }
}
