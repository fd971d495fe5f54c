package graft.plans

import graft.SparkSpec

/** Top-k-per-group plan mechanics:
  * (1) q241's correlated LATERAL + LIMIT must DECORRELATE — a window
  *     over the fact keyed by the correlation column joined back
  *     through an equi-join, never a per-row nested loop;
  * (2) q19's row_number-then-filter form must pick up Spark's
  *     WindowGroupLimit — the partial top-k prune BEFORE the window
  *     shuffle (each map task forwards at most k rows per key), which
  *     is what keeps per-group ranking viable when a key's rows are
  *     scattered across a 100 TB scan.
  */
class LateralTopkSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q241's lateral decorrelates to window + equi-join, no nested loop") {
    val df = graft.queries.StarSchema.q241LateralTopk(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number"),
      s"no window rewrite of the correlated LIMIT:\n$plan")
    assert(plan.contains("l_partkey") && plan.contains("Join Inner"),
      s"no equi-join back to the driving table:\n$plan")
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin")
        && !physical.contains("CartesianProduct"),
      s"lateral executed as a nested loop:\n$physical")
    assert(df.collect().nonEmpty)
  }

  test("q19's rank filter plans partial + final WindowGroupLimit") {
    val df = graft.queries.StarSchema.q19TopPerGroup(spark, dir)
    val n = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("WindowGroupLimit"))
    assert(n == 2,
      s"expected partial+final WindowGroupLimit pair, found $n")
  }
}
