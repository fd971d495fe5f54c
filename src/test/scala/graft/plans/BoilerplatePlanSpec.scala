package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.Generate

import graft.SparkSpec

/** q172's round-16 plan restructure (judge ask): the boilerplate scrub
  * must scan the corpus exactly TWICE — the boiler-frequency branch and
  * the kept branch — with the per-doc segment total computed SCAN-SIDE
  * on the kept branch (array arithmetic) instead of a third explode+agg
  * subtree re-joined at the end. This spec pins the shape: exactly two
  * Generate (explode) nodes in the optimized plan, the scan-side
  * `n_segs` computed in exactly one branch (column pruning must drop it
  * from the boiler branch), and no join other than the single left-anti
  * removal join.
  */
class BoilerplatePlanSpec extends SparkSpec {

  test("q172 plans exactly two explode subtrees and one join") {
    val df = graft.operators.Curation
      .q172BoilerplateScrub(spark, "/root/testdata/sf0.001")
    val optimized = df.queryExecution.optimizedPlan
    val generates = optimized.collect { case g: Generate => g }
    assert(generates.length == 2,
      s"expected exactly 2 explode subtrees (boiler + kept), got " +
        s"${generates.length}:\n$optimized")
    val joins = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins.map(_.sql) == Seq("LEFT ANTI"),
      s"expected the single left-anti removal join, got $joins:\n$optimized")
    // the scan-side segment total must ride only the kept branch —
    // pruned from the boiler branch's project
    val scanSideTotals = optimized.toString
      .linesIterator.count(_.contains("size(filter("))
    assert(scanSideTotals == 1,
      s"the scan-side segment total must be computed in exactly one " +
        s"branch:\n$optimized")
  }
}
