package graft.sources

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkSpec

/** Locks q145's scale contract: the dim-side attribute filter must
  * reach the partitioned fact scan as a DYNAMIC partition filter, and
  * the executed scan must read strictly fewer partitions than exist.
  */
class DppSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q145: fact scan carries a dynamicpruning partition filter") {
    val df = FormatQueries.q145DynamicPruning(spark, dir)
    val rows = df.collect() // execute so AQE finalizes and DPP runs
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps finished stages in QueryStageExec LEAVES — collect()
    // stops there, so expand them by hand
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: QueryStageExec => p +: expand(q.plan)
      case _ => p +: p.children.flatMap(expand)
    }
    val scans = expand(plan).collect { case s: FileSourceScanExec => s }
    // exactly one file scan: the partitioned fact (the dim is read
    // through the same parquet but feeds the broadcast side)
    val pruned = scans.filter(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")))
    assert(pruned.nonEmpty,
      s"no scan carries a dynamic pruning filter:\n${plan.treeString}")
    // the dynamic filter must actually drop partitions: the fixture
    // spans >= 2 crc-parity eras, so selected < total
    val scan = pruned.head
    val selected = scan.metrics.get("numPartitions").map(_.value)
    assert(selected.exists(_ >= 1), s"scan read no partitions: $selected")
    val totalYears = Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    assert(selected.exists(_ < totalYears),
      s"DPP read all $totalYears partitions ($selected) — nothing pruned")
  }
}
