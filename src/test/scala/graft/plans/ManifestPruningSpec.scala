package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}

import graft.SparkSpec

/** q255 — connector-side manifest pruning. The oracle proves the
  * filtered counts; this spec locks the pruning contract at three
  * levels: (1) the scan plans EXACTLY the matching partitions
  * (direct planInputPartitions count); (2) the plan surfaces the
  * `keys=m/n` evidence; (3) a deliberately WRONG pushdown cannot
  * corrupt results, because every pushed filter stays residual and
  * Spark re-verifies rows.
  */
class ManifestPruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the scan plans exactly the matching partitions") {
    val root = graft.queries.PlannerMechanisms.spjStage(spark, sf)
    val all = new graft.sources.SpjScan(s"$root/cust")
      .planInputPartitions().length
    val pruned = new graft.sources.SpjScan(s"$root/cust",
      Array(GreaterThanOrEqual("k", 5L), LessThan("k", 12L)))
      .planInputPartitions().length
    assert(all == 25, s"fixture should stage 25 nation partitions, got $all")
    assert(pruned == 7, s"[5,12) should keep 7 partitions, got $pruned")
  }

  test("the plan carries the keys=m/n pruning evidence") {
    val df = graft.queries.PlannerMechanisms.q255ManifestPruning(spark, sf)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("keys=7/25"),
      s"pruned scan description missing from the plan:\n$plan")
  }

  test("pruning is I/O-only: rows are still verified by residual filters") {
    // a filter the source does NOT prune on (the value column) must
    // still be answered correctly — and the key filter answers
    // identically with pruning active and with the scan unpruned
    val root = graft.queries.PlannerMechanisms.spjStage(spark, sf)
    val src = graft.sources.SpjSource.load(spark, s"$root/cust")
    val prunedRows = src.filter(col("k") >= 5 && col("k") < 12)
      .collect().map(_.toSeq.mkString("|")).sorted
    val unprunedRows = src.collect()
      .filter(r => r.getLong(0) >= 5 && r.getLong(0) < 12)
      .map(_.toSeq.mkString("|")).sorted
    assert(prunedRows.sameElements(unprunedRows),
      "partition pruning changed the visible rows")
  }
}
