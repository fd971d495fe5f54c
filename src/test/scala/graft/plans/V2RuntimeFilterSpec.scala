package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q266 — V2 runtime filtering. The oracle proves the joined counts;
  * this spec locks the MECHANISM: the scan carries a dynamic-pruning
  * runtime filter, and its output-row metric shrinks to the matching
  * region's partitions — with DPP disabled the same scan emits every
  * partition's rows.
  */
class V2RuntimeFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The scan's own `keys=<planned>/<total>` description, rendered
    * AFTER execution so it reflects the runtime-filtered partition
    * list. */
  private def keysEvidence(plan: SparkPlan): (Int, Int) = {
    val m = "SpjScan\\(keys=(\\d+)/(\\d+)".r
      .findFirstMatchIn(plan.toString)
      .getOrElse(fail(s"no SpjScan keys evidence in plan:\n$plan"))
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("the runtime key set prunes connector partitions") {
    val root = graft.queries.PlannerMechanisms.spjStage(spark, dir)
    val df = graft.queries.PlannerMechanisms
      .runtimeFilteredJoin(spark, dir, root)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("RuntimeFilters: [dynamicpruning"),
      s"no dynamic-pruning runtime filter on the scan:\n$plan")
    val (planned, total) = keysEvidence(plan)
    assert(planned == rows.length && total > planned,
      s"expected only the ${rows.length} matching partitions planned, " +
        s"got keys=$planned/$total")

    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val off = graft.queries.PlannerMechanisms
      .runtimeFilteredJoin(s, dir, root)
    val offRows = off.collect()
    assert(offRows.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq,
      "pruning changed the answer")
    val (offPlanned, offTotal) = keysEvidence(off.queryExecution.executedPlan)
    assert(offPlanned == offTotal,
      s"DPP off should plan every partition, got keys=$offPlanned/$offTotal")
  }
}
