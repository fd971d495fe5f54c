package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.{Filter, MapPartitions}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-19 materialize-once shapes, pinned against regression:
  *
  *  - q227 must keep its invariant frames (cov/sym/v1/u2) behind
  *    lineage cuts — the pre-fix plan inlined the q209 corpus pass at
  *    every reference (32 parquet scans; 16 corpus passes at scale).
  *  - q184's sample predicate must evaluate BELOW the opaque decode
  *    boundary — a filter above `mapPartitions` cannot be pushed past
  *    the lambda, so the per-row decode would run over the whole
  *    corpus and discard the off-sample rows afterwards.
  */
class MaterializeOnceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q227 plan carries no inlined parquet scan (invariants checkpointed)") {
    val df = Similarity.q227PowerIteration(spark, dir)
    // every parquet read must sit behind the localCheckpoint cuts: the
    // visible plan reads only checkpointed RDDs (plus joins/aggs over
    // them), never the embeddings relation itself
    val plan = df.queryExecution.optimizedPlan
    val relationLeaves = plan.collectLeaves().filter(
      _.getClass.getSimpleName.contains("Relation"))
    assert(relationLeaves.isEmpty,
      s"q227 re-inlined a source relation:\n${relationLeaves.mkString("\n")}")
    // and the result is still the full 64-row rotation frame
    assert(df.count() == 64)
  }

  test("q184's sample predicate evaluates below the decode boundary") {
    val pred = col("doc_id") % 3 === 0
    val df = Multimodal.phashed(spark, dir, Some(pred))
    val plan = df.queryExecution.optimizedPlan
    // the plan must contain the opaque decode node...
    val maps = plan.collect { case m: MapPartitions => m }
    assert(maps.nonEmpty, "phashed lost its mapPartitions decode stage")
    // ...and the doc_id filter must live BELOW it (inside its child
    // subtree), never above — above would decode the whole corpus
    val filtersBelow = maps.head.collect { case f: Filter => f }
    assert(filtersBelow.nonEmpty,
      "sample predicate is not below the decode boundary:\n" + plan.treeString)
    val filtersAbove = plan.collect { case f: Filter => f }.toSet --
      filtersBelow.toSet
    assert(filtersAbove.isEmpty,
      "a filter floated above the decode boundary:\n" + plan.treeString)
    // value equality with the post-decode filter formulation
    val after = Multimodal.phashed(spark, dir, None)
      .filter(pred)
    assert(df.collect().toSet == after.collect().toSet)
  }
}
