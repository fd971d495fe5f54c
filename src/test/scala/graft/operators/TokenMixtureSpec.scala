package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q104's token-budget mixture: achieved per-source token mass tracks
  * the target weights, budgets are never exceeded, and the sample is
  * deterministic.
  */
class TokenMixtureSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.01"

  test("accepted token mass per unit weight is level across sources") {
    val kept = Curation.q104TokenMixture(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.nonEmpty)
    val w = (s: String) => s match { case "src0" => 3L; case "src1" => 2L; case _ => 1L }
    val perSource = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val maxDoc = Tables.documents(spark, dir)
      .select(max(size(split(col("text"), " ")).cast("bigint")))
      .collect()(0).getLong(0)
    // every source must be sampled, and its token mass per unit weight
    // must agree with every other's within one document (the budget
    // boundary can strand at most one partially-fitting doc)
    assert(perSource.size == 20, s"sources missing: ${perSource.keySet}")
    val perWeight = perSource.map { case (s, t) => t.toDouble / w(s) }
    assert(perWeight.max - perWeight.min <= maxDoc.toDouble,
      s"unbalanced mixture: ${perSource.toSeq.sortBy(_._1)}")
    // total must not exceed the feasible budget: the binding source
    // (smallest avail/weight) is consumed up to its last fitting doc
    val avail = Tables.documents(spark, dir)
      .groupBy("source").agg(sum(size(split(col("text"), " ")).cast("bigint")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (s, t) =>
      assert(t <= avail(s), s"source $s kept more than exists")
    }
    val binding = avail.minBy { case (s, a) => a.toDouble / w(s) }._1
    assert(avail(binding) - perSource(binding) <= maxDoc,
      s"binding source $binding under-consumed: ${perSource(binding)} of ${avail(binding)}")
  }

  test("the sample is deterministic across runs") {
    val a = Curation.q104TokenMixture(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val b = Curation.q104TokenMixture(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
