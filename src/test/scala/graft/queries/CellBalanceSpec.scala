package graft.queries

import graft.SparkSpec
import graft.operators.IvfAnn

/** q220: the balance report must partition the embedding table across
  * the index's cells, its distortion total must equal
  * IvfAnn.distortion (the quantity Lloyd training minimizes), and the
  * anchor keys must be label-invariant (distinct, one per cell).
  */
class CellBalanceSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("report partitions the corpus and totals the index distortion") {
    val rows = OperatorQueries.q220CellBalance(spark, dir).collect()
    val index = IvfAnn.sharedIndex(spark, dir, k = 8)
    assert(rows.length == index.pivots.length, "one row per cell")
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n,
      "cells must partition the embedding table")
    assert(rows.map(_.getAs[Long]("sum_sqdist")).sum ==
      IvfAnn.distortion(index),
      "per-cell distortion must total the index's")
    val anchors = rows.map(_.getAs[Long]("anchor_vec"))
    assert(anchors.distinct.length == anchors.length)
    rows.foreach(r => assert(r.getAs[Long]("sum_sqdist") >= 0L))
  }
}
