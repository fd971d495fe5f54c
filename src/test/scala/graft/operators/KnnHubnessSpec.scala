package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q210: the hubness histogram must be the exact in-degree
  * distribution of q156's (oracle-checked) graph, with zero-in-degree
  * vectors accounted as a first-class row — the histogram partitions
  * the full embedding table.
  */
class KnnHubnessSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("histogram is the graph's exact in-degree distribution") {
    val graph = Similarity.q156KnnGraph(spark, dir).collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val inDeg = graph.groupBy(_.getAs[Long]("nbr_id")).view.mapValues(_.length)
    val allIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0))
    val hist = allIds.groupBy(id => inDeg.getOrElse(id, 0).toLong)
      .view.mapValues(_.length.toLong).toMap
    val rows = Similarity.q210KnnHubness(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs,
      "histogram must partition the full embedding table")
    assert(rows.map(r =>
      r.getAs[Long]("in_deg") -> r.getAs[Long]("n_vecs")).toMap == hist)
    // mass balance: Σ in_deg·n_vecs is the graph's edge count
    assert(rows.map(r => r.getAs[Long]("in_deg") * r.getAs[Long]("n_vecs")).sum
      == graph.length.toLong)
    rows.foreach { r =>
      val lo = r.getAs[Long]("min_vec"); val hi = r.getAs[Long]("max_vec")
      assert(lo <= hi)
    }
  }
}
