package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q211: the yield report must be the exact size-bucketed accounting
  * of q76's (oracle-checked) clusters against the sample's token
  * counts, and its savings must equal the min-id-keeper rule's.
  */
class DedupYieldSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("report matches brute-force accounting over q76's clusters") {
    val comp = Dedup.q76DedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = comp.groupBy(_._2).values.map { members =>
      val ids = members.map(_._1)
      val total = ids.map(toks).sum
      // canonical keeper = min doc_id (== the cluster label by CC
      // construction, but derive it independently here)
      val kept = toks(ids.min)
      (ids.length.toLong, total, total - kept)
    }.toSeq
    val expected = clusters.groupBy(_._1).map { case (size, cs) =>
      size -> (cs.length.toLong, cs.map(_._2).sum, cs.map(_._3).sum)
    }
    val rows = Dedup.q211DedupYield(spark, dir).collect()
    assert(rows.map(r => r.getAs[Long]("cluster_size") ->
      (r.getAs[Long]("n_clusters"), r.getAs[Long]("tokens_total"),
        r.getAs[Long]("tokens_saved"))).toMap == expected)
    // the size-1 row saves nothing by construction
    rows.filter(_.getAs[Long]("cluster_size") == 1L)
      .foreach(r => assert(r.getAs[Long]("tokens_saved") == 0L))
    // doc accounting: Σ size·n_clusters is the whole sample
    assert(rows.map(r =>
      r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")).sum
      == comp.length.toLong)
    // the fixture must exercise a multi-doc cluster or the report
    // proves nothing
    assert(rows.exists(_.getAs[Long]("cluster_size") > 1L))
  }
}
