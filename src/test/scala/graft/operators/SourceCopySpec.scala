package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q219: the matrix must equal a driver-side rollup of q32's
  * (oracle-checked) pairs against the documents' source column, and
  * its totals must account for every pair exactly once.
  */
class SourceCopySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("matrix matches the brute-force rollup and accounts every pair") {
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.q32MinhashNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val expected = pairs.groupBy { case (a, b) => (src(a), src(b)) }
      .map { case (k, xs) =>
        k -> (xs.length.toLong, xs.map(_._2).distinct.length.toLong)
      }
    val rows = Dedup.q219SourceCopyMatrix(spark, dir).collect()
    assert(rows.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b")) ->
      (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_victims"))).toMap == expected)
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == pairs.length.toLong)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_victims") <= r.getAs[Long]("n_pairs")))
    assert(rows.nonEmpty, "fixture must contain near-dup pairs")
  }
}
