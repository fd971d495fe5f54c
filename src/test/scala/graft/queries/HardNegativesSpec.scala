package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IvfAnn

/** q223: every emitted negative must carry a label different from its
  * query's, sit at the MINIMUM different-label rank of that query's
  * probe list (no harder negative exists), and the emitted set must
  * cover exactly the queries whose probe list crosses labels.
  */
class HardNegativesSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("negatives are the rank-minimal cross-label candidates") {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val index = IvfAnn.sharedIndex(spark, dir, k = 8)
    val queries = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 25 === 0)
    val probe = IvfAnn.probe(spark, index, queries,
        nprobe = 2, topK = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("cand_id")))
    val expected = probe.groupBy(_._1).flatMap { case (q, cands) =>
      cands.filter(c => labels(c._3) != labels(q)).sortBy(_._2).headOption
        .map(c => q -> (labels(q), c._3, c._2))
    }
    val rows = OperatorQueries.q223HardNegatives(spark, dir).collect()
    assert(rows.map(r => r.getAs[Long]("query_id") ->
      (r.getAs[Int]("qlabel"), r.getAs[Long]("neg_id"),
        r.getAs[Int]("neg_rk"))).toMap == expected)
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("neg_id")) != r.getAs[Int]("qlabel"),
        s"negative of ${r.getAs[Long]("query_id")} shares its label")
    }
    assert(rows.nonEmpty, "fixture must yield cross-label probe lists")
  }
}
