package graft.operators

import graft.SparkSpec

/** q209: the emitted stats must be the exact integer moment sums a
  * driver-side brute-force over the raw embeddings produces, for every
  * within-block dim pair — and only those pairs.
  */
class SubspaceCovSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  val B = Similarity.CovBlock

  private lazy val vecs: Seq[Array[Long]] = {
    import scala.jdk.CollectionConverters._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collectAsList().asScala.toSeq
      .map(_.getSeq[Float](0).toArray
        .map(x => math.round(x.toDouble * 1000000)))
  }

  private lazy val rows = Similarity.q209SubspaceCov(spark, dir).collect()

  test("pair coverage is exactly the within-block upper triangle") {
    val d = vecs.head.length
    val expected = for {
      i <- 0 until d
      j <- i until (i / B) * B + B
    } yield (i, j)
    val got = rows.map(r => (r.getAs[Int]("i"), r.getAs[Int]("j"))).toSeq
    assert(got.sorted == expected.sorted)
    rows.foreach { r =>
      assert(r.getAs[Int]("blk") == r.getAs[Int]("i") / B)
      assert(r.getAs[Long]("n") == vecs.size.toLong)
    }
  }

  test("moment sums match the brute-force accumulation") {
    val byPair = rows.map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r).toMap
    byPair.foreach { case ((i, j), r) =>
      var si = 0L; var sj = 0L; var sij = 0L
      vecs.foreach { v => si += v(i); sj += v(j); sij += v(i) * v(j) }
      assert(r.getAs[Long]("s_i") == si, s"s_i of ($i,$j)")
      assert(r.getAs[Long]("s_j") == sj, s"s_j of ($i,$j)")
      assert(r.getAs[Long]("s_ij") == sij, s"s_ij of ($i,$j)")
    }
    // the diagonal's second moment is a sum of squares — strictly
    // positive on any non-degenerate corpus
    byPair.filter { case ((i, j), _) => i == j }
      .foreach { case (_, r) => assert(r.getAs[Long]("s_ij") > 0L) }
  }
}
