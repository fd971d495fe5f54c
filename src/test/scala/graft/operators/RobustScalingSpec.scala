package graft.operators

import graft.SparkSpec

/** q231: per-dimension median/MAD must equal a driver-side brute
  * force (interpolated median over the scaled integers, then the
  * median of absolute deviations), and MAD must shrug off the range
  * that min/max report — the robustness the operator exists for.
  */
class RobustScalingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def medianOf(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("median and MAD match brute force per dimension") {
    import scala.jdk.CollectionConverters._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collectAsList().asScala.toSeq
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1000000)))
    val rows = Similarity.q231RobustScaling(spark, dir).collect()
    assert(rows.length == vecs.head.length)
    rows.foreach { r =>
      val dim = r.getAs[Int]("dim")
      val vals = vecs.map(_(dim))
      assert(r.getAs[Long]("n") == vals.length.toLong)
      assert(r.getAs[Long]("vmin") == vals.min)
      assert(r.getAs[Long]("vmax") == vals.max)
      val med = medianOf(vals.map(_.toDouble))
      assert(r.getAs[Double]("med") == med, s"median of dim $dim")
      val mad = medianOf(vals.map(v => math.abs(v - med)))
      assert(r.getAs[Double]("mad") == mad, s"MAD of dim $dim")
      // robustness: MAD is bounded by half the range, usually far under
      assert(mad <= (vals.max - vals.min).toDouble / 2 + 1e-9)
    }
  }
}
