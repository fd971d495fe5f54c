package graft.operators

import graft.SparkSpec

/** q229: the four phases must partition the corpus on the quartile
  * thresholds of the exact per-doc score, phase score ranges must be
  * disjoint and ordered (the curriculum property), and the masses
  * must total the corpus's.
  */
class CurriculumSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("phases partition the corpus with ordered, disjoint score ranges") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split(" ", -1).toSeq).toSeq
    val cnt = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong)
    val stats = docs.map { case (_, toks) =>
      val sumCnt = toks.map(cnt).sum
      (toks.length.toLong, sumCnt,
        BigDecimal(sumCnt.toDouble / toks.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val rows = TextAnalysis.q229CurriculumPhases(spark, dir).collect()
      .sortBy(_.getAs[Int]("phase"))
    assert(rows.map(_.getAs[Int]("phase")).toSeq == Seq(1, 2, 3, 4))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
    assert(rows.map(_.getAs[Long]("tokens")).sum == stats.map(_._1).sum)
    assert(rows.map(_.getAs[Long]("cnt_mass")).sum == stats.map(_._2).sum)
    // quartiles: each phase holds roughly a quarter of the docs
    // (interpolated thresholds + ties make it inexact, but no phase
    // may be empty or hold the majority on a 500-doc fixture)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n > 0 && n < docs.length / 2, s"degenerate phase size $n")
    }
    // score ranges are ordered and non-overlapping across phases
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_score") <= b.getAs[Double]("min_score"),
          "phase score ranges overlap")
      case _ =>
    }
  }
}
