package graft.operators

import graft.SparkSpec

/** q226: every cohort row must match a driver-side brute force, the
  * verdict must be the exact K/L conjunction, and the fixture must
  * exercise both verdicts or the audit proves nothing.
  */
class LDiversitySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("cohort stats and verdicts match brute force") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "n_chars div 100 as len_bucket", "lang")
      .collectAsList().asScala
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val expected = docs.groupBy(d => (d._1, d._2)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._3).distinct.length.toLong)
    }
    val rows = Curation.q226LDiversity(spark, dir).collect()
    assert(rows.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("len_bucket")) ->
      (r.getAs[Long]("n"), r.getAs[Long]("l_distinct"))).toMap == expected)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("released") ==
        (r.getAs[Long]("n") >= Curation.AnonK &&
          r.getAs[Long]("l_distinct") >= Curation.DiversityL))
    }
    assert(rows.exists(_.getAs[Boolean]("released")))
    assert(rows.exists(!_.getAs[Boolean]("released")),
      "fixture must contain a suppressible cohort")
  }
}
