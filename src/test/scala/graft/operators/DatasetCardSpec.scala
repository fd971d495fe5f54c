package graft.operators

import graft.SparkSpec

/** q230: every card field must equal a driver-side brute force over
  * the raw corpus — the card is only useful if it is exact.
  */
class DatasetCardSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("card fields match brute force exactly") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "source", "n_chars", "text")
      .collectAsList().asScala.toSeq
    def quality(text: String, nChars: Long): Double = {
      val toks = text.split(" ", -1)
      val punct = text.count(".,;:!?".contains(_))
      BigDecimal(0.4 * math.min(1.0, toks.length / 100.0)
        + 0.4 * (toks.distinct.length.toDouble / toks.length)
        + 0.2 * (1.0 - punct.toDouble / nChars))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val row = Curation.q230DatasetCard(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_docs") == docs.length.toLong)
    assert(row.getAs[Long]("n_tokens") ==
      docs.map(_.getString(4).split(" ", -1).length.toLong).sum)
    assert(row.getAs[Long]("sum_chars") == docs.map(_.getLong(3)).sum)
    assert(row.getAs[Long]("n_langs") ==
      docs.map(_.getString(1)).distinct.length.toLong)
    assert(row.getAs[Long]("n_sources") ==
      docs.map(_.getString(2)).distinct.length.toLong)
    assert(row.getAs[Long]("n_exact_dups") ==
      (docs.length - docs.map(_.getString(4)).distinct.length).toLong)
    assert(row.getAs[Long]("n_quality_pass") ==
      docs.count(r => quality(r.getString(4), r.getLong(3))
        >= Curation.QualityMin).toLong)
    assert(row.getAs[Long]("vocab") ==
      docs.flatMap(_.getString(4).trim.toLowerCase.split(" ", -1))
        .distinct.length.toLong)
    // the sf0.001 fixture's duplicates are near-dups, not byte-exact,
    // so n_exact_dups is legitimately 0 here; the field's exactness is
    // pinned above, and the quality/vocab fields must be non-trivial
    assert(row.getAs[Long]("n_quality_pass") > 0)
    assert(row.getAs[Long]("vocab") > 0)
  }
}
