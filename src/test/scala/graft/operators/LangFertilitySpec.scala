package graft.operators

import graft.SparkSpec

/** q218: per-language totals must equal a driver-side brute force
  * (java.util.regex evaluating the same subword pattern Spark and
  * DuckDB run), and the partition must cover the corpus exactly.
  */
class LangFertilitySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("per-language totals match brute force and cover the corpus") {
    import scala.jdk.CollectionConverters._
    val re = java.util.regex.Pattern.compile(TextAnalysis.BpePattern)
    def subwords(t: String): Long = {
      val m = re.matcher(t); var n = 0L
      while (m.find()) n += 1
      n
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "text").collectAsList().asScala
      .map(r => r.getString(0) -> r.getString(1)).toSeq
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      lang -> (xs.length.toLong,
        xs.map(_._2.length.toLong).sum,
        xs.map(_._2.split(" ", -1).length.toLong).sum,
        xs.map(x => subwords(x._2)).sum)
    }
    val rows = TextAnalysis.q218LangFertility(spark, dir).collect()
    assert(rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"))).toMap
      == expected)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong,
      "language rows must partition the corpus")
    // fertility sanity: the subword pattern splits at least as fine as
    // whitespace words on every language
    rows.foreach(r =>
      assert(r.getAs[Long]("n_subwords") >= r.getAs[Long]("n_words")
        || r.getAs[Long]("n_words") == 0L))
  }
}
