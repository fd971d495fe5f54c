package graft.operators

import graft.SparkSpec

/** q216: each curve point must equal a driver-side brute force over
  * the raw corpus, the curve must be monotone (prefixes nest), and the
  * 100% point must be the whole corpus.
  */
class VocabGrowthSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("curve points match brute force; curve is monotone and complete") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split(" ", -1).toSeq).toSeq
    val lo = docs.map(_._1).min
    val hi = docs.map(_._1).max
    val rows = TextAnalysis.q216VocabGrowth(spark, dir).collect()
      .sortBy(_.getAs[Int]("pct"))
    assert(rows.map(_.getAs[Int]("pct")).toSeq == TextAnalysis.HeapsPcts)
    rows.foreach { r =>
      val pct = r.getAs[Int]("pct")
      val cutoff = lo + (hi - lo + 1) * pct / 100
      assert(r.getAs[Long]("cutoff") == cutoff)
      val in = docs.filter(_._1 < cutoff)
      assert(r.getAs[Long]("n_docs") == in.length.toLong)
      assert(r.getAs[Long]("n_tokens") == in.map(_._2.length.toLong).sum)
      assert(r.getAs[Long]("vocab") ==
        in.flatMap(_._2).distinct.length.toLong)
    }
    val vocab = rows.map(_.getAs[Long]("vocab"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
    val full = rows.last
    assert(full.getAs[Long]("n_docs") == docs.length.toLong)
    // sub-linear growth (Heaps): the fixture's vocabulary must not be
    // still growing linearly at the end, or the curve shows nothing
    assert(vocab.last < toks.last, "vocabulary cannot exceed token mass")
  }
}
