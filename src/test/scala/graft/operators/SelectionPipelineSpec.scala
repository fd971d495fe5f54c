package graft.operators

import graft.SparkSpec

/** q192 selection pipeline: the parents (q189 DSIR ranking, q190
  * semantic dedup) are brute-force-proven in their own specs, so this
  * spec proves the COMPOSITION — the selection pool is exactly the
  * DSIR top-N, and the flags are exactly the q190 verdict joined on
  * the embedding id with the conservative unembedded default.
  */
class SelectionPipelineSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("rows are the DSIR top-N annotated with the q190 verdict") {
    val scored = TextAnalysis.dsirScored(spark, dir)
      .select("doc_id", "lang", "w6", "n_toks").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).doubleValue(), r.getLong(3)))
    val expectedSel = scored.sortBy { case (id, _, w, _) => (-w, id) }
      .take(Curation.SelPoolN)
    val verdict = Similarity.q190SemanticDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept")).toMap
    val rows = Curation.q192SelectionPipeline(spark, dir).collect()
      .sortBy(_.getAs[Int]("sel_rank"))
    assert(rows.length == math.min(Curation.SelPoolN, scored.length))
    rows.zip(expectedSel).foreach { case (r, (id, lang, _, nToks)) =>
      assert(r.getAs[Long]("doc_id") == id,
        s"rank ${r.getAs[Int]("sel_rank")} should be doc $id")
      assert(r.getAs[String]("lang") == lang)
      assert(r.getAs[Long]("n_toks") == nToks)
      assert(r.getAs[Boolean]("has_embedding") == verdict.contains(id))
      assert(r.getAs[Boolean]("curated") == verdict.getOrElse(id, true))
    }
    assert(rows.exists(r => !r.getAs[Boolean]("curated")),
      "fixture selection should contain at least one semantic-dup drop")
  }
}
