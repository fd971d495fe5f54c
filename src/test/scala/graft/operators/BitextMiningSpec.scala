package graft.operators

import graft.SparkSpec

/** q201's bitext candidate mining against the shared brute-force probe
  * (codebook over the FULL corpus, candidates restricted to French
  * documents, queries to sampled English ones), plus the language
  * soundness property on both sides of every emitted pair.
  */
class BitextMiningSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def langOf(): Map[Long, String] =
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def vecs(): Array[(Long, Array[Long], String)] = {
    val langs = langOf()
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(AnnTestKit.lift).toArray,
        langs(r.getLong(0))))
      .sortBy(_._1)
  }

  test("q201 equals the brute-force cross-lingual filtered probe") {
    val vs = vecs()
    val expected = AnnTestKit.bruteProbe[String](vs,
      standing = _ => true,
      queryOk = v => v._3 == "en" && v._1 % 5 == 0,
      candOk = v => v._3 == "fr",
      k = 8, nprobe = 3, topK = 1)
      .map { case (q, _, c, cos) => (q, c, cos) }
    assert(expected.nonEmpty)
    val got = graft.queries.OperatorQueries.q201BitextMining(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("every pair is en query -> fr candidate") {
    val langs = langOf()
    val rows = graft.queries.OperatorQueries.q201BitextMining(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(langs(r.getLong(0)) == "en", s"query ${r.getLong(0)}")
      assert(langs(r.getLong(1)) == "fr", s"candidate ${r.getLong(1)}")
    }
  }
}
