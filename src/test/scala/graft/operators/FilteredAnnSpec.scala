package graft.operators

import graft.SparkSpec

/** q198's metadata-filtered ANN against a brute-force recompute of the
  * shared-index assignment + widened probe over the filtered candidate
  * set (via AnnTestKit), plus the filter-soundness property (every
  * returned candidate satisfies the predicate) and the pre-filter
  * advantage (some query returns a candidate that post-filtering q49's
  * unfiltered top-k would have missed).
  */
class FilteredAnnSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def vectors(): Array[(Long, Array[Long], Int)] =
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(AnnTestKit.lift).toArray,
        r.getInt(2)))
      .sortBy(_._1)

  test("q198 equals the brute-force filtered shared-index probe") {
    val vecs = vectors()
    val expected = AnnTestKit.bruteProbe[Int](vecs,
      standing = _ => true, queryOk = _._1 % 25 == 0,
      candOk = _._3 % 3 == 0, k = 8, nprobe = 3, topK = 3)
    assert(expected.nonEmpty)
    val got = graft.queries.OperatorQueries.q198FilteredAnn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("every returned candidate satisfies the metadata predicate") {
    val labels = vectors().map(v => v._1 -> v._3).toMap
    val got = graft.queries.OperatorQueries.q198FilteredAnn(spark, dir)
      .collect().map(_.getLong(2))
    assert(got.nonEmpty)
    got.foreach(cid =>
      assert(labels(cid) % 3 == 0, s"candidate $cid label ${labels(cid)}"))
  }

  test("pre-filtering finds candidates that post-filtering q49 would drop") {
    val vecs = vectors()
    // post-filter baseline: q49's unfiltered nprobe=2 top-3, then keep
    // only matching labels — the naive approach this operator replaces
    val post = AnnTestKit.bruteProbe[Int](vecs,
      standing = _ => true, queryOk = _._1 % 25 == 0,
      candOk = _ => true, k = 8, nprobe = 2, topK = 3)
      .filter { case (_, _, cid, _) =>
        vecs.find(_._1 == cid).get._3 % 3 == 0 }
      .map { case (q, _, c, _) => (q, c) }
    val pre = AnnTestKit.bruteProbe[Int](vecs,
      standing = _ => true, queryOk = _._1 % 25 == 0,
      candOk = _._3 % 3 == 0, k = 8, nprobe = 3, topK = 3)
      .map { case (q, _, c, _) => (q, c) }
    assert((pre -- post).nonEmpty,
      "pre-filtered probe found nothing beyond the post-filtered baseline")
  }
}
