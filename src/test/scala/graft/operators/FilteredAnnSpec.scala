package graft.operators

import graft.SparkSpec

/** q198's metadata-filtered ANN against a brute-force recompute of the
  * shared-index assignment + widened probe over the filtered candidate
  * set, plus the filter-soundness property (every returned candidate
  * satisfies the predicate) and the pre-filter advantage (some query
  * returns a candidate that post-filtering q49's unfiltered top-k
  * would have missed).
  */
class FilteredAnnSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def lift(x: Float): Long =
    BigDecimal(x.toDouble * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def vectors(): Array[(Long, Array[Long], Int)] =
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(lift).toArray,
        r.getInt(2)))
      .sortBy(_._1)

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.indices.map(i => a(i) * b(i)).sum

  /** (query_id, rk, cand_id, cos) via the exact shared-index probe
    * semantics over an arbitrary candidate predicate.
    */
  private def bruteProbe(vecs: Array[(Long, Array[Long], Int)],
      candOk: ((Long, Array[Long], Int)) => Boolean,
      nprobe: Int, topK: Int): Set[(Long, Int, Long, Double)] = {
    val m = math.max(1L, (vecs.length + 7L) / 8L)
    val pivots = vecs.filter(_._1 % m == 0).sortBy(_._1).zipWithIndex
      .map { case ((_, sv, _), cell) => (cell, sv, dot(sv, sv)) }
    def dists(sv: Array[Long]): Array[(Long, Int)] = {
      val nrm = dot(sv, sv)
      pivots.map { case (cell, pv, pn) =>
        (nrm + pn - 2 * dot(sv, pv), cell)
      }
    }
    val assigned = vecs.filter(candOk).map { case (id, sv, _) =>
      (id, sv, dists(sv).min._2)
    }
    vecs.filter(_._1 % 25 == 0).flatMap { case (qid, qsv, _) =>
      val probed = dists(qsv).sorted.take(nprobe).map(_._2).toSet
      val qn = math.sqrt(dot(qsv, qsv).toDouble)
      assigned.filter { case (cid, _, cell) => probed(cell) && cid != qid }
        .map { case (cid, sv, _) =>
          (cid, r6(dot(qsv, sv).toDouble / qn /
            math.sqrt(dot(sv, sv).toDouble)))
        }
        .sortBy { case (cid, cos) => (-cos, cid) }
        .take(topK).zipWithIndex
        .map { case ((cid, cos), i) => (qid, i + 1, cid, cos) }
    }.toSet
  }

  test("q198 equals the brute-force filtered shared-index probe") {
    val vecs = vectors()
    val expected = bruteProbe(vecs, v => v._3 % 3 == 0, nprobe = 3, topK = 3)
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
    val post = bruteProbe(vecs, _ => true, nprobe = 2, topK = 3)
      .filter { case (_, _, cid, _) =>
        vecs.find(_._1 == cid).get._3 % 3 == 0 }
      .map { case (q, _, c, _) => (q, c) }
    val pre = bruteProbe(vecs, v => v._3 % 3 == 0, nprobe = 3, topK = 3)
      .map { case (q, _, c, _) => (q, c) }
    assert((pre -- post).nonEmpty,
      "pre-filtered probe found nothing beyond the post-filtered baseline")
  }
}
