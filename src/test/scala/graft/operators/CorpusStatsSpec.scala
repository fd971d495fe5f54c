package graft.operators

import graft.SparkSpec

/** q138-q141: corpus statistics. The boilerplate and BPE tops are
  * checked against a brute-force in-memory recount (independent
  * formulation), the overlap sketch against set bounds, and the OOV
  * audit against a hand-built top-16 vocab.
  */
class CorpusStatsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val docs: Array[(Long, String, Array[String])] =
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))

  test("q138 top boilerplate 5-grams match a brute-force recount") {
    val counts = collection.mutable.Map.empty[String, (Set[Long], Long)]
    docs.foreach { case (id, _, t) =>
      t.sliding(5).filter(_.length == 5).map(_.mkString(" ")).foreach { g =>
        val (s, n) = counts.getOrElse(g, (Set.empty[Long], 0L))
        counts(g) = (s + id, n + 1)
      }
    }
    val expected = counts.toSeq
      .map { case (g, (s, n)) => (g, s.size.toLong, n) }
      .sortBy { case (g, df, _) => (-df, g) }.take(20)
    val rows = TextAnalysis.q138Boilerplate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == expected)
  }

  test("q140 top bigram merges match a brute-force recount") {
    val counts = collection.mutable.Map.empty[String, (Long, Set[Long])]
    docs.foreach { case (id, _, t) =>
      t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).foreach { p =>
        val (n, s) = counts.getOrElse(p, (0L, Set.empty[Long]))
        counts(p) = (n + 1, s + id)
      }
    }
    val expected = counts.toSeq
      .map { case (p, (n, s)) => (p, n, s.size.toLong) }
      .sortBy { case (p, n, _) => (-n, p) }.take(20)
    val rows = TextAnalysis.q140BpeMerges(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == expected)
  }

  test("q139 sketch overlaps are bounded and ordered") {
    val rows = TextAnalysis.q139SourceOverlap(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 190) // C(20,2)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"pair ($a,$b) not ordered")
      val k = r.getLong(2)
      assert(k >= 1 && k <= 32, s"k_common=$k out of sketch range")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard_est=$j")
      // the estimator is exactly k/(64-k)
      assert(math.abs(j - k / (64.0 - k)) < 1e-6)
    }
  }

  test("q141 OOV audit matches a hand-built top-16 vocab") {
    val tokCounts = docs.flatMap(_._3).groupBy(identity)
      .map { case (t, a) => t -> a.length.toLong }
    val vocab = tokCounts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(16).map(_._1).toSet
    val expected = docs.groupBy(_._2).map { case (src, g) =>
      val toks = g.flatMap(_._3)
      val oov = toks.count(t => !vocab(t)).toLong
      src -> ((toks.length.toLong, oov,
        math.rint(oov.toDouble / toks.length * 1e6) / 1e6))
    }
    val rows = TextAnalysis.q141VocabCoverage(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case row @ (src, n, oov, rate) =>
      assert(expected(src) == ((n, oov, rate)), s"mismatch for $src: $row")
    }
    assert(rows.length == expected.size)
  }
}
