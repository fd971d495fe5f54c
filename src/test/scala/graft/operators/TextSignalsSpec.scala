package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** q94 (unigram LM score) and q95 (dup-span fraction) against plain
  * driver-side recomputes of the same definitions.
  */
class TextSignalsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val corpus: Map[Long, String] = Tables.documents(spark, dir)
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("q94 emitted aggregates equal a driver-side unigram model") {
    val toks = corpus.view.mapValues(_.toLowerCase.trim.split(" ", -1).toSeq).toMap
    val vocab = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = vocab.values.sum
    val got = TextAnalysis.q94UnigramLmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == corpus.size)
    got.foreach { case (id, n, sumCnt, nTotal) =>
      val ts = toks(id)
      assert(n == ts.size, s"doc $id token count $n vs ${ts.size}")
      assert(sumCnt == ts.map(vocab).sum, s"doc $id sum_cnt")
      assert(nTotal == total, s"doc $id n_total $nTotal vs $total")
    }
  }

  test("spec-only q94 NLL view equals a driver-side unigram model") {
    val toks = corpus.view.mapValues(_.toLowerCase.trim.split(" ", -1).toSeq).toMap
    val vocab = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = vocab.values.sum.toDouble
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.unigramNll(
        Tables.documents(spark, dir).select("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == corpus.size)
    got.foreach { case (id, n, avg) =>
      val ts = toks(id)
      assert(n == ts.size, s"doc $id token count $n vs ${ts.size}")
      val sum = ts.map(t => BigDecimal(round6(-math.log(vocab(t) / total)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      // cast the exact decimal sum to double FIRST, then one IEEE
      // division — mirrors the view (a BigDecimal division rounds
      // differently at the 6th-decimal boundary)
      val expected = round6(sum.toDouble / ts.size)
      assert(avg == expected, s"doc $id: $avg vs $expected")
    }
  }

  test("q95 equals a driver-side span recompute") {
    def spans(text: String): Set[String] = {
      val norm = text.toLowerCase.trim
      val toks = norm.split(" ", -1)
      if (toks.length >= Dedup.SpanLen)
        toks.sliding(Dedup.SpanLen).map(_.mkString(" ")).toSet
      else Set(norm)
    }
    val docSpans = corpus.view.mapValues(spans).toMap
    val df = docSpans.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val got = Dedup.q95DupSpanFraction(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == corpus.size)
    var anyDup = false
    got.foreach { case (id, n, nd, frac) =>
      val ss = docSpans(id)
      val expectedDup = ss.count(df(_) >= 2).toLong
      assert(n == ss.size.toLong && nd == expectedDup,
        s"doc $id: ($n, $nd) vs (${ss.size}, $expectedDup)")
      assert(frac >= 0.0 && frac <= 1.0)
      if (nd > 0) anyDup = true
    }
    assert(anyDup, "fixture has no cross-doc duplicated spans — signal untested")
  }
}
