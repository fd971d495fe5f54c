package graft.operators

import graft.SparkSpec

/** q205's calibration matrix against a brute-force recompute of both
  * quality signals, the interpolated quartile thresholds, and the
  * bucket assignment; plus the mass invariants (cells sum to the
  * corpus, both marginals are quartile-balanced up to ties).
  */
class QualityCalibrationSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def trimSpaces(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** quantile_cont / Spark percentile interpolation at q over sorted
    * values: pos = q*(n-1), linear between floor and ceil.
    */
  private def interp(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  test("q205 equals the brute-force calibration matrix") {
    val rows = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val punctSet = Set('.', ',', ';', ':', '!', '?')
    val h = rows.map { case (id, text, nChars) =>
      val toks = text.split(" ", -1)
      id -> r6(0.4 * math.min(1.0, toks.length / 100.0)
        + 0.4 * (toks.distinct.length.toDouble / toks.length)
        + 0.2 * (1.0 - text.count(punctSet.contains).toDouble / nChars))
    }.toMap
    val allToks = rows.flatMap { case (_, t, _) =>
      trimSpaces(t.toLowerCase).split(" ", -1)
    }
    val cnt = allToks.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val s = rows.map { case (id, t, _) =>
      val toks = trimSpaces(t.toLowerCase).split(" ", -1)
      id -> toks.map(cnt).sum.toDouble / toks.length
    }.toMap
    val hs = h.values.toArray.sorted
    val ss = s.values.toArray.sorted
    val hT = Array(0.25, 0.5, 0.75).map(interp(hs, _))
    val sT = Array(0.25, 0.5, 0.75).map(interp(ss, _))
    def bucket(v: Double, t: Array[Double]): Int = 1 + t.count(v > _)
    val expected = rows.map { case (id, _, _) =>
      (bucket(h(id), hT), bucket(s(id), sT))
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = TextAnalysis.q205QualityCalibration(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"missing=${(expected.keySet -- got.keySet).take(3)} extra=${(got.keySet -- expected.keySet).take(3)} " +
        s"diff=${expected.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }.take(3)}")
    // mass invariants
    assert(got.values.sum == rows.length.toLong)
    (1 to 4).foreach { b =>
      val mh = got.collect { case ((bh, _), n) if bh == b => n }.sum
      val ms = got.collect { case ((_, bs), n) if bs == b => n }.sum
      assert(math.abs(mh - rows.length / 4.0) <= 2, s"bucket_h $b marginal $mh")
      assert(math.abs(ms - rows.length / 4.0) <= 2, s"bucket_s $b marginal $ms")
    }
  }
}
