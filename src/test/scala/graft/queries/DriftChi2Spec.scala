package graft.queries

import graft.SparkSpec

/** q208's drift table against a brute-force recompute (median split,
  * quartile bins, homogeneity expectations, per-cell χ² contribution),
  * plus the mass contracts: cells partition the corpus and each half's
  * expectations sum to its observed size.
  */
class DriftChi2Spec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def interp(sorted: Array[Double], q: Double): Double = {
    val pos = q * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  test("q208 equals the brute-force drift table; mass contracts hold") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("tus"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val tmed = interp(rows.map(_._1.toDouble).sorted, 0.5)
    val vs = rows.map(_._2).sorted
    val t = Array(0.25, 0.5, 0.75).map(interp(vs, _))
    val cells = rows.map { case (tus, v) =>
      (if (tus <= tmed) "old" else "new", 1 + t.count(v > _))
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val nHalf = cells.groupBy(_._1._1).map { case (h, g) => h -> g.values.sum }
    val nBin = cells.groupBy(_._1._2).map { case (b, g) => b -> g.values.sum }
    val nAll = rows.length.toLong
    val expected = cells.map { case ((h, b), n) =>
      val e = nHalf(h).toDouble * nBin(b) / nAll
      (h, b) -> (n, r6(e), r6((n - e) * (n - e) / e))
    }
    val got = StatsQueries.q208DriftChi2(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == expected,
      s"diff=${expected.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }.take(3)}")
    assert(got.map(_._2._1).sum == nAll)
    // per-half expectation mass equals the half's observed size
    Seq("old", "new").foreach { h =>
      val mass = got.collect { case ((`h`, _), (_, e, _)) => e }.sum
      assert(math.abs(mass - nHalf(h)) < 1e-3, s"half $h expectation mass $mass")
    }
  }
}
