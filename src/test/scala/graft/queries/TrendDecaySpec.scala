package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q173/q174 against full in-memory recomputations on the real
  * sf0.001 events: the decayed top-k membership and order, and the OLS
  * slope/intercept from independently accumulated exact sums.
  */
class TrendDecaySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def events(): Array[(String, Long, Long, Double)] =
    graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        col("ts").cast("long").as("sec"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("q173 reproduces a brute-force decayed-score top-k") {
    val ev = events()
    val mx = ev.map(_._3).max
    def r8(x: Double): BigDecimal =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val scores = ev.groupBy(e => (e._1, e._2)).map { case ((t, u), g) =>
      (t, u) -> g.map { case (_, _, sec, v) =>
        r8(v / (1 + (mx - sec) / 86400))
      }.sum.toDouble
    }
    val expected = scores.groupBy(_._1._1).flatMap { case (t, m) =>
      m.toSeq.map { case ((_, u), s) => (u, s) }
        .sortBy { case (u, s) => (-s, u) }.take(EventsQueries.DecayTopK)
        .zipWithIndex.map { case ((u, _), i) => (t, i + 1, u) }
    }.toSet
    val got = EventsQueries.q173DecayedValue(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected, s"top-k drifted:\n got=$got\n exp=$expected")
  }

  test("q174 reproduces OLS slope/intercept from exact sums") {
    val ev = events()
    val expected = ev.groupBy(_._1).map { case (t, g) =>
      val minSec = g.map(_._3).min
      val xs = g.map(_._3 - minSec)
      val ys = g.map(_._4)
      val n = g.length.toDouble
      val sx = xs.sum.toDouble
      val sy = ys.map(BigDecimal(_)).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => BigDecimal(x * y) }.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      t -> (g.length.toLong, slope * 86400, (sy - slope * sx) / n)
    }
    val got = EventsQueries.q174GroupTrend(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (n, slope, icept)) =>
      assert(got(t)._1 == n, s"$t n")
      assert(math.abs(got(t)._2 - slope) < 1e-6, s"$t slope ${got(t)._2} vs $slope")
      assert(math.abs(got(t)._3 - icept) < 1e-4, s"$t intercept ${got(t)._3} vs $icept")
    }
  }
}
