package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q142: the trailing 7-day active-user counts must equal a brute-force
  * per-day set scan, and stickiness must stay in (0, 1].
  */
class EngagementSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q142 trailing WAU equals the brute-force window scan") {
    val ud = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct.sorted
    val expected = days.map { d =>
      val dau = ud.filter(_._2 == d).map(_._1).distinct.length.toLong
      val wau = ud.filter(t => t._2 >= d - 6 && t._2 <= d)
        .map(_._1).distinct.length.toLong
      (d, dau, wau, math.rint(dau.toDouble / wau * 1e6) / 1e6)
    }
    val rows = EventsQueries.q142TrailingWau(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == expected.toSeq)
    rows.foreach { case (_, dau, wau, s) =>
      assert(dau <= wau && s > 0.0 && s <= 1.0)
    }
  }
}
