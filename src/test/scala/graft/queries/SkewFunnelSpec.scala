package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q177/q178 against in-memory recomputations on sf0.001: the skew
  * report's exact counts/ranks and the per-session funnel stages.
  */
class SkewFunnelSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q177 reports the exact heaviest keys with exact totals") {
    val keys = graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey").collect().map(_.getLong(0))
    val counts = keys.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val expected = counts.toSeq.sortBy { case (k, c) => (-c, k) }
      .take(Profiling.SkewTopK).zipWithIndex
      .map { case ((k, c), i) =>
        (i + 1, k, c, counts.size.toLong, keys.length.toLong) }
    val got = Profiling.q177KeySkewReport(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == expected, s"\n got=${got.toSeq}\n exp=$expected")
  }

  test("q178 funnel stages match a brute-force per-session walk") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("long").as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, g) =>
      val sorted = g.sortBy(e => (e._4, e._2))
      // gap islands, strict > 1800 break (q24's convention)
      var sid = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { case (_, _, t, s) =>
        if (prev == Long.MinValue || s - prev > 1800) sid += 1
        prev = s
        (sid, t, s)
      }
      tagged.groupBy(_._1).flatMap { case (s, se) =>
        val vs = se.filter(_._2 == "view").map(_._3)
        if (vs.isEmpty) None
        else {
          val v = vs.min
          val cs = se.filter(e => e._2 == "click" && e._3 > v).map(_._3)
          val stage =
            if (cs.isEmpty) 1
            else {
              val c = cs.min
              if (se.exists(e => e._2 == "purchase" && e._3 > c)) 3 else 2
            }
          Some((u, s, se.map(_._3).min, stage))
        }
      }
    }.toSet
    val got = EventsQueries.q178SessionFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected,
      s"diff got-exp=${got -- expected}\n exp-got=${expected -- got}")
  }
}
