package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q98's first-touch funnel against a per-user driver recompute. */
class FunnelSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("funnel stages match a driver-side recompute and all stages occur") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = events.groupBy(_._1)
    val expected = byUser.flatMap { case (u, evs) =>
      val secs = (t: String) => evs.filter(_._2 == t).map(_._3)
      val views = secs("view")
      if (views.isEmpty) None else {
        val v = views.min
        val c = secs("click").filter(s => s > v && s <= v + EventsQueries.FunnelGapSec)
          .minOption
        val p = c.flatMap(cs => secs("purchase")
          .filter(s => s > cs && s <= cs + EventsQueries.FunnelGapSec).minOption)
        Some(u -> ((v, c, p, 1 + c.size + p.size)))
      }
    }
    val got = EventsQueries.q98Funnel(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getInt(4)))
    }.toMap
    assert(got == expected,
      s"drift: ${(expected.toSet -- got.toSet).take(3)} / ${(got.toSet -- expected.toSet).take(3)}")
    val stages = got.values.map(_._4).toSet
    assert(stages == Set(1, 2, 3), s"not all funnel stages exercised: $stages")
  }

  test("q99 retention triangle matches a driver-side recompute") {
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400))
    val cohort = events.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = events.map { case (u, d) => (cohort(u), d - cohort(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap
    val got = EventsQueries.q99Retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"drift: ${(expected.toSet -- got.toSet).take(3)} / ${(got.toSet -- expected.toSet).take(3)}")
    // day-zero cell of the earliest cohort covers every user active then;
    // offsets > 0 must exist or the fixture isn't exercising retention
    assert(got.keys.exists(_._2 > 0), "no nonzero retention offsets")
  }
}
